"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric ([BASELINE:L10] config 4): full 3-head CerberusNet joint
inference, bf16, batched 1024x512 stereo pairs, frames/sec/chip.
vs_baseline = tpu_fps / torch_cpu_fps (the [BASELINE:L5] target is >= 5).

Timing methodology (cerberusnet_tpu.utils.benchutil): iterations are
statically unrolled inside ONE jitted program (per-call dispatch costs ms
here and fori_loop adds ~1 ms/iteration of its own), the final scalar is
FETCHED to the host (block_until_ready returns at enqueue on this backend,
not completion), and the dispatch+fetch round-trip floor is subtracted.

Usage:
  python bench.py            # headline metric, one JSON line on stdout
  python bench.py --all      # additionally writes BENCH_details.json with
                             # the five [BASELINE:L7-L11] configs
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# persistent compile cache: the unrolled timing programs are expensive to
# compile on the remote helper (minutes each); repeat bench runs (and the
# driver's end-of-round run) should hit warm cache
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-bench")

import jax
import jax.numpy as jnp


def _loop_time(fn, args, iters, reduce_out, rounds=3):
    """Per-round seconds/call of fn(*args) (list of ``rounds`` slopes),
    honest on this async remote backend: floor-cancelling two-point unroll
    differencing (see the benchutil docstring; tools/timing_diag.py
    validated wall time as affine in the unroll count, so the slope is the
    true streaming cost per frame). Three rounds per row give committed
    numbers a spread column (VERDICT r4 item 9: no single-snapshot fps row
    in committed artifacts — the backend's day-band is ±10%).

    The small first point keeps compile cost down (only the DIFFERENCE in
    unroll counts matters for the estimate; a 10+30 pair took >20 min to
    compile on the remote helper, 2+12 compiles in ~round-1 time)."""
    from cerberusnet_tpu.utils.benchutil import time_fn_two_point_rounds

    # CERBERUS_BENCH_AUTO_LAYOUT=1: measure with XLA-chosen input layouts
    # (arrays device_put into the compiled formats) — flips the headline to
    # the auto-layout serving convention once the interleaved A/B
    # (tools/ab_forward.py --set layout) confirms the win on hardware.
    auto = os.environ.get("CERBERUS_BENCH_AUTO_LAYOUT", "") == "1"
    return time_fn_two_point_rounds(fn, args, iters=(2, 2 + iters),
                                    reduce_out=reduce_out, rounds=rounds,
                                    auto_layout=auto)


def _stats(secs, batch):
    """Per-round slopes -> {fps (median), fps_band [min, max], rounds}."""
    import statistics

    fps = sorted(batch / s for s in secs)
    return {
        "fps": statistics.median(fps),
        "fps_band": [fps[0], fps[-1]],
        "rounds": len(fps),
    }


def bench_full3head(batch=2, hw=(512, 1024), iters=10, dtype=jnp.bfloat16,
                    corr_impl=None):
    from cerberusnet_tpu.models import CerberusNet

    model = CerberusNet(dtype=dtype, corr_impl=corr_impl)
    h, w = hw
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (batch, h, w, 3), dtype)
        for i in range(3)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)

    def forward(left, right, temporal):
        out = model.apply(variables, left, right, temporal)
        return out

    def reduce_out(out):
        return (
            out["flow"].mean() + out["disp"].mean() + out["seg_logits"].mean()
        ).astype(jnp.float32)

    return _stats(_loop_time(forward, imgs, iters, reduce_out), batch)


def bench_head(kind, batch=2, hw=(512, 1024), iters=10, dtype=jnp.bfloat16):
    from cerberusnet_tpu.models import FlowNet, SegNet, StereoNet

    h, w = hw
    if kind == "seg":
        model = SegNet(dtype=dtype)
        n_in = 1
    elif kind == "stereo":
        model = StereoNet(dtype=dtype)
        n_in = 2
    else:
        model = FlowNet(dtype=dtype)
        n_in = 2
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (batch, h, w, 3), dtype)
        for i in range(n_in)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)

    def forward(*xs):
        return model.apply(variables, *xs)

    def reduce_out(out):
        if kind == "seg":
            return out.mean().astype(jnp.float32)
        key = "flow" if kind == "flow" else "disp"
        return out[key].mean().astype(jnp.float32)

    return _stats(_loop_time(forward, imgs, iters, reduce_out), batch)


def bench_cerberus_dcv(batch=1, hw=(512, 1024), iters=10):
    """TPU-first redesigned flagship: joint 3-head inference on the
    warping-free dilated-cost-volume decoders (models/dcv_flow.py)."""
    from cerberusnet_tpu.models import CerberusDCV

    model = CerberusDCV(dtype=jnp.bfloat16)
    h, w = hw
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (batch, h, w, 3), jnp.bfloat16)
        for i in range(3)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)

    def forward(left, right, temporal):
        return model.apply(variables, left, right, temporal)

    def reduce_out(out):
        return (
            out["flow"].mean() + out["disp"].mean() + out["seg_logits"].mean()
        ).astype(jnp.float32)

    return _stats(_loop_time(forward, imgs, iters, reduce_out), batch)


def bench_raft(batch=1, hw=(256, 512), iters=6, raft_iters=12, level=3):
    """RAFT-family iterative flow (models/raft.py): all-pairs MXU
    correlation + weight-tied GRU refinements under nn.scan. The
    accuracy-ceiling flow option; measured beside the latency options.

    Operating point (VERDICT r3 item 4 / W5): the all-pairs volume is
    ((H*W)/4^level)^2 x corr_levels — at 512x1024/level 3 that is 8192^2x4
    (~1 GB/frame, memory-bound, the retired 0.69 fps row). The bench row
    measures the model at its usable envelope (256x512 at 1/8 res by
    default, i.e. a 2048^2 volume); tools/raft_bench.py sweeps the full
    grid and BASELINE.md carries the envelope table."""
    from cerberusnet_tpu.models import RAFTFlowNet

    model = RAFTFlowNet(dtype=jnp.bfloat16, iters=raft_iters, level=level)
    h, w = hw
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (batch, h, w, 3), jnp.bfloat16)
        for i in range(2)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)

    def forward(im1, im2):
        return model.apply(variables, im1, im2)

    def reduce_out(out):
        return out["flow"].mean().astype(jnp.float32)

    return _stats(_loop_time(forward, imgs, iters, reduce_out), batch)


def bench_cerberus_raft(batch=1, hw=(256, 512), iters=6, raft_iters=6,
                        level=3):
    """Joint 3-head CerberusRAFT at its operating point (256x512, 1/8-res
    latent, 6 refinement iterations) with the gather-free onehot lookup
    (default since the r4f race: 45x over the gather path — BASELINE.md
    round-4 table). All three heads consumed; two-point slope."""
    from cerberusnet_tpu.models import CerberusRAFT

    model = CerberusRAFT(dtype=jnp.bfloat16, iters=raft_iters, level=level)
    h, w = hw
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (batch, h, w, 3), jnp.bfloat16)
        for i in range(3)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)

    def forward(left, right, temporal):
        return model.apply(variables, left, right, temporal)

    def reduce_out(out):
        return (
            out["flow"].astype(jnp.float32).mean()
            + out["disp"].astype(jnp.float32).mean()
            + out["seg_logits"].astype(jnp.float32).mean()
        )

    return _stats(_loop_time(forward, imgs, iters, reduce_out), batch)


def bench_train_step(batch=2, hw=(512, 1024), iters=5, flatten=False,
                     model_kw=()):
    """[BASELINE:L11] config 5: end-to-end multi-task train step (joint loss,
    backward through the Pallas VJPs, optimizer update).

    flatten: run adamw on the raveled flat param vector (optax.flatten,
    math-identical) — the train-step op-count knob; model_kw: extra
    CerberusNet kwargs for A/B runs (e.g. corr_impl)."""
    import optax

    from cerberusnet_tpu.models import CerberusNet
    from cerberusnet_tpu.train import losses

    model = CerberusNet(dtype=jnp.bfloat16, **dict(model_kw))
    h, w = hw
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (batch, h, w, 3), jnp.bfloat16)
        for i in range(3)
    )
    batch_d = {
        "left": imgs[0],
        "right": imgs[1],
        "temporal": imgs[2],
        "seg_labels": jnp.zeros((batch, h, w), jnp.int32),
        "flow_gt": jnp.zeros((batch, h, w, 2), jnp.float32),
        "flow_valid": jnp.ones((batch, h, w), jnp.float32),
        "disp_gt": jnp.ones((batch, h, w), jnp.float32),
        "disp_valid": jnp.ones((batch, h, w), jnp.float32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)
    tx = optax.adamw(1e-4)
    if flatten:
        tx = optax.flatten(tx)
    opt_state = jax.jit(tx.init)(variables["params"])

    def loss_fn(params, bd):
        out = model.apply({"params": params}, bd["left"], bd["right"], bd["temporal"])
        total, _ = losses.joint_loss(out, bd)
        return total

    def step(carry, i):
        params, opt_state = carry
        bd = dict(batch_d)
        bd["left"] = bd["left"] + (i * 1e-9).astype(bd["left"].dtype)
        grads = jax.grad(loss_fn)(params, bd)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), jnp.float32(0)

    def build(n):
        @jax.jit
        def run(params, opt_state):
            for i in range(n):
                (params, opt_state), _ = step((params, opt_state), jnp.float32(i))
            return jax.tree.leaves(params)[0].astype(jnp.float32).mean()

        return run

    from cerberusnet_tpu.utils.benchutil import time_fn_two_point_rounds

    # floor-cancelling two-point unroll (raises FloorLimitedTiming rather
    # than recording garbage — VERDICT r1 W2)
    secs = time_fn_two_point_rounds(
        None, (variables["params"], opt_state), iters=(2, 2 + iters),
        build=build,
    )
    return _stats(secs, batch)  # training frames/sec/chip


_BENCH_SENTINEL = "/tmp/cerberus_bench_request"
_CHAIN_BUSY = "/tmp/cerberus_chain_busy"


def _wait_for_chain_step(budget_s: float = 2400) -> None:
    """Block while a tools/chain_run.py step is mid-flight.

    The bench sentinel only makes chains yield BETWEEN steps; a step
    already running when the benchmark starts would otherwise share the
    chip with the timing loop and corrupt both measurements (TPU
    experiments must never overlap — CLAUDE.md rule 9). chain_run marks
    each step with a pid-stamped busy file; wait for it to clear (or for
    its pid to die) before benchmarking."""
    import time as _time

    own_chain = int(os.environ.get("CERBERUS_CHAIN_PID", 0) or 0)
    deadline = _time.time() + budget_s
    warned = False
    zero_pid_since = None  # ADVICE r3: unreadable marker must not pin us 2400s
    while os.path.exists(_CHAIN_BUSY) and _time.time() < deadline:
        try:
            with open(_CHAIN_BUSY) as f:
                pid = int(f.read().strip() or 0)
        except (OSError, ValueError):
            pid = 0
        if pid and pid == own_chain:
            return  # this benchmark IS the running chain step
        if pid:
            zero_pid_since = None
            try:
                os.kill(pid, 0)
            except OSError:
                try:  # stale: the chain died without cleaning up
                    os.remove(_CHAIN_BUSY)
                except OSError:
                    pass
                return
        else:
            # A healthy chain_run writes its pid immediately after open();
            # a marker that stays pid-less for >60s is a corrupt leftover
            # from a crashed chain — clear it instead of burning the budget.
            now = _time.time()
            if zero_pid_since is None:
                zero_pid_since = now
            elif now - zero_pid_since > 60:
                print("[bench] clearing stale pid-less chain marker",
                      file=sys.stderr)
                try:
                    os.remove(_CHAIN_BUSY)
                except OSError:
                    pass
                return
        if not warned:
            print("[bench] chain step in flight; waiting for it to finish",
                  file=sys.stderr)
            warned = True
        _time.sleep(30)
    if os.path.exists(_CHAIN_BUSY):
        print(f"[bench] chain still busy after {budget_s:.0f}s — "
              "benchmarking anyway (results may be contaminated)",
              file=sys.stderr)


def _post_bench_sentinel() -> None:
    """Signal the TPU experiment queue (tools/tpu_queue*.sh) that a
    benchmark wants the chip: the queue yields between steps while this
    file exists (TPU experiments must not overlap — CLAUDE.md rule 9)."""
    import atexit
    import signal

    try:
        with open(_BENCH_SENTINEL, "w") as f:
            f.write(str(os.getpid()))
        atexit.register(lambda: os.path.exists(_BENCH_SENTINEL)
                        and os.remove(_BENCH_SENTINEL))
        # GNU timeout kills with SIGTERM, which skips atexit by default;
        # convert it to SystemExit so the sentinel is removed (the queue
        # also PID-checks the sentinel, belt and braces)
        signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))
    except (OSError, ValueError):  # ValueError: non-main thread
        pass


def _wait_for_device(budget_s: float) -> None:
    """Block until the TPU tunnel answers, up to ``budget_s`` seconds.

    The axon tunnel can wedge for long stretches (a stuck remote compile
    holds the claim; CLAUDE.md rule 8), and a client that touches
    jax.devices() then hangs indefinitely with no way to recover in-process.
    Probing in short-lived SUBPROCESSES keeps this process's backend
    uninitialized until a probe succeeds, so a transient wedge costs a wait
    instead of the whole benchmark run. Exits nonzero with a clear message
    if the budget runs out."""
    import subprocess

    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            ok = (
                subprocess.run(
                    [sys.executable, "-c", "import jax; jax.devices()"],
                    timeout=60,
                    capture_output=True,
                ).returncode
                == 0
            )
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            if attempt > 1:
                print(f"[bench] device up after {attempt} probes", file=sys.stderr)
            return
        if time.time() >= deadline:
            print(
                f"[bench] no device after {budget_s:.0f}s (tunnel wedged?) — "
                "giving up",
                file=sys.stderr,
            )
            raise SystemExit(3)
        print("[bench] device probe failed; retrying in 60s", file=sys.stderr)
        time.sleep(60)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="also write BENCH_details.json")
    ap.add_argument("--batch", type=int, default=1)  # measured best fps/chip (87 vs 77 at b2, 47 at b8): 1024x512 spatial already saturates the chip
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument(
        "--wait-device",
        type=float,
        default=float(os.environ.get("CERBERUS_BENCH_WAIT_S", 1200)),
        help="max seconds to wait for the TPU tunnel before giving up",
    )
    args = ap.parse_args()

    _post_bench_sentinel()
    _wait_for_chain_step()
    _wait_for_device(args.wait_device)
    # Re-check after the (potentially long) device wait: a chain step that
    # raced past yield_to_bench() just before our sentinel landed would have
    # written CHAIN_BUSY in the meantime (ADVICE r3 TOCTOU).
    _wait_for_chain_step()
    details = {"device": str(jax.devices()[0]), "hw": [512, 1024]}

    head = bench_full3head(batch=args.batch, iters=args.iters)
    fps = head["fps"]
    details["full3head_bf16_fps"] = fps
    details["full3head_bf16_fps_band"] = head["fps_band"]
    details["full3head_bf16_fps_rounds"] = head["rounds"]

    torch_fps = None
    if not args.skip_torch:
        try:
            from tools.torch_baseline import measure_cpu_fps

            torch_fps = measure_cpu_fps(
                cache_path=os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    ".torch_cpu_baseline.json",
                )
            )
        except Exception as e:  # torch baseline is best-effort
            print(f"[bench] torch baseline failed: {e}", file=sys.stderr)
    details["torch_cpu_fps"] = torch_fps

    if args.all:
        subbenches = {
            # seg is fast (~1 ms/frame): widen the two-point gap for signal,
            # but keep the long unroll compile-friendly (42 programs of a
            # small net; a 100+ unroll of the big net took >20 min to
            # compile on the remote helper).
            "seg_fp32_fps": lambda: bench_head(
                "seg", batch=1, iters=40, dtype=jnp.float32
            ),
            "stereo_bf16_fps": lambda: bench_head(
                "stereo", batch=args.batch, iters=args.iters
            ),
            "flow_bf16_fps": lambda: bench_head(
                "flow", batch=args.batch, iters=args.iters
            ),
            "cerberus_dcv_bf16_fps": lambda: bench_cerberus_dcv(
                batch=args.batch, iters=args.iters
            ),
            # operating point 256x512 @ 1/8 res (see bench_raft docstring);
            # the key name carries the point so the row can't be read as a
            # 512x1024 number
            "raft_bf16_256x512_fps": lambda: bench_raft(batch=args.batch),
            "cerberus_raft_bf16_256x512_6it_fps": lambda: bench_cerberus_raft(
                batch=args.batch
            ),
            # The round-5 promotion row (chain r5a raft_lv4_fullres_onehot:
            # 144.6 fps): the recommended joint 3-head model at the
            # CANONICAL 512x1024 resolution — level-4 latent (same 32x64
            # latent grid as 256x512/level-3), 6 iters, onehot lookup.
            "cerberus_raft_bf16_512x1024_lv4_6it_fps":
                lambda: bench_cerberus_raft(
                    batch=args.batch, hw=(512, 1024), level=4
                ),
            "train_step_bf16_fps": lambda: bench_train_step(
                batch=max(args.batch, 2), flatten=True  # trainer default (r3e A/B)
            ),
        }
        for name, fn in subbenches.items():
            try:
                st = fn()
                details[name] = st["fps"]
                details[name + "_band"] = st["fps_band"]
                details[name + "_rounds"] = st["rounds"]
            except Exception as e:  # record, keep going, never lose the run
                print(f"[bench] {name} failed: {e}", file=sys.stderr)
                details[name] = None
                details[f"{name}_error"] = str(e)  # flagged, not silent
        # Utilization denominators (VERDICT r4 item 8/W4): annotate every
        # fps row with TFLOP/s and % of the measured matmul ceiling, from
        # the committed FLOPs table (tools/mfu.py --emit-rows).
        mfu_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "runs",
            "mfu_flops.json")
        if os.path.exists(mfu_path):
            with open(mfu_path) as f:
                mfu = json.load(f)
            ceil = mfu.get("measured_ceiling_tflops") or 0.0
            for row, fl in mfu.get("rows", {}).items():
                if details.get(row):
                    tps = fl * details[row] / 1e12
                    details[row + "_tflops"] = round(tps, 2)
                    if ceil:
                        details[row + "_pct_of_ceiling"] = round(
                            100.0 * tps / ceil, 1)
        with open("BENCH_details.json", "w") as f:
            json.dump(details, f, indent=2)

    vs = (fps / torch_fps) if torch_fps else None
    print(
        json.dumps(
            {
                "metric": "full3head_bf16_fps_per_chip_1024x512",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
