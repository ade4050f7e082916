"""Interleaved A/B of CerberusNet perf variants in ONE process.

Run-to-run variance on the axon backend is ~±0.5 ms, so separate-process
comparisons lie (CLAUDE.md rule 7); this tool compiles every variant up
front, then measures them round-robin for --rounds rounds and reports
per-variant best and median ms/frame. All variants are bit-identical math
(same param tree, same outputs) — only the XLA program structure differs.

NOTE on absolute numbers: the per-frame figures here subtract a
separately-measured floor, which drifts (tools/timing_diag.py) — use them
ONLY to rank variants (the floor error is common to all variants in a
round); the honest absolute per-frame cost comes from bench.py's two-point
slope.

Usage:
  python tools/ab_forward.py                 # headline forward variants
  python tools/ab_forward.py --batch 2
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

# Remote compiles dominate this tool's runtime; persist them like bench.py.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-bench")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from cerberusnet_tpu.utils.benchutil import _fetch, roundtrip_floor  # noqa: E402


def build_runner(model, variables, imgs, iters):
    @jax.jit
    def run(left, right, temporal):
        acc = jnp.float32(0)
        x = left
        for _ in range(iters):
            out = model.apply(variables, x, right, temporal)
            acc = acc + out["flow"].astype(jnp.float32).mean()
            x = left + (acc * 1e-20).astype(left.dtype)
        return acc

    return run


def build_train_runner(model, variables, imgs, iters):
    """Race full train steps (fwd + joint loss + backward + adamw update)
    instead of forwards — corr formulations differ most in their BACKWARD
    (e.g. purev's batched dynamic-slice transposes to a scatter-add)."""
    import optax

    from cerberusnet_tpu.train import losses

    b, h, w = imgs[0].shape[:3]
    bd = {
        "left": imgs[0], "right": imgs[1], "temporal": imgs[2],
        "seg_labels": jnp.zeros((b, h, w), jnp.int32),
        "flow_gt": jnp.zeros((b, h, w, 2), jnp.float32),
        "flow_valid": jnp.ones((b, h, w), jnp.float32),
        "disp_gt": jnp.ones((b, h, w), jnp.float32),
        "disp_valid": jnp.ones((b, h, w), jnp.float32),
    }
    tx = optax.adamw(1e-4)
    opt_state0 = jax.jit(tx.init)(variables["params"])

    def loss_fn(params, left):
        out = model.apply({"params": params}, left, bd["right"], bd["temporal"])
        total, _ = losses.joint_loss(out, dict(bd, left=left))
        return total

    @jax.jit
    def run(left, right, temporal):
        params, opt_state = variables["params"], opt_state0
        x = left
        for i in range(iters):
            grads = jax.grad(loss_fn)(params, x)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            x = left + jax.tree.leaves(params)[0].astype(jnp.float32).mean().astype(left.dtype) * 1e-20
        return jax.tree.leaves(params)[0].astype(jnp.float32).mean()

    return run


def variant_sets():
    """Named perf-knob variant sets shared by the A/B racer and the
    HLO op-count census (tools/hlo_opcount.py)."""
    return {
        "stack": {
            "r1 (minor, no-dist)": dict(corr_stack="minor", distribute_outputs=False),
            "corr-major only": dict(corr_stack="major", distribute_outputs=False),
            "dist-outputs only": dict(corr_stack="minor", distribute_outputs=True),
            "r2 (major, dist)": dict(corr_stack="major", distribute_outputs=True),
        },
        # corr formulations (purev is pure up to ~1e-7 reduction-order
        # rounding; pallas_wl is a custom kernel — rank, don't diff bits)
        "corr": {
            "pure (r2 base)": dict(),
            "purev": dict(corr_impl="purev"),
            "pallas_wl": dict(corr_impl="pallas_wl"),
        },
        # op-count / relayout reduction candidates (round 2)
        "opcount": {
            "base": dict(),
            "purev": dict(corr_impl="purev"),
            "s2d": dict(s2d_stem=True),
            "purev+s2d": dict(corr_impl="purev", s2d_stem=True),
        },
        # one-variant set for absolute measurements / censuses
        "single": {
            "base": dict(),
        },
        # up-feat ConvTranspose formulations (VERDICT r1 item 2: suspected
        # source of the layout copies; subpixel = stride-1 conv + d2s)
        "upfeat": {
            "convt (base)": dict(),
            "subpixel": dict(upfeat_impl="subpixel"),
            "subpixel+s2d": dict(upfeat_impl="subpixel", s2d_stem=True),
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--set", default="stack", dest="variant_set",
                    help="which variant set to race (stack | corr)")
    ap.add_argument("--train", action="store_true",
                    help="race full train steps instead of forwards")
    args = ap.parse_args()

    from cerberusnet_tpu.models import CerberusNet

    variants = variant_sets()[args.variant_set]
    h, w = args.hw
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (args.batch, h, w, 3), jnp.bfloat16)
        for i in range(3)
    )

    runners = {}
    variables = None
    for name, kw in variants.items():
        model = CerberusNet(dtype=jnp.bfloat16, **kw)
        if variables is None:
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)
        builder = build_train_runner if args.train else build_runner
        run = builder(model, variables, imgs, args.iters)
        _fetch(run(*imgs))  # compile + warmup
        runners[name] = run
        print(f"[compiled] {name}", flush=True)

    floor = roundtrip_floor()
    times = {name: [] for name in runners}
    for r in range(args.rounds):
        for name, run in runners.items():
            t0 = time.time()
            _fetch(run(*imgs))
            dt = (time.time() - t0 - floor) / args.iters / args.batch
            times[name].append(dt)
            print(f"  round {r}: {name}: {dt * 1e3:.3f} ms/frame", flush=True)

    print(f"\nfloor={floor * 1e3:.2f} ms, iters={args.iters}, "
          f"batch={args.batch}, {h}x{w}")
    for name, ts in times.items():
        best, med = min(ts), statistics.median(ts)
        print(f"{name:24s} best {best * 1e3:7.3f}  median {med * 1e3:7.3f} "
              f"ms/frame  ({1.0 / med:6.1f} fps med)")


if __name__ == "__main__":
    main()
