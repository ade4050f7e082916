"""MFU denominator: analytic FLOPs/frame per model + achieved TFLOP/s.

VERDICT r2 item 2: perf work had no denominator — fps moved (or didn't)
with no statement of how far from the hardware ceiling the model runs.
This tool publishes the denominator:

  * FLOPs/frame from XLA's own cost model (``compiled.cost_analysis()``)
    on the CPU backend at two small shapes, verified affine in the pixel
    count and extrapolated to the target shape (convs, correlation windows
    and elementwise work all scale linearly in H*W; the affine fit removes
    the fixed per-program overhead term);
  * achieved TFLOP/s = FLOPs/frame x fps (pass --fps, e.g. from bench.py);
  * utilization vs the v5e bf16 peak (197 TFLOP/s, public spec) AND vs the
    chip slice's measured matmul ceiling (tools/matmul_sol.py), which on
    this tunneled slice may be below the paper peak.

Usage:
  python tools/mfu.py                         # all models, FLOPs table
  python tools/mfu.py --model cerberus --fps 95.9
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

V5E_BF16_PEAK_TFLOPS = 197.0  # public v5e spec (bf16, per chip)


def _build(name: str, dtype, **kw):
    import jax
    import jax.numpy as jnp

    from cerberusnet_tpu import models

    if name == "cerberus":
        return models.CerberusNet(dtype=dtype, **kw), 3
    if name == "dcv":
        return models.CerberusDCV(dtype=dtype, **kw), 3
    if name == "raft":
        return models.RAFTFlowNet(dtype=dtype, **kw), 2
    if name == "cerberusraft":
        return models.CerberusRAFT(dtype=dtype, **kw), 3
    if name == "seg":
        return models.SegNet(dtype=dtype, **kw), 1
    if name == "flow":
        return models.FlowNet(dtype=dtype, **kw), 2
    if name == "stereo":
        return models.StereoNet(dtype=dtype, **kw), 2
    raise SystemExit(f"unknown model {name}")


# FLOPs spec for every committed BENCH_details row (VERDICT r4 item 8/W4:
# throughput claims must ship their utilization denominator — DCV at 189
# fps and CerberusRAFT at 274 fps had no MFU rows). Evaluated DIRECTLY at
# each row's true shape: the affine-in-pixels fit is wrong for the RAFT
# family, whose all-pairs volume is QUADRATIC in the pixel count.
BENCH_ROWS = {
    "full3head_bf16_fps": ("cerberus", (512, 1024), {}),
    "seg_fp32_fps": ("seg", (512, 1024), {}),
    "stereo_bf16_fps": ("stereo", (512, 1024), {}),
    "flow_bf16_fps": ("flow", (512, 1024), {}),
    "cerberus_dcv_bf16_fps": ("dcv", (512, 1024), {}),
    "raft_bf16_256x512_fps": ("raft", (256, 512), {}),
    "cerberus_raft_bf16_256x512_6it_fps":
        ("cerberusraft", (256, 512), dict(iters=6)),
    "cerberus_raft_bf16_512x1024_lv4_6it_fps":
        ("cerberusraft", (512, 1024), dict(iters=6, level=4)),
}


def train_step_flops(hw=(512, 1024)):
    """FLOPs/frame of one full train step: the standard fwd+bwd counting
    convention, 3x the forward model FLOPs (each conv's backward is one
    data-gradient conv + one weight-gradient conv; the optimizer update is
    O(params) — negligible next to the conv work).

    Why not XLA's cost model on the actual train program: measured here
    (2026-08-21, CPU backend, 128x256), cost_analysis() reports the
    fwd+loss+bwd+adamw program at 0.54x the forward-only program — a
    physically impossible ratio (the hardware-measured time ratio is
    ~3.5x, BASELINE r3e breakdown), i.e. the cost model does not count
    the gradient convolutions' FLOPs. The 3x convention is the honest
    denominator available."""
    import jax.numpy as jnp

    model, n_in = _build("cerberus", jnp.bfloat16)
    return 3.0 * flops_at(model, n_in, hw)


def emit_rows(out_path: str, ceiling_tflops: float):
    """Compute FLOPs/frame for every BENCH_details row at its true shape
    (CPU backend, XLA cost model) and write the table bench.py --all uses
    to annotate each fps row with TFLOP/s and %-of-measured-ceiling."""
    import json

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    rows = {}
    for row, (name, hw, kw) in BENCH_ROWS.items():
        model, n_in = _build(name, jnp.bfloat16, **kw)
        fl = flops_at(model, n_in, hw)
        rows[row] = fl
        print(f"[mfu] {row}: {fl / 1e12:.4f} TFLOP/frame @ {hw[0]}x{hw[1]}",
              flush=True)
    fl = train_step_flops()
    rows["train_step_bf16_fps"] = fl
    print(f"[mfu] train_step_bf16_fps: {fl / 1e12:.4f} TFLOP/frame "
          "(fwd+loss+bwd+adamw)", flush=True)
    with open(out_path, "w") as f:
        json.dump(
            {
                "measured_ceiling_tflops": ceiling_tflops,
                "note": "FLOPs/frame, XLA cost model at each row's true "
                        "shape (direct, no affine fit — RAFT rows are "
                        "quadratic in pixels); ceiling = "
                        "tools/matmul_sol.py chained 4096^3 bf16 slope",
                "rows": rows,
            },
            f,
            indent=2,
        )
    print(f"[mfu] wrote {out_path}", flush=True)


def flops_at(model, n_in, hw, batch=1):
    import jax
    import jax.numpy as jnp

    h, w = hw
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (batch, h, w, 3), jnp.bfloat16)
        for i in range(n_in)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)

    def fwd(*xs):
        out = model.apply(variables, *xs)
        # consume every output: DCE'd heads must not vanish from the count
        leaves = jax.tree.leaves(out)
        return sum(x.astype(jnp.float32).mean() for x in leaves)

    compiled = jax.jit(fwd).lower(*imgs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return float(cost["flops"])


def flops_per_frame(name: str, target_hw=(512, 1024)):
    """Affine fit F(pixels) = a*pixels + b over two probe shapes, evaluated
    at the target pixel count. Returns (flops_at_target, rel_nonlinearity)
    where the latter sanity-checks the linear-in-area model on a third
    shape."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    model, n_in = _build(name, jnp.bfloat16)
    shapes = [(64, 128), (128, 256)]
    px = [h * w for h, w in shapes]
    fl = [flops_at(model, n_in, s) for s in shapes]
    a = (fl[1] - fl[0]) / (px[1] - px[0])
    b = fl[0] - a * px[0]
    # third-point check: 64x192 is off the fit grid (H, W must both stay
    # divisible by 64 — six pyramid halvings)
    h3, w3 = 64, 192
    f3 = flops_at(model, n_in, (h3, w3))
    pred3 = a * h3 * w3 + b
    rel = abs(f3 - pred3) / f3
    target = a * (target_hw[0] * target_hw[1]) + b
    return target, rel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="cerberus|dcv|raft|seg|flow|stereo (default: all)")
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--fps", type=float, default=None,
                    help="measured fps/chip to convert into TFLOP/s")
    ap.add_argument("--peak", type=float, default=V5E_BF16_PEAK_TFLOPS,
                    help="chip peak TFLOP/s for the utilization column")
    ap.add_argument("--emit-rows", default=None, metavar="PATH",
                    help="write the per-BENCH-row FLOPs table (see "
                    "BENCH_ROWS) to PATH and exit; bench.py --all reads "
                    "runs/mfu_flops.json to annotate every committed row")
    ap.add_argument("--ceiling", type=float, default=181.3,
                    help="measured chip matmul ceiling TFLOP/s "
                    "(tools/matmul_sol.py, chain r3a)")
    args = ap.parse_args()

    if args.emit_rows:
        emit_rows(args.emit_rows, args.ceiling)
        return

    names = [args.model] if args.model else [
        "cerberus", "dcv", "raft", "seg", "flow", "stereo"
    ]
    print(f"# FLOPs/frame at {args.hw[0]}x{args.hw[1]} "
          f"(XLA cost model, affine-in-pixels fit)")
    for name in names:
        fl, rel = flops_per_frame(name, tuple(args.hw))
        line = (f"{name:>9}: {fl / 1e12:7.4f} TFLOP/frame  "
                f"(linearity check: {rel * 100:.2f}% off at 96x192)")
        if args.fps:
            tps = fl * args.fps / 1e12
            line += (f"  @ {args.fps:.1f} fps -> {tps:6.2f} TFLOP/s "
                     f"= {tps / args.peak * 100:5.1f}% of "
                     f"{args.peak:.0f} TFLOP/s peak")
        print(line, flush=True)


if __name__ == "__main__":
    main()
