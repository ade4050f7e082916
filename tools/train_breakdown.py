"""Per-segment train-step breakdown (VERDICT r2 item 3 / W3).

The train step (~52 ms/frame, BASELINE config 5) is ~5x the forward and
was never profiled segment-by-segment. This tool measures, each with the
floor-cancelling two-point slope and all-heads-consumed programs:

  fwd        : forward + joint loss (value only)
  fwdbwd     : forward + joint loss + backward (grads materialized)
  full       : fwdbwd + adamw update (the real train step)

so (fwdbwd - fwd) is the backward cost and (full - fwdbwd) the optimizer
cost. Knobs: --remat (jax.checkpoint the loss fn), --flatten
(optax.flatten adamw — the round-2 A/B that timed out), --bwd-dtype
(bf16 cotangents via a custom loss scale cast — OFF by default, changes
grad dtype only).

Every segment's program perturbs the image inputs per unrolled iteration
(benchutil._perturb) and chains params data-dependently so nothing is
CSE'd across iterations.

Usage:
  python tools/train_breakdown.py [--batch 2] [--iters 2 7]
  python tools/train_breakdown.py --remat --flatten
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-bench")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--iters", type=int, nargs=2, default=(2, 7))
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--flatten", action="store_true")
    ap.add_argument("--upsample", default="resize", choices=("resize", "phase"),
                    help="bilinear-2x lowering (models/common.py upsample2x)")
    ap.add_argument("--pallas-levels", type=int, default=0,
                    help="first N encoder levels as fused Pallas kernels")
    ap.add_argument("--pallas-grad", default="xla", choices=("xla", "pallas"),
                    help="backward path of the fused Pallas levels")
    ap.add_argument("--entry-grad", default="auto", choices=("auto", "phase"),
                    help="stride-2 encoder input-gradient lowering")
    ap.add_argument("--segments", nargs="*",
                    default=("fwd", "fwdbwd", "full"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from cerberusnet_tpu.models import CerberusNet
    from cerberusnet_tpu.train import losses
    from cerberusnet_tpu.utils.benchutil import _perturb, time_fn_two_point

    model = CerberusNet(dtype=jnp.bfloat16, upsample_impl=args.upsample,
                        pallas_levels=args.pallas_levels,
                        pallas_grad=args.pallas_grad,
                        entry_grad=args.entry_grad)
    b, (h, w) = args.batch, args.hw
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (b, h, w, 3), jnp.bfloat16)
        for i in range(3)
    )
    gt = {
        "seg_labels": jnp.zeros((b, h, w), jnp.int32),
        "flow_gt": jnp.zeros((b, h, w, 2), jnp.float32),
        "flow_valid": jnp.ones((b, h, w), jnp.float32),
        "disp_gt": jnp.ones((b, h, w), jnp.float32),
        "disp_valid": jnp.ones((b, h, w), jnp.float32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)
    params0 = variables["params"]
    tx = optax.adamw(1e-4)
    if args.flatten:
        tx = optax.flatten(tx)
    opt_state0 = jax.jit(tx.init)(params0)

    def loss_fn(params, left, right, temporal):
        out = model.apply({"params": params}, left, right, temporal)
        bd = dict(gt, left=left, right=right, temporal=temporal)
        total, _ = losses.joint_loss(out, bd)
        return total

    if args.remat:
        loss_fn = jax.checkpoint(loss_fn)

    def chain_params(params, scalar):
        eps = (scalar * 1e-20).astype(jnp.float32)
        return jax.tree.map(lambda p: p + eps.astype(p.dtype), params)

    def build_fwd(n):
        @jax.jit
        def run(params, *imgs0):
            acc = jnp.float32(0)
            cur = imgs0
            p = params
            for _ in range(n):
                acc = acc + loss_fn(p, *cur).astype(jnp.float32)
                cur = _perturb(imgs0, acc)
                p = chain_params(params, acc)
            return acc

        return run

    def build_fwdbwd(n):
        @jax.jit
        def run(params, *imgs0):
            acc = jnp.float32(0)
            cur = imgs0
            p = params
            for _ in range(n):
                loss, grads = jax.value_and_grad(loss_fn)(p, *cur)
                # consume EVERY grad leaf: reducing only leaves[0] lets XLA
                # prune all other params' weight-grad computations (measured:
                # 'fwdbwd' read 0.6 ms/frame over fwd — an obvious DCE hole)
                gsum = sum(
                    g.astype(jnp.float32).mean() for g in jax.tree.leaves(grads)
                )
                acc = acc + loss.astype(jnp.float32) + gsum
                cur = _perturb(imgs0, acc)
                p = chain_params(params, acc)
            return acc

        return run

    def build_full(n):
        @jax.jit
        def run(params, opt_state, *imgs0):
            acc = jnp.float32(0)
            cur = imgs0
            p, os_ = params, opt_state
            for _ in range(n):
                loss, grads = jax.value_and_grad(loss_fn)(p, *cur)
                updates, os_ = tx.update(grads, os_, p)
                p = optax.apply_updates(p, updates)
                acc = acc + loss.astype(jnp.float32)
                cur = _perturb(imgs0, acc)
            return acc + jax.tree.leaves(p)[0].astype(jnp.float32).mean()

        return run

    builders = {
        "fwd": (build_fwd, (params0, *imgs)),
        "fwdbwd": (build_fwdbwd, (params0, *imgs)),
        "full": (build_full, (params0, opt_state0, *imgs)),
    }
    tag = []
    if args.remat:
        tag.append("remat")
    if args.flatten:
        tag.append("flatten")
    if args.upsample != "resize":
        tag.append(f"upsample={args.upsample}")
    print(f"# train breakdown b{b} {h}x{w} bf16 "
          f"iters={tuple(args.iters)} {'+'.join(tag) or 'base'}")
    results = {}
    for name in args.segments:
        build, a = builders[name]
        sec = time_fn_two_point(None, a, iters=tuple(args.iters), build=build)
        ms = sec * 1e3 / b
        results[name] = ms
        print(f"{name:>7}: {ms:8.3f} ms/frame  ({b / sec:6.2f} fps at b{b})",
              flush=True)
    if "fwd" in results and "fwdbwd" in results:
        print(f"{'bwd':>7}: {results['fwdbwd'] - results['fwd']:8.3f} ms/frame"
              " (derived)")
    if "fwdbwd" in results and "full" in results:
        print(f"{'optim':>7}: {results['full'] - results['fwdbwd']:8.3f}"
              " ms/frame (derived)")


if __name__ == "__main__":
    main()
