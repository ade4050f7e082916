"""Capture a jax.profiler trace of the headline forward (or train step) on
the TPU and print the profile_report digest — the evidence loop for the
layout-copy/concat frontier (BASELINE.md per-component table).

Usage:
  python tools/profile_forward.py [--train] [--batch 1] [--iters 12]
      [--trace-dir /tmp/fwd_trace] [--fused 1]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--trace-dir", default="/tmp/fwd_trace")
    ap.add_argument("--fused", type=int, default=1)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from cerberusnet_tpu.models import CerberusNet

    model = CerberusNet(dtype=jnp.bfloat16, fused=bool(args.fused))
    h, w = 512, 1024
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (args.batch, h, w, 3), jnp.bfloat16)
        for i in range(3)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)

    if args.train:
        import optax

        from cerberusnet_tpu.train import losses

        bd = {
            "left": imgs[0], "right": imgs[1], "temporal": imgs[2],
            "seg_labels": jnp.zeros((args.batch, h, w), jnp.int32),
            "flow_gt": jnp.zeros((args.batch, h, w, 2), jnp.float32),
            "flow_valid": jnp.ones((args.batch, h, w), jnp.float32),
            "disp_gt": jnp.ones((args.batch, h, w), jnp.float32),
            "disp_valid": jnp.ones((args.batch, h, w), jnp.float32),
        }
        tx = optax.adamw(1e-4)
        opt_state = jax.jit(tx.init)(variables["params"])

        def loss_fn(params):
            out = model.apply({"params": params}, bd["left"], bd["right"],
                              bd["temporal"])
            total, _ = losses.joint_loss(out, bd)
            return total

        @jax.jit
        def run(params, opt_state):
            for i in range(args.iters):
                grads = jax.grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            return jax.tree.leaves(params)[0].astype(jnp.float32).mean()

        fetch = lambda: float(run(variables["params"], opt_state))  # noqa: E731
    else:
        from cerberusnet_tpu.utils.benchutil import _perturb
        from tools.ab_forward import reduce_all

        # Full-model program: consume every head and perturb every input
        # per iteration, or XLA DCE/CSE prunes whole decoders from the
        # profiled graph (VERDICT r2 W1; tools/dce_check.py).
        @jax.jit
        def run(*imgs0):
            acc = jnp.float32(0)
            cur = imgs0
            for _ in range(args.iters):
                out = model.apply(variables, *cur)
                acc = acc + reduce_all(out)
                cur = _perturb(imgs0, acc)
            return acc

        fetch = lambda: float(run(*imgs))  # noqa: E731

    fetch()  # compile + warmup
    with jax.profiler.trace(args.trace_dir):
        fetch()

    from tools.profile_report import main as report_main

    report_main([args.trace_dir, "--steps", str(args.iters),
                 "--top", str(args.top)])


if __name__ == "__main__":
    main()
