"""Chip matmul speed-of-light, measured with the honest two-point timer.

VERDICT r2 item 2 flagged a contradiction: STATUS.md claimed the tunneled
chip slice sustains ~10 TFLOP/s on large bf16 matmuls, while the headline
model's own throughput implies ~31 TFLOP/s. One of those is wrong — this
tool re-measures the ceiling with the same floor-cancelling two-point
slope bench.py uses (the round-1 "10 TFLOP/s" figure predates that timer
and likely measured a single dispatch including the drifting round-trip
floor).

Chains ``x <- normalize(x @ w)`` so every iteration is data-dependent
(no CSE), with f32 normalization between bf16 matmuls to keep values
finite across long unrolls.

Usage: python tools/matmul_sol.py [--n 4096] [--iters 8 40]
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-bench")
sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--iters", type=int, nargs=2, default=(8, 40))
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cerberusnet_tpu.utils.benchutil import time_fn_two_point

    n = args.n
    dt = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, n), dt)
    w = (jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32)
         / jnp.sqrt(n)).astype(dt)

    def build(k):
        @jax.jit
        def run(x0, w0):
            acc = jnp.float32(0)
            cur = x0
            for _ in range(k):
                y = cur @ w0
                m = jnp.abs(y.astype(jnp.float32)).mean()
                acc = acc + m
                # renormalize so long chains stay finite; data-dependent,
                # so no cross-iteration CSE
                cur = (y.astype(jnp.float32) / (m + 1e-6)).astype(dt)
            return acc

        return run

    sec = time_fn_two_point(None, (x, w), iters=tuple(args.iters), build=build)
    flops = 2.0 * n * n * n
    print(f"matmul {n}^3 {args.dtype}: {sec * 1e3:.3f} ms/matmul "
          f"(two-point slope) -> {flops / sec / 1e12:.1f} TFLOP/s sustained")


if __name__ == "__main__":
    main()
