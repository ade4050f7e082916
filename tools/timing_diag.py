"""Wall-time linearity diagnostic for the unrolled-timing methodology.

Measures wall time of the SAME jitted forward unrolled n times for several
n and prints the pairwise slopes (ms per additional iteration). Purpose:
decide which per-frame number is real when methods disagree —

  * XProf device timeline (round-2 capture): 5.66 ms/step, 100% occupied,
    no gaps (tools/profile_forward.py on the headline forward).
  * Two-point wall differencing (bench.py): 10.5 ms per added iteration.

If the wall slope is CONSTANT across n-pairs, wall time really is
slope*n + const, and the slope is the honest streaming cost per frame on
this stack (whatever the profiler's device clock claims). If the slope
drifts with n, the unroll methodology itself is suspect.

Usage: python tools/timing_diag.py [--batch 1] [--ns 2 7 12 22]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-bench")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from cerberusnet_tpu.utils.benchutil import _fetch  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--ns", type=int, nargs="+", default=[2, 7, 12, 22])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    args = ap.parse_args()

    from cerberusnet_tpu.models import CerberusNet

    model = CerberusNet(dtype=jnp.bfloat16)
    h, w = args.hw
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (args.batch, h, w, 3), jnp.bfloat16)
        for i in range(3)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)

    def forward(left, right, temporal):
        return model.apply(variables, left, right, temporal)

    def reduce_out(out):
        return (
            out["flow"].mean() + out["disp"].mean() + out["seg_logits"].mean()
        ).astype(jnp.float32)

    # identical program structure to benchutil.time_fn_two_point's default
    # build, so n=2/12 hit the bench compile cache
    def build(n):
        @jax.jit
        def run(x0, *rest):
            acc = jnp.float32(0)
            x = x0
            for _ in range(n):
                out = forward(x, *rest)
                acc = acc + reduce_out(out).astype(jnp.float32)
                x = x0 + (acc * 1e-20).astype(x0.dtype)
            return acc

        return run

    runs = {}
    for n in args.ns:
        t0 = time.time()
        r = build(n)
        _fetch(r(*imgs))
        runs[n] = r
        print(f"[compiled+warm] n={n} in {time.time() - t0:.1f}s", flush=True)

    best = {n: float("inf") for n in args.ns}
    for rep in range(args.repeats):
        for n in args.ns:
            t0 = time.time()
            _fetch(runs[n](*imgs))
            dt = time.time() - t0
            best[n] = min(best[n], dt)
            print(f"  rep {rep}: T({n}) = {dt * 1e3:8.1f} ms", flush=True)

    print("\nbest-of wall times:")
    for n in args.ns:
        print(f"  T({n}) = {best[n] * 1e3:8.1f} ms")
    print("\npairwise slopes (ms per additional iteration):")
    ns = sorted(args.ns)
    for i in range(len(ns)):
        for j in range(i + 1, len(ns)):
            a, b = ns[i], ns[j]
            slope = (best[b] - best[a]) / (b - a) * 1e3
            print(f"  ({a:3d} -> {b:3d}): {slope:7.3f} ms/iter")


if __name__ == "__main__":
    main()
