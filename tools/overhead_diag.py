"""Backend overhead diagnostic: where does wall time beyond device-busy go?

Round-2 finding to explain: the headline forward costs 10.4 ms/iter of wall
time (two-point slope, affine-verified) while its XProf device timeline shows
5.66 ms/step at 100% occupancy. Two candidate theories:

  T1 (per-op overhead): each of the ~2000 device ops/step pays a fixed
     launch/tracking cost (~2.4 us) that the trace does not record.
  T2 (clock scaling): the trace's device clock under-reports all durations
     by a constant ~1.85x.

This tool separates them with two measured programs:

  A. "big": a chain of 4096x4096 bf16 matmuls — 137.4 GFLOP each, so the
     XProf-reported ~707 us/matmul is already at the v5e bf16 speed of
     light (~197 TFLOP/s); the duration CANNOT be under-reported (T2 would
     imply >2x faster than the MXU peak). If the wall slope per matmul is
     ~707 us, trace busy == wall for op-sparse programs and T2 is dead.

  B. "tiny": chains of K dependent 128x128 matmuls for two values of K.
     Busy per dot is negligible (<2 us), so slope(K2) - slope(K1) divided
     by (K2 - K1) IS the per-op wall overhead.

Usage: python tools/overhead_diag.py
Writes one summary line per program; run on the real TPU (axon).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from cerberusnet_tpu.utils.benchutil import time_fn_two_point  # noqa: E402


def big_matmul_slope(chain: int = 8):
    x0 = jax.random.normal(jax.random.PRNGKey(0), (4096, 4096), jnp.bfloat16)

    def body(x):
        for _ in range(chain):
            x = (x @ x) * jnp.bfloat16(1e-4)
        return x

    s = time_fn_two_point(body, (x0,), iters=(2, 12), repeats=3)
    per_mm = s / chain
    print(
        f"A big-matmul: {s * 1e3:.3f} ms/iter ({chain} matmuls) -> "
        f"{per_mm * 1e6:.1f} us/matmul (speed of light ~700 us; "
        f"trace-busy equals wall iff ratio ~1.0: ratio={per_mm / 700e-6:.2f})"
    )
    return per_mm


def tiny_op_slope(k: int):
    x0 = jax.random.normal(jax.random.PRNGKey(1), (128, 128), jnp.float32)
    a = jax.random.normal(jax.random.PRNGKey(2), (128, 128), jnp.float32)
    a = a / jnp.linalg.norm(a, axis=0, keepdims=True)  # keep values bounded

    def body(x, a):
        for _ in range(k):
            x = x @ a
        return x

    s = time_fn_two_point(body, (x0, a), iters=(1, 3), repeats=3)
    print(f"B tiny-op chain k={k}: {s * 1e3:.3f} ms/iter -> {s / k * 1e6:.2f} us/op")
    return s


def main():
    print(f"devices: {jax.devices()}")
    big_matmul_slope()
    # NOTE: keep total unrolled op counts modest — a 5120-dot graph took
    # >20 min to compile on the remote helper (round 2); 3*256=768 is fine.
    k1, k2 = 64, 256
    s1 = tiny_op_slope(k1)
    s2 = tiny_op_slope(k2)
    per_op = (s2 - s1) / (k2 - k1)
    print(
        f"=> per-op wall overhead (incremental): {per_op * 1e6:.2f} us/op "
        f"(T1 predicts ~2.4; T2 predicts ~busy-only, <0.5)"
    )


if __name__ == "__main__":
    main()
