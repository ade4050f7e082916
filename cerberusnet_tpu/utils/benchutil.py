"""Benchmark timing utilities that are honest on remote/async backends.

Two environment facts shape this (measured, see SURVEY/memory notes):
  * Per-call dispatch to the TPU tunnel costs milliseconds — iterations must
    run inside ONE jitted program (static unroll; fori_loop adds ~1 ms per
    iteration of its own overhead here).
  * `block_until_ready()` on this backend returns at ENQUEUE, not
    completion — a matmul chain "finished" in 4 us until the value was
    fetched. Only a host transfer proves completion, so timings fetch the
    scalar result and subtract the measured fetch round-trip floor.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _fetch(x):
    return float(jax.device_get(x))


def roundtrip_floor(repeats: int = 3) -> float:
    """Seconds for dispatch+fetch of a trivial jitted scalar program."""

    @jax.jit
    def trivial(x):
        return jnp.sum(x) * 0

    arg = jnp.ones((8, 8), jnp.float32)
    _fetch(trivial(arg))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        _fetch(trivial(arg))
        best = min(best, time.time() - t0)
    return best


def time_fn(fn, args, iters: int = 10, reduce_out=None, repeats: int = 2):
    """Seconds per iteration of fn(*args), honestly measured.

    Builds a jitted program that chains `iters` calls of fn (each iteration's
    input perturbed by the running scalar so nothing is hoisted/CSE'd),
    reduces each output to a scalar via `reduce_out` (default: mean of the
    first/only output), fetches the final scalar, and subtracts the
    dispatch+fetch floor.
    """
    if reduce_out is None:
        def reduce_out(out):
            leaf = jax.tree.leaves(out)[0]
            return leaf.astype(jnp.float32).mean()

    @jax.jit
    def run(x0, *rest):
        acc = jnp.float32(0)
        x = x0
        for _ in range(iters):
            out = fn(x, *rest)
            acc = acc + reduce_out(out).astype(jnp.float32)
            x = x0 + (acc * 1e-20).astype(x0.dtype)
        return acc

    _fetch(run(*args))  # compile + warmup
    floor = roundtrip_floor()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        _fetch(run(*args))
        best = min(best, time.time() - t0)
    return max(best - floor, 1e-9) / iters
