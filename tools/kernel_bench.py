"""Correlation-kernel microbenchmark: Pallas vs pure-XLA at the real
pyramid shapes (1024x512 input), honest fetch-based timing
(cerberusnet_tpu.utils.benchutil). Writes kernel_bench.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_bench.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from cerberusnet_tpu.ops.correlation import _correlation1d_pure, _correlation2d_pure
from cerberusnet_tpu.ops.pallas.correlation import (
    correlation1d_pallas,
    correlation1d_wl,
    correlation2d_pallas,
    correlation2d_wl,
)

# (level, H, W, C) for 1024x512 input; flow corr d=4; disp D=max(96>>l, 4)
LEVELS = [
    (2, 128, 256, 32),
    (3, 64, 128, 64),
    (4, 32, 64, 96),
    (5, 16, 32, 128),
    (6, 8, 16, 196),
]
BATCH = 2
ITERS = 30


def loop_time(fn, *args):
    from cerberusnet_tpu.utils.benchutil import time_fn

    return time_fn(fn, args, iters=ITERS) * 1e6  # us


def grad_loop_time(fn, f1, f2):
    from cerberusnet_tpu.utils.benchutil import time_fn

    g = jax.grad(
        lambda a, b: (fn(a, b).astype(jnp.float32) ** 2).sum(), argnums=(0, 1)
    )

    def wrapped(a, b):
        da, db = g(a, b)
        return da.astype(jnp.float32).mean() + db.astype(jnp.float32).mean()

    return time_fn(wrapped, (f1, f2), iters=ITERS,
                   reduce_out=lambda o: o) * 1e6


def main():
    results = {}
    for dtype_name, dtype in [("bf16", jnp.bfloat16), ("f32", jnp.float32)]:
        for level, h, w, c in LEVELS:
            key = f"L{level}_{h}x{w}x{c}_{dtype_name}"
            rng = np.random.RandomState(0)
            f1 = jnp.asarray(rng.randn(BATCH, h, w, c), dtype)
            f2 = jnp.asarray(rng.randn(BATCH, h, w, c), dtype)
            d1 = max(96 >> level, 4)

            row = {}
            row["corr2d_pallas_us"] = loop_time(
                functools.partial(correlation2d_pallas, max_disp=4), f1, f2
            )
            row["corr2d_pure_us"] = loop_time(
                functools.partial(_correlation2d_pure, max_disp=4), f1, f2
            )
            row["corr2d_wl_us"] = loop_time(
                functools.partial(correlation2d_wl, max_disp=4), f1, f2
            )
            row["corr1d_pallas_us"] = loop_time(
                functools.partial(correlation1d_pallas, max_disp=d1), f1, f2
            )
            row["corr1d_pure_us"] = loop_time(
                functools.partial(_correlation1d_pure, max_disp=d1), f1, f2
            )
            row["corr1d_wl_us"] = loop_time(
                functools.partial(correlation1d_wl, max_disp=d1), f1, f2
            )
            if level == 2:
                row["corr2d_grad_pallas_us"] = grad_loop_time(
                    functools.partial(correlation2d_pallas, max_disp=4), f1, f2
                )
                row["corr2d_grad_pure_us"] = grad_loop_time(
                    functools.partial(_correlation2d_pure, max_disp=4), f1, f2
                )
            results[key] = {k: round(v, 1) for k, v in row.items()}
            print(key, results[key], flush=True)
    with open("kernel_bench.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
