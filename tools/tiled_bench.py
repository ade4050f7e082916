"""Hardware check for tiled (sliding-window) inference — VERDICT r1 item 9.

Two measurements on the real TPU:
  1. Throughput at a beyond-one-pass resolution (default 2048x1024, tile
     1024x512): wall seconds per full-resolution frame through
     eval.tiled.tiled_forward (all tiles share one compiled executable;
     tile dispatches pipeline on the async backend, so wall time is
     fetch-to-fetch around the whole blended output).
  2. Interior equality vs the one-shot forward at a resolution both paths
     support (1024x512): the blended tiled output must match the one-shot
     output in the interior away from tile seams (max |diff| reported per
     head; flow/disp are translation-invariant so tiles stitch exactly up
     to blending arithmetic).

Usage: python tools/tiled_bench.py [--hw 1024 2048] [--tile 512 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from cerberusnet_tpu.eval.tiled import tiled_forward  # noqa: E402


def make_batch(b, h, w, keys=("left", "right", "temporal")):
    return {
        k: jax.random.normal(jax.random.PRNGKey(i), (b, h, w, 3), jnp.bfloat16)
        for i, k in enumerate(keys)
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(1024, 2048))
    ap.add_argument("--tile", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--overlap", type=float, default=0.25)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from cerberusnet_tpu.models import CerberusNet

    model = CerberusNet(dtype=jnp.bfloat16)
    th, tw = args.tile
    init_imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (1, th, tw, 3), jnp.bfloat16)
        for i in range(3)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *init_imgs)

    def forward(vs, batch):
        return model.apply(vs, batch["left"], batch["right"], batch["temporal"])

    # --- 2. interior equality at a one-shot-supported size ----------------
    h1, w1 = 512, 1024
    small = make_batch(1, h1, w1)
    one_shot = jax.jit(forward)(variables, small)
    tiled = tiled_forward(
        forward, variables, small, (512, 512), overlap=args.overlap
    )
    # interior: half a tile away from every seam
    iy, ix = 64, 128
    for key in ("seg_logits", "flow", "disp"):
        a = np.asarray(one_shot[key], np.float32)[:, iy:-iy, ix:-ix]
        b = np.asarray(tiled[key], np.float32)[:, iy:-iy, ix:-ix]
        print(
            f"interior |tiled - one-shot| {key}: max {np.abs(a - b).max():.4e} "
            f"mean {np.abs(a - b).mean():.4e}"
        )

    # --- 1. throughput at beyond-one-pass resolution -----------------------
    h, w = args.hw
    big = make_batch(1, h, w)
    tile_hw = (th, tw)

    ntiles = len(range(0, h - th, int(th * (1 - args.overlap)))) + 1
    ntiles *= len(range(0, w - tw, int(tw * (1 - args.overlap)))) + 1
    for batch_tiles in (False, True):
        def run():
            out = tiled_forward(forward, variables, big, tile_hw,
                                args.overlap, batch_tiles=batch_tiles)
            # fetch one scalar per head to force completion
            return float(
                sum(v.astype(jnp.float32).mean() for v in out.values())
            )

        run()  # compile + warmup
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        mode = "batched-tiles" if batch_tiles else "sequential"
        print(
            f"tiled {h}x{w} (tile {th}x{tw}, overlap {args.overlap}, "
            f"~{ntiles} tiles, {mode}): {best * 1e3:.1f} ms/frame = "
            f"{1 / best:.2f} fps"
        )


if __name__ == "__main__":
    main()
