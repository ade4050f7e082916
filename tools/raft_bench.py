"""RAFT-family hardware numbers + operating-point sweep (VERDICT r2 item 5).

Measures fps/chip at 512x1024 bf16 for RAFTFlowNet / RAFTStereoNet /
CerberusRAFT across refinement depths (--iters-list) and scan-vs-unroll,
with the floor-cancelling two-point slope and all-outputs/all-inputs-live
programs. Emits one JSON line per point so chain logs are machine-readable.

Usage:
  python tools/raft_bench.py                      # all models, iters 6+12, scan
  python tools/raft_bench.py --models raftflow --iters-list 12 --unroll
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-bench")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _build(name, iters, unroll, dtype, level=3, lookup="gather"):
    from cerberusnet_tpu import models

    if name == "raftflow":
        return models.RAFTFlowNet(dtype=dtype, iters=iters, level=level,
                                  unroll_iters=unroll,
                                  lookup_impl=lookup), 2
    if name == "raftstereo":
        return models.RAFTStereoNet(dtype=dtype, iters=iters, level=level,
                                    unroll_iters=unroll,
                                    lookup_impl=lookup), 2
    if name == "cerberusraft":
        return models.CerberusRAFT(dtype=dtype, iters=iters, level=level,
                                   unroll_iters=unroll,
                                   lookup_impl=lookup), 3
    raise SystemExit(f"unknown model {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*",
                    default=("raftflow", "raftstereo", "cerberusraft"))
    ap.add_argument("--iters-list", type=int, nargs="*", default=(6, 12))
    ap.add_argument("--unroll", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--hw", type=int, nargs=2, default=None,
                    help="single resolution (overrides the default sweep)")
    ap.add_argument("--levels", type=int, nargs="*", default=(3, 4),
                    help="operating levels (1/2^l res): the all-pairs "
                    "volume is ((H*W)/4^l)^2. (The r3 'pathology' at "
                    "512x1024/level 3 was the scalar-gather lookup, fixed "
                    "by the onehot default: 0.69 -> 36.1 fps, chain r4m)")
    ap.add_argument("--two-point", type=int, nargs=2, default=(2, 8))
    ap.add_argument("--lookup", default="onehot",
                    choices=("gather", "onehot"),
                    help="volume lookup impl (models/raft.py corr_lookup; "
                    "identical math, equality pinned in tests/test_raft.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cerberusnet_tpu.utils.benchutil import time_fn_two_point

    # Default operating-point grid (VERDICT r3 item 3): the committed 0.69
    # fps row was 512x1024/level3/iters12 only; the envelope needs both a
    # resolution axis and an operating-level axis. Full grid for the
    # flagship joint model; a reduced grid for the single-task pair (each
    # point costs two remote compiles).
    if args.hw is not None:
        points = [(tuple(args.hw), lv, it)
                  for lv in args.levels for it in args.iters_list]
        grids = {name: points for name in args.models}
    else:
        full = [((256, 512), 3, 6), ((256, 512), 3, 12),
                ((384, 768), 3, 12), ((512, 1024), 3, 12),
                ((512, 1024), 4, 6), ((512, 1024), 4, 12)]
        small = [((256, 512), 3, 12), ((512, 1024), 4, 12)]
        grids = {name: (full if name == "cerberusraft" else small)
                 for name in args.models}
    for name in args.models:
        for (h, w), level, iters in grids[name]:
            _run_point(name, h, w, level, iters, args, jax, jnp,
                       time_fn_two_point)


def _run_point(name, h, w, level, iters, args, jax, jnp, time_fn_two_point):
    model, n_in = _build(name, iters, args.unroll, jnp.bfloat16, level=level,
                         lookup=args.lookup)
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i),
                          (args.batch, h, w, 3), jnp.bfloat16)
        for i in range(n_in)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)

    def fwd(*xs):
        return model.apply(variables, *xs)

    def reduce_out(out):
        leaves = jax.tree.leaves(
            {k: v for k, v in out.items()
             if not k.endswith("_pyramid") and not k.endswith("_seq")}
        )
        return sum(x.astype(jnp.float32).mean() for x in leaves)

    sec = time_fn_two_point(fwd, imgs, iters=tuple(args.two_point),
                            reduce_out=reduce_out)
    print(json.dumps({
        "model": name, "iters": iters, "level": level,
        "mode": "unroll" if args.unroll else "scan",
        "lookup": args.lookup,
        "batch": args.batch, "hw": [h, w],
        "ms_per_frame": round(sec * 1e3 / args.batch, 3),
        "fps_per_chip": round(args.batch / sec, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
