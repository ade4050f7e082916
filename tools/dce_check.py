"""Verify timing harnesses race the FULL model — no DCE, no cross-iteration CSE.

Round-2 postmortem (VERDICT W1): tools/ab_forward.py reduced only
out["flow"], so XLA dead-code-eliminated the disparity decoder, the seg
head, and the right-image encoder pass — every raced program had 112 of
the full model's 212 convolutions. A second hazard: if the unrolled timing
loop perturbs only `left` between iterations, the right/temporal encoder
pyramids are loop-invariant and XLA common-subexpression-eliminates them
across iterations, so the two-point slope silently excludes their cost.

This tool compiles (CPU backend, small shape) and counts optimized-HLO
convolutions for:
  single : one model.apply consuming ALL outputs        -> C convs
  flowonly(n) : round-2's broken reduction, n-unroll    -> expect << n*C
  leftonly(n) : all-outputs reduce, only left perturbed -> CSE check
  allpert(n)  : all-outputs reduce, all inputs perturbed-> must be n*C

Exit nonzero if allpert(n) != n * single. tests/test_ab_harness.py runs the
same check in CI.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def conv_count(compiled_text: str) -> int:
    from tools.hlo_opcount import census

    return census(compiled_text).get("convolution", 0)


def build_programs(model, variables, imgs, n):
    import jax
    import jax.numpy as jnp

    def reduce_all(out):
        return (
            out["flow"].astype(jnp.float32).mean()
            + out["disp"].astype(jnp.float32).mean()
            + out["seg_logits"].astype(jnp.float32).mean()
        )

    def unroll(reduce_out, perturb_all):
        @jax.jit
        def run(left, right, temporal):
            acc = jnp.float32(0)
            l, r, t = left, right, temporal
            for _ in range(n):
                out = model.apply(variables, l, r, t)
                acc = acc + reduce_out(out).astype(jnp.float32)
                eps = (acc * 1e-20)
                l = left + eps.astype(left.dtype)
                if perturb_all:
                    r = right + eps.astype(right.dtype)
                    t = temporal + eps.astype(temporal.dtype)
            return acc

        return run

    single = jax.jit(
        lambda *xs: reduce_all(model.apply(variables, *xs))
    )
    flowonly = unroll(lambda o: o["flow"].astype(jnp.float32).mean(), False)
    leftonly = unroll(reduce_all, False)
    allpert = unroll(reduce_all, True)
    return {"single": single, "flowonly": flowonly,
            "leftonly": leftonly, "allpert": allpert}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(64, 128))
    ap.add_argument("-n", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cerberusnet_tpu.models import CerberusNet

    model = CerberusNet(dtype=jnp.bfloat16)
    h, w = args.hw
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (1, h, w, 3), jnp.bfloat16)
        for i in range(3)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)
    progs = build_programs(model, variables, imgs, args.n)
    counts = {}
    for name, fn in progs.items():
        compiled = jax.jit(fn).lower(*imgs).compile()
        counts[name] = conv_count(compiled.as_text())
        print(f"{name:>9}: {counts[name]} convolutions", flush=True)
    expect = args.n * counts["single"]
    print(f"expect allpert == n*single == {expect}")
    if counts["allpert"] != expect:
        print("FAIL: all-perturbed unroll does not race the full model")
        raise SystemExit(1)
    print("OK")


if __name__ == "__main__":
    main()
