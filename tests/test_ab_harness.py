"""The timing harnesses must race the FULL model (VERDICT r2 W1).

Round 2's A/B harness reduced only out["flow"], so XLA dead-code-eliminated
the disparity decoder, the seg head, and the right-image encoder pass —
every raced program had ~100 of the full model's 212 convolutions, and all
forward A/B verdicts were measured on roughly half the model. A second
hazard: with only `left` perturbed between unrolled iterations, the
right/temporal encoder passes are loop-invariant and XLA CSE merges them
across iterations (564 of 636 convs at n=3, measured), so even bench.py's
two-point slope excluded them.

These tests pin the invariant on a tiny model (CPU, fast compiles):
  conv_count(unroll_n) == n * conv_count(single full apply)
for both the A/B racer's builder and benchutil's default two-point builder,
and demonstrate the two failure modes still exist if the guards regress.
"""

import jax
import jax.numpy as jnp

from cerberusnet_tpu.models import CerberusNet
from cerberusnet_tpu.utils import benchutil
from tools.ab_forward import forward_builder, reduce_all
from tools.hlo_opcount import census

TINY = dict(
    encoder_channels=(8, 12, 16, 16, 16, 16),
    est_channels=(16, 16, 12),
    ctx_channels=(16, 16),
    fpn_channels=16,
)
H, W = 64, 64
N = 2


def _setup():
    model = CerberusNet(corr_impl="pure", **TINY)
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (1, H, W, 3), jnp.float32)
        for i in range(3)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)
    return model, variables, imgs


def _convs(jitted, imgs):
    return census(jitted.lower(*imgs).compile().as_text()).get(
        "convolution", 0
    )


class TestNoDCE:
    def test_ab_forward_builder_races_full_model(self):
        model, variables, imgs = _setup()
        single = jax.jit(lambda *xs: reduce_all(model.apply(variables, *xs)))
        c1 = _convs(single, imgs)
        cn = _convs(forward_builder(model, variables)(N), imgs)
        assert c1 > 0
        assert cn == N * c1, (
            f"A/B harness raced {cn} convs, full model x{N} is {N * c1} — "
            "DCE or cross-iteration CSE regression"
        )

    def test_benchutil_default_build_races_full_model(self):
        """bench.py's headline slope uses time_fn_two_point's default
        builder; it must keep every conv of every iteration live."""
        model, variables, imgs = _setup()

        def fwd(*xs):
            return model.apply(variables, *xs)

        single = jax.jit(lambda *xs: reduce_all(fwd(*xs)))
        c1 = _convs(single, imgs)

        # Reproduce the default builder exactly as time_fn_two_point does.
        def build(n):
            @jax.jit
            def run(*args0):
                acc = jnp.float32(0)
                cur = args0
                for _ in range(n):
                    acc = acc + reduce_all(fwd(*cur)).astype(jnp.float32)
                    cur = benchutil._perturb(args0, acc)
                return acc

            return run

        cn = _convs(build(N), imgs)
        assert cn == N * c1

    def test_flow_only_reduction_is_dce_hazard(self):
        """Document WHY the guard exists: the broken round-2 reduction
        demonstrably drops convolutions. If XLA ever stops DCE'ing this,
        the guard is free; if this fails the other way, the census
        machinery broke."""
        model, variables, imgs = _setup()
        full = jax.jit(lambda *xs: reduce_all(model.apply(variables, *xs)))
        flow_only = jax.jit(
            lambda *xs: model.apply(variables, *xs)["flow"].mean()
        )
        assert _convs(flow_only, imgs) < _convs(full, imgs)
