"""Fused DenseNet-estimator equivalence tests (models/common.py
FusedDenseEstimator): the MXU-efficient formulation must be param-tree
IDENTICAL (same names, shapes, and RNG-derived init values) and
math-identical to the naive DenseEstimator + narrow prediction conv, for
both the PWC-style decoders and the DCV family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberusnet_tpu.models import CerberusDCV, CerberusNet

TINY = dict(
    encoder_channels=(8, 12, 16, 16, 16, 16),
    est_channels=(16, 16, 12),
    ctx_channels=(16, 16),
    fpn_channels=16,
    corr_impl="pure",
)


def _trees_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    ka = [jax.tree_util.keystr(k) for k, _ in fa]
    kb = [jax.tree_util.keystr(k) for k, _ in fb]
    assert ka == kb, (
        f"param trees differ; only-fused={sorted(set(ka)-set(kb))[:4]} "
        f"only-naive={sorted(set(kb)-set(ka))[:4]}"
    )
    for (_, va), (_, vb) in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


@pytest.mark.parametrize("cls", [CerberusNet, CerberusDCV], ids=["pwc", "dcv"])
class TestFusedEquivalence:
    def test_init_trees_identical(self, cls):
        rng = np.random.RandomState(0)
        imgs = tuple(
            jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32) for _ in range(3)
        )
        vf = jax.jit(cls(fused=True, **TINY).init)(jax.random.PRNGKey(0), *imgs)
        vu = jax.jit(cls(fused=False, **TINY).init)(jax.random.PRNGKey(0), *imgs)
        _trees_equal(vf, vu)

    def test_outputs_match(self, cls):
        rng = np.random.RandomState(1)
        imgs = tuple(
            jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32) for _ in range(3)
        )
        mf, mu = cls(fused=True, **TINY), cls(fused=False, **TINY)
        v = jax.jit(mf.init)(jax.random.PRNGKey(0), *imgs)
        of = jax.jit(mf.apply)(v, *imgs)
        ou = jax.jit(mu.apply)(v, *imgs)  # same params by tree equality
        for k in ("seg_logits", "flow", "disp"):
            a, b = np.asarray(of[k]), np.asarray(ou[k])
            rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
            assert rel < 1e-5, (k, rel)

    def test_gradients_match(self, cls):
        """Backward through the fused formulation equals the naive one (the
        reformulation must not change training)."""
        rng = np.random.RandomState(2)
        imgs = tuple(
            jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32) for _ in range(3)
        )
        mf, mu = cls(fused=True, **TINY), cls(fused=False, **TINY)
        v = jax.jit(mf.init)(jax.random.PRNGKey(0), *imgs)

        def loss(variables, model):
            out = model.apply(variables, *imgs)
            return (
                out["flow"].mean()
                + out["disp"].mean()
                + (out["seg_logits"] ** 2).mean()
            )

        gf = jax.jit(lambda v: jax.grad(loss)(v, mf))(v)
        gu = jax.jit(lambda v: jax.grad(loss)(v, mu))(v)
        leaves_f = jax.tree.leaves(gf)
        leaves_u = jax.tree.leaves(gu)
        worst = 0.0
        for a, b in zip(leaves_f, leaves_u):
            a, b = np.asarray(a), np.asarray(b)
            denom = np.linalg.norm(b) + 1e-8
            worst = max(worst, float(np.linalg.norm(a - b) / denom))
        assert worst < 1e-4, worst


class TestSubpixelUpfeat:
    """upfeat_impl='subpixel' (models/common.py conv_transpose_subpixel):
    k4s2 SAME transposed conv as stride-1 conv + depth-to-space — same
    params, same math to fp-reassociation tolerance."""

    def test_op_matches_lax_conv_transpose(self):
        from cerberusnet_tpu.models.common import conv_transpose_subpixel

        rng = np.random.RandomState(0)
        for h, w, cin, cout in ((6, 5, 3, 2), (8, 8, 16, 2), (7, 9, 4, 3)):
            x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
            k = jnp.asarray(rng.randn(4, 4, cin, cout), jnp.float32)
            b = jnp.asarray(rng.randn(cout), jnp.float32)
            ref = jax.lax.conv_transpose(x, k, (2, 2), "SAME") + b
            got = conv_transpose_subpixel([x], k, b, jnp.float32)
            assert got.shape == ref.shape
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=2e-5
            )

    def test_op_distributes_over_components(self):
        from cerberusnet_tpu.models.common import conv_transpose_subpixel

        rng = np.random.RandomState(1)
        a = jnp.asarray(rng.randn(1, 6, 6, 3), jnp.float32)
        b_ = jnp.asarray(rng.randn(1, 6, 6, 5), jnp.float32)
        k = jnp.asarray(rng.randn(4, 4, 8, 2), jnp.float32)
        bias = jnp.asarray(rng.randn(2), jnp.float32)
        whole = conv_transpose_subpixel([jnp.concatenate([a, b_], -1)], k, bias, jnp.float32)
        split = conv_transpose_subpixel([a, b_], k, bias, jnp.float32)
        np.testing.assert_allclose(np.asarray(split), np.asarray(whole), atol=2e-5)

    def test_model_outputs_match_convt(self):
        rng = np.random.RandomState(3)
        imgs = tuple(
            jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32) for _ in range(3)
        )
        ms = CerberusNet(upfeat_impl="subpixel", **TINY)
        mc = CerberusNet(upfeat_impl="convt", **TINY)
        v = jax.jit(ms.init)(jax.random.PRNGKey(0), *imgs)
        vc = jax.jit(mc.init)(jax.random.PRNGKey(0), *imgs)
        _trees_equal(v, vc)  # same param tree either way
        os_ = jax.jit(ms.apply)(v, *imgs)
        oc = jax.jit(mc.apply)(v, *imgs)
        for k in ("seg_logits", "flow", "disp"):
            a, b = np.asarray(os_[k]), np.asarray(oc[k])
            rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
            assert rel < 1e-5, (k, rel)
