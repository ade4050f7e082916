"""Fused Pallas encoder-level kernel vs the plain-XLA oracle.

SURVEY.md §5 item 1 (kernel unit tests vs a pure-JAX reference) applied to
the round-4 encoder fusion (ops/pallas/encoder_level.py): forward equality
on single- and multi-tile shapes, gradient equality (the custom VJP must be
bit-equal to the XLA backward it delegates to), and param-tree/forward
equality of PyramidEncoder/CerberusNet with pallas_levels set.

Runs in interpreter mode on CPU (conftest pins the backend; the kernel
defaults to interpret=True off-TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberusnet_tpu.ops.pallas.encoder_level import (
    encoder_level,
    encoder_level_xla,
)


def _mk(key, b, h, w, c, f, dtype=jnp.float32):
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (b, h, w, c), dtype)
    k1 = jax.random.normal(ks[1], (3, 3, c, f), jnp.float32) * 0.2
    b1 = jax.random.normal(ks[2], (f,), jnp.float32) * 0.1
    k2 = jax.random.normal(ks[3], (3, 3, f, f), jnp.float32) * 0.2
    b2 = jax.random.normal(ks[4], (f,), jnp.float32) * 0.1
    k3 = jax.random.normal(ks[5], (3, 3, f, f), jnp.float32) * 0.2
    b3 = jax.random.normal(ks[6], (f,), jnp.float32) * 0.1
    return x, (k1, b1, k2, b2, k3, b3)


class TestEncoderLevelKernel:
    @pytest.mark.parametrize(
        "b,h,w,c,f",
        [
            (1, 8, 16, 3, 8),    # single tile (H/2 = 4 rows)
            (1, 16, 32, 3, 8),   # single tile, wider
            (2, 64, 32, 3, 8),   # multi-tile (H/2=32, T=32 -> 1; covers B)
            (1, 128, 32, 8, 8),  # multi-tile (H/2=64 -> 2 tiles of 32)
            (1, 72, 16, 3, 8),   # H/2=36 -> T=4, 9 tiles (border cases)
        ],
    )
    def test_forward_matches_xla(self, b, h, w, c, f):
        x, kb = _mk(jax.random.PRNGKey(0), b, h, w, c, f)
        ref = encoder_level_xla(x, *kb)
        out = jax.jit(lambda x, *kb: encoder_level(x, *kb))(x, *kb)
        assert out.shape == ref.shape == (b, h // 2, w // 2, f)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    def test_forward_bf16(self):
        x, kb = _mk(jax.random.PRNGKey(1), 1, 32, 32, 3, 8, jnp.bfloat16)
        kb = tuple(v.astype(jnp.bfloat16) for v in kb)
        ref = encoder_level_xla(x, *kb)
        out = jax.jit(lambda x, *kb: encoder_level(x, *kb))(x, *kb)
        np.testing.assert_allclose(
            out.astype(np.float32), ref.astype(np.float32), rtol=0.1, atol=0.1
        )

    def test_gradients_match_xla(self):
        x, kb = _mk(jax.random.PRNGKey(2), 1, 32, 16, 3, 8)

        def loss_p(x, *kb):
            y = encoder_level(x, *kb)
            return (y * jnp.arange(y.size).reshape(y.shape)).sum()

        def loss_x(x, *kb):
            y = encoder_level_xla(x, *kb)
            return (y * jnp.arange(y.size).reshape(y.shape)).sum()

        gp = jax.grad(loss_p, argnums=tuple(range(7)))(x, *kb)
        gx = jax.grad(loss_x, argnums=tuple(range(7)))(x, *kb)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize(
        "b,h,w,c,f",
        [
            (1, 8, 16, 3, 8),    # single tile
            (1, 64, 32, 3, 8),   # multi-tile borders
            (2, 128, 32, 8, 8),  # batch + 2 tiles of 32
        ],
    )
    def test_pallas_backward_matches_xla(self, b, h, w, c, f):
        """The fused reverse-sweep kernel (grad='pallas') vs XLA grads."""
        x, kb = _mk(jax.random.PRNGKey(5), b, h, w, c, f)

        def loss(fn):
            def go(x, *kb):
                y = fn(x, *kb)
                return (y * jnp.cos(jnp.arange(y.size).reshape(y.shape))).sum()
            return go

        gp = jax.grad(
            loss(lambda *a: encoder_level(*a, grad="pallas")),
            argnums=tuple(range(7)),
        )(x, *kb)
        gx = jax.grad(loss(encoder_level_xla), argnums=tuple(range(7)))(x, *kb)
        names = ["dx", "dk1", "db1", "dk2", "db2", "dk3", "db3"]
        for n, a, b_ in zip(names, gp, gx):
            np.testing.assert_allclose(
                a, b_, rtol=2e-4, atol=2e-4, err_msg=n
            )

    def test_odd_shapes_rejected(self):
        x, kb = _mk(jax.random.PRNGKey(3), 1, 9, 16, 3, 8)
        with pytest.raises(ValueError, match="H%2"):
            encoder_level(x, *kb)
        x, kb = _mk(jax.random.PRNGKey(4), 1, 16, 18, 3, 8)
        with pytest.raises(ValueError, match="H%2"):
            encoder_level(x, *kb)


class TestPyramidEncoderPallas:
    def test_param_tree_and_forward_identical(self):
        from cerberusnet_tpu.models.encoder import PyramidEncoder

        chans = (8, 12, 16, 16, 16, 16)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
        base = PyramidEncoder(chans)
        pal = PyramidEncoder(chans, pallas_levels=2)
        v = jax.jit(base.init)(jax.random.PRNGKey(1), x)
        vp = jax.jit(pal.init)(jax.random.PRNGKey(1), x)
        assert jax.tree.structure(v) == jax.tree.structure(vp)
        for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(vp)):
            assert a.shape == b.shape
            np.testing.assert_array_equal(a, b)
        f0 = jax.jit(base.apply)(v, x)
        f1 = jax.jit(pal.apply)(v, x)
        for a, b in zip(f0, f1):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)

    def test_mutually_exclusive_with_s2d(self):
        from cerberusnet_tpu.models.encoder import PyramidEncoder

        x = jnp.zeros((1, 64, 64, 3))
        enc = PyramidEncoder((8, 12, 16, 16, 16, 16), pallas_levels=1,
                             s2d_levels=1)
        with pytest.raises(ValueError, match="mutually exclusive"):
            enc.init(jax.random.PRNGKey(0), x)

    def test_cerberus_forward_identical(self):
        from cerberusnet_tpu.models import CerberusNet

        kw = dict(
            encoder_channels=(8, 12, 16, 16, 16, 16),
            est_channels=(16, 16, 12),
            ctx_channels=(16, 16),
            fpn_channels=16,
        )
        imgs = tuple(
            jax.random.normal(jax.random.PRNGKey(i), (1, 64, 64, 3))
            for i in range(3)
        )
        base = CerberusNet(**kw)
        pal = CerberusNet(pallas_levels=2, **kw)
        v = jax.jit(base.init)(jax.random.PRNGKey(0), *imgs)
        o0 = jax.jit(base.apply)(v, *imgs)
        o1 = jax.jit(pal.apply)(v, *imgs)
        for key in ("flow", "disp", "seg_logits"):
            np.testing.assert_allclose(
                o0[key], o1[key], rtol=2e-4, atol=2e-4
            )
