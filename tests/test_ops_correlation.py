"""Correlation op tests (SURVEY.md §5.1/§5.2).

Three layers of guarantees:
  1. Golden values: tiny tensors against a hand-written numpy loop that
     transcribes SURVEY.md §9.2/§9.2b literally (guards the 1/C normalization,
     channel ordering, and zero-pad out-of-bounds convention).
  2. Pallas-vs-oracle: the Pallas kernels (interpret mode on CPU) must match
     the pure-JAX implementation exactly in fp32, forward and VJP.
  3. Gradient checks: finite differences via jax.test_util.check_grads.
"""

import jax
import jax.test_util
import jax.numpy as jnp
import numpy as np
import pytest

from cerberusnet_tpu.ops.correlation import (
    _correlation1d_pure,
    _correlation2d_pure,
    correlation1d,
    correlation2d,
)
from cerberusnet_tpu.ops.pallas.correlation import (
    correlation1d_pallas,
    correlation2d_pallas,
)


def np_corr2d(f1, f2, d):
    """Literal numpy transcription of SURVEY.md §9.2."""
    b, h, w, c = f1.shape
    k = 2 * d + 1
    out = np.zeros((b, h, w, k * k), np.float32)
    for bi in range(b):
        for y in range(h):
            for x in range(w):
                for oy in range(-d, d + 1):
                    for ox in range(-d, d + 1):
                        yy, xx = y + oy, x + ox
                        if 0 <= yy < h and 0 <= xx < w:
                            v = np.dot(f1[bi, y, x], f2[bi, yy, xx]) / c
                            out[bi, y, x, (oy + d) * k + (ox + d)] = v
    return out


def np_corr1d(f1, f2, dmax):
    """Literal numpy transcription of SURVEY.md §9.2b."""
    b, h, w, c = f1.shape
    out = np.zeros((b, h, w, dmax + 1), np.float32)
    for bi in range(b):
        for y in range(h):
            for x in range(w):
                for k in range(dmax + 1):
                    if x - k >= 0:
                        out[bi, y, x, k] = np.dot(f1[bi, y, x], f2[bi, y, x - k]) / c
    return out


@pytest.fixture
def rng():
    return np.random.RandomState(0)


class TestCorrelation2D:
    def test_golden_vs_numpy(self, rng):
        f1 = rng.randn(2, 6, 7, 3).astype(np.float32)
        f2 = rng.randn(2, 6, 7, 3).astype(np.float32)
        got = correlation2d(jnp.asarray(f1), jnp.asarray(f2), max_disp=2, impl="pure")
        np.testing.assert_allclose(got, np_corr2d(f1, f2, 2), rtol=1e-5, atol=1e-5)

    def test_channel_ordering(self):
        # A single impulse in f2 at (y+1, x+2) must land in channel
        # (1+d)*(2d+1) + (2+d) with value 1/C.
        d = 4
        f1 = np.zeros((1, 12, 12, 2), np.float32)
        f2 = np.zeros_like(f1)
        f1[0, 5, 5] = [1.0, 1.0]
        f2[0, 6, 7] = [1.0, 1.0]
        out = np.asarray(correlation2d(jnp.asarray(f1), jnp.asarray(f2), d, impl="pure"))
        k = (1 + d) * (2 * d + 1) + (2 + d)
        assert out[0, 5, 5, k] == pytest.approx(1.0)  # 2 channels of 1*1, /2
        out2 = out.copy()
        out2[0, 5, 5, k] = 0.0
        assert np.all(out2 == 0.0)

    def test_pallas_matches_pure_fwd(self, rng):
        f1 = jnp.asarray(rng.randn(2, 12, 16, 8), jnp.float32)
        f2 = jnp.asarray(rng.randn(2, 12, 16, 8), jnp.float32)
        ref = _correlation2d_pure(f1, f2, 4)
        got = correlation2d_pallas(f1, f2, 4)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_pallas_matches_pure_vjp(self, rng):
        f1 = jnp.asarray(rng.randn(1, 10, 11, 5), jnp.float32)
        f2 = jnp.asarray(rng.randn(1, 10, 11, 5), jnp.float32)
        ct = jnp.asarray(rng.randn(1, 10, 11, 81), jnp.float32)

        _, vjp_ref = jax.vjp(lambda a, b: _correlation2d_pure(a, b, 4), f1, f2)
        _, vjp_pal = jax.vjp(lambda a, b: correlation2d_pallas(a, b, 4), f1, f2)
        for r, p in zip(vjp_ref(ct), vjp_pal(ct)):
            np.testing.assert_allclose(p, r, rtol=1e-4, atol=1e-5)

    def test_pallas_grad_check(self, rng):
        f1 = jnp.asarray(rng.randn(1, 8, 9, 3), jnp.float32)
        f2 = jnp.asarray(rng.randn(1, 8, 9, 3), jnp.float32)
        jax.test_util.check_grads(
            lambda a, b: correlation2d_pallas(a, b, 2),
            (f1, f2), order=1, modes=["rev"], atol=1e-2, rtol=1e-2,
        )

    def test_bf16_inputs_fp32_accumulation(self, rng):
        f1 = rng.randn(1, 8, 8, 64).astype(np.float32)
        f2 = rng.randn(1, 8, 8, 64).astype(np.float32)
        ref = np.asarray(correlation2d(jnp.asarray(f1), jnp.asarray(f2), 2, impl="pure"))
        got = correlation2d_pallas(
            jnp.asarray(f1, jnp.bfloat16), jnp.asarray(f2, jnp.bfloat16), 2
        )
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), ref, rtol=0.05, atol=0.05
        )

    def test_odd_height_padding(self, rng):
        # H not a multiple of the row tile exercises the host-side padding.
        f1 = jnp.asarray(rng.randn(1, 13, 10, 4), jnp.float32)
        f2 = jnp.asarray(rng.randn(1, 13, 10, 4), jnp.float32)
        ref = _correlation2d_pure(f1, f2, 3)
        got = correlation2d_pallas(f1, f2, 3)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


class TestCorrelation1D:
    def test_golden_vs_numpy(self, rng):
        f1 = rng.randn(2, 5, 9, 3).astype(np.float32)
        f2 = rng.randn(2, 5, 9, 3).astype(np.float32)
        got = correlation1d(jnp.asarray(f1), jnp.asarray(f2), max_disp=4, impl="pure")
        np.testing.assert_allclose(got, np_corr1d(f1, f2, 4), rtol=1e-5, atol=1e-5)

    def test_direction(self):
        # corr(x, k) correlates with f2 at x - k (rightward-looking stereo).
        f1 = np.zeros((1, 4, 8, 1), np.float32)
        f2 = np.zeros_like(f1)
        f1[0, 2, 5] = 1.0
        f2[0, 2, 3] = 1.0
        out = np.asarray(correlation1d(jnp.asarray(f1), jnp.asarray(f2), 4, impl="pure"))
        assert out[0, 2, 5, 2] == pytest.approx(1.0)

    def test_pallas_matches_pure_fwd(self, rng):
        f1 = jnp.asarray(rng.randn(2, 11, 20, 8), jnp.float32)
        f2 = jnp.asarray(rng.randn(2, 11, 20, 8), jnp.float32)
        ref = _correlation1d_pure(f1, f2, 6)
        got = correlation1d_pallas(f1, f2, 6)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_pallas_matches_pure_vjp(self, rng):
        f1 = jnp.asarray(rng.randn(1, 9, 14, 5), jnp.float32)
        f2 = jnp.asarray(rng.randn(1, 9, 14, 5), jnp.float32)
        ct = jnp.asarray(rng.randn(1, 9, 14, 7), jnp.float32)
        _, vjp_ref = jax.vjp(lambda a, b: _correlation1d_pure(a, b, 6), f1, f2)
        _, vjp_pal = jax.vjp(lambda a, b: correlation1d_pallas(a, b, 6), f1, f2)
        for r, p in zip(vjp_ref(ct), vjp_pal(ct)):
            np.testing.assert_allclose(p, r, rtol=1e-4, atol=1e-5)

    def test_pallas_grad_check(self, rng):
        f1 = jnp.asarray(rng.randn(1, 6, 10, 3), jnp.float32)
        f2 = jnp.asarray(rng.randn(1, 6, 10, 3), jnp.float32)
        jax.test_util.check_grads(
            lambda a, b: correlation1d_pallas(a, b, 4),
            (f1, f2), order=1, modes=["rev"], atol=1e-2, rtol=1e-2,
        )


class TestCorrelationWL:
    """v2 W-in-lanes Pallas kernels (ops/pallas/correlation.py): forward vs
    the pure oracle (interpret mode on CPU), dilation support, and the
    custom-vjp backward (== pure autodiff)."""

    def test_2d_matches_pure(self, rng):
        from cerberusnet_tpu.ops.pallas.correlation import correlation2d_wl

        f1 = jnp.asarray(rng.randn(2, 13, 27, 9), jnp.float32)
        f2 = jnp.asarray(rng.randn(2, 13, 27, 9), jnp.float32)
        ref = correlation2d(f1, f2, max_disp=4, impl="pure")
        out = correlation2d_wl(f1, f2, 4, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_2d_dilated_matches_pure(self, rng):
        from cerberusnet_tpu.ops.pallas.correlation import correlation2d_wl

        f1 = jnp.asarray(rng.randn(1, 40, 52, 7), jnp.float32)
        f2 = jnp.asarray(rng.randn(1, 40, 52, 7), jnp.float32)
        for dil in (2, 4):
            ref = correlation2d(f1, f2, max_disp=3, impl="pure", dilation=dil)
            out = correlation2d_wl(f1, f2, 3, True, dil)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)

    def test_1d_matches_pure(self, rng):
        from cerberusnet_tpu.ops.pallas.correlation import correlation1d_wl

        f1 = jnp.asarray(rng.randn(2, 11, 33, 6), jnp.float32)
        f2 = jnp.asarray(rng.randn(2, 11, 33, 6), jnp.float32)
        ref = correlation1d(f1, f2, max_disp=6, impl="pure")
        out = correlation1d_wl(f1, f2, 6, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_2d_grads_match_pure(self, rng):
        from cerberusnet_tpu.ops.pallas.correlation import correlation2d_wl

        f1 = jnp.asarray(rng.randn(1, 9, 14, 5), jnp.float32)
        f2 = jnp.asarray(rng.randn(1, 9, 14, 5), jnp.float32)
        g_wl = jax.grad(
            lambda a, b: (correlation2d_wl(a, b, 2, True) ** 2).sum(),
            argnums=(0, 1),
        )(f1, f2)
        g_pure = jax.grad(
            lambda a, b: (correlation2d(a, b, 2, impl="pure") ** 2).sum(),
            argnums=(0, 1),
        )(f1, f2)
        for a, b in zip(g_wl, g_pure):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_dispatch_accepts_wl(self, rng):
        f1 = jnp.asarray(rng.randn(1, 8, 16, 4), jnp.float32)
        f2 = jnp.asarray(rng.randn(1, 8, 16, 4), jnp.float32)
        ref = correlation2d(f1, f2, max_disp=2, impl="pure")
        out = correlation2d(f1, f2, max_disp=2, impl="pallas_wl")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestCorrelationPurev:
    """vmapped-displacement formulation (impl='purev'): one batched
    dynamic-slice + one multiply-reduce instead of a per-displacement op
    chain. Values match 'pure' up to f32 reduction-order rounding."""

    def test_2d_matches_pure(self, rng):
        f1 = jnp.asarray(rng.randn(2, 13, 27, 9), jnp.float32)
        f2 = jnp.asarray(rng.randn(2, 13, 27, 9), jnp.float32)
        ref = correlation2d(f1, f2, max_disp=4, impl="pure")
        out = correlation2d(f1, f2, max_disp=4, impl="purev")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_2d_dilated_matches_pure(self, rng):
        f1 = jnp.asarray(rng.randn(1, 20, 26, 7), jnp.float32)
        f2 = jnp.asarray(rng.randn(1, 20, 26, 7), jnp.float32)
        for dil in (2, 4):
            ref = correlation2d(f1, f2, max_disp=3, impl="pure", dilation=dil)
            out = correlation2d(f1, f2, max_disp=3, impl="purev", dilation=dil)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)

    def test_1d_matches_pure(self, rng):
        f1 = jnp.asarray(rng.randn(2, 11, 33, 6), jnp.float32)
        f2 = jnp.asarray(rng.randn(2, 11, 33, 6), jnp.float32)
        ref = correlation1d(f1, f2, max_disp=6, impl="pure")
        out = correlation1d(f1, f2, max_disp=6, impl="purev")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_2d_grads_match_pure(self, rng):
        f1 = jnp.asarray(rng.randn(1, 9, 14, 5), jnp.float32)
        f2 = jnp.asarray(rng.randn(1, 9, 14, 5), jnp.float32)
        g_v = jax.grad(
            lambda a, b: (correlation2d(a, b, 2, impl="purev") ** 2).sum(),
            argnums=(0, 1),
        )(f1, f2)
        g_pure = jax.grad(
            lambda a, b: (correlation2d(a, b, 2, impl="pure") ** 2).sum(),
            argnums=(0, 1),
        )(f1, f2)
        for a, b in zip(g_v, g_pure):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_bf16_dtype_and_shape(self, rng):
        f1 = jnp.asarray(rng.randn(1, 8, 16, 4), jnp.bfloat16)
        f2 = jnp.asarray(rng.randn(1, 8, 16, 4), jnp.bfloat16)
        out = correlation2d(f1, f2, max_disp=2, impl="purev")
        assert out.dtype == jnp.bfloat16 and out.shape == (1, 8, 16, 25)
