"""Bilinear warp op tests (SURVEY.md §5.1/§5.2, semantics §9.3)."""

import jax
import jax.test_util
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.ndimage import map_coordinates

from cerberusnet_tpu.ops.warp import warp1d, warp2d


@pytest.fixture
def rng():
    return np.random.RandomState(1)


def warp_via_map_coordinates(f, flow):
    """Independent oracle: jax.scipy map_coordinates, order=1, zero padding."""
    b, h, w, c = f.shape
    ys = np.arange(h)[:, None] + np.zeros((h, w))
    xs = np.arange(w)[None, :] + np.zeros((h, w))
    out = np.zeros_like(f)
    for bi in range(b):
        cy = ys + flow[bi, :, :, 1]
        cx = xs + flow[bi, :, :, 0]
        for ci in range(c):
            out[bi, :, :, ci] = np.asarray(
                map_coordinates(
                    jnp.asarray(f[bi, :, :, ci]),
                    [jnp.asarray(cy), jnp.asarray(cx)],
                    order=1,
                    mode="constant",
                    cval=0.0,
                )
            )
    return out


class TestWarp2D:
    def test_zero_flow_is_identity(self, rng):
        f = jnp.asarray(rng.randn(2, 6, 7, 3), jnp.float32)
        flow = jnp.zeros((2, 6, 7, 2), jnp.float32)
        np.testing.assert_allclose(warp2d(f, flow), f, rtol=1e-6, atol=1e-6)

    def test_integer_shift(self, rng):
        # flow = (+2, +1) everywhere: out(y, x) = f(y + 1, x + 2).
        f = rng.randn(1, 8, 9, 2).astype(np.float32)
        flow = np.zeros((1, 8, 9, 2), np.float32)
        flow[..., 0] = 2.0
        flow[..., 1] = 1.0
        out = np.asarray(warp2d(jnp.asarray(f), jnp.asarray(flow)))
        np.testing.assert_allclose(out[0, :7, :7], f[0, 1:8, 2:9], rtol=1e-6)
        # out-of-frame sources are zero
        assert np.all(out[0, 7, :] == 0.0)
        assert np.all(out[0, :, 7:] == 0.0)

    def test_half_pixel_average(self):
        f = np.zeros((1, 4, 4, 1), np.float32)
        f[0, 1, 1] = 4.0
        f[0, 1, 2] = 8.0
        flow = np.zeros((1, 4, 4, 2), np.float32)
        flow[..., 0] = 0.5
        out = np.asarray(warp2d(jnp.asarray(f), jnp.asarray(flow)))
        assert out[0, 1, 1, 0] == pytest.approx(6.0)  # (4+8)/2

    def test_matches_map_coordinates(self, rng):
        f = rng.randn(2, 10, 12, 3).astype(np.float32)
        flow = (rng.randn(2, 10, 12, 2) * 3).astype(np.float32)
        got = np.asarray(warp2d(jnp.asarray(f), jnp.asarray(flow)))
        ref = warp_via_map_coordinates(f, flow)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_gradients(self, rng):
        f = jnp.asarray(rng.randn(1, 6, 7, 2), jnp.float32)
        # keep flow away from integer lattice points where bilinear is kinked
        flow = jnp.asarray(rng.rand(1, 6, 7, 2) * 1.5 + 0.25, jnp.float32)
        jax.test_util.check_grads(
            warp2d, (f, flow), order=1, modes=["rev"], atol=1e-2, rtol=1e-2
        )

    def test_bf16(self, rng):
        f = rng.randn(1, 8, 8, 4).astype(np.float32)
        flow = (rng.randn(1, 8, 8, 2)).astype(np.float32)
        ref = np.asarray(warp2d(jnp.asarray(f), jnp.asarray(flow)))
        got = warp2d(jnp.asarray(f, jnp.bfloat16), jnp.asarray(flow, jnp.bfloat16))
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32), ref, atol=0.1)


class TestWarp1D:
    def test_disparity_samples_left(self):
        # positive disparity d at x means out(x) = f(x - d)
        f = np.zeros((1, 3, 8, 1), np.float32)
        f[0, 1, 2] = 5.0
        disp = np.full((1, 3, 8, 1), 3.0, np.float32)
        out = np.asarray(warp1d(jnp.asarray(f), jnp.asarray(disp)))
        assert out[0, 1, 5, 0] == pytest.approx(5.0)

    def test_accepts_3d_disp(self, rng):
        f = jnp.asarray(rng.randn(1, 5, 6, 2), jnp.float32)
        disp = jnp.asarray(rng.rand(1, 5, 6), jnp.float32)
        a = warp1d(f, disp)
        b = warp1d(f, disp[..., None])
        np.testing.assert_allclose(a, b)
