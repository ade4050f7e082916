"""Model shape/jit/finiteness tests (SURVEY.md §5.3).

Uses a narrow-width model variant so CPU compiles stay fast; full-width
shapes are exercised on real hardware by bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberusnet_tpu.models import (
    CerberusNet,
    FlowNet,
    SegNet,
    StereoNet,
)

H, W = 64, 64  # divisible by 2^6

TINY = dict(
    encoder_channels=(8, 12, 16, 16, 16, 16),
    est_channels=(16, 16, 12),
    ctx_channels=(16, 16),
)


@pytest.fixture(scope="module")
def images():
    rng = np.random.RandomState(0)
    return tuple(jnp.asarray(rng.rand(1, H, W, 3), jnp.float32) for _ in range(3))


class TestCerberusNet:
    @pytest.fixture(scope="class")
    def model_and_vars(self, images):
        model = CerberusNet(corr_impl="pure", fpn_channels=16, **TINY)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), *images)
        return model, variables

    def test_output_shapes(self, model_and_vars, images):
        model, variables = model_and_vars
        out = jax.jit(model.apply)(variables, *images)
        assert out["seg_logits"].shape == (1, H, W, 19)
        assert out["flow"].shape == (1, H, W, 2)
        assert out["disp"].shape == (1, H, W, 1)
        assert set(out["flow_pyramid"]) == {2, 3, 4, 5, 6}
        assert out["flow_pyramid"][2].shape == (1, H // 4, W // 4, 2)
        assert out["disp_pyramid"][6].shape == (1, H // 64, W // 64, 1)
        for k in ("seg_logits", "flow", "disp"):
            assert bool(jnp.all(jnp.isfinite(out[k]))), k

    def test_jit_deterministic(self, model_and_vars, images):
        # Eager-vs-jit equivalence is covered per-op (test_ops_*); eager
        # dispatch of the full model is impractically slow in this
        # environment, so at model level we assert jit determinism.
        model, variables = model_and_vars
        a = jax.jit(model.apply)(variables, *images)
        b = jax.jit(model.apply)(variables, *images)
        np.testing.assert_array_equal(np.asarray(a["flow"]), np.asarray(b["flow"]))
        np.testing.assert_array_equal(
            np.asarray(a["seg_logits"]), np.asarray(b["seg_logits"])
        )

    def test_bf16_forward(self, images):
        model = CerberusNet(
            corr_impl="pure", fpn_channels=16, dtype=jnp.bfloat16, **TINY
        )
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), *images)
        out = jax.jit(model.apply)(variables, *images)
        # logits/flow/disp are promoted back to f32 at the head outputs
        assert out["seg_logits"].dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(out["seg_logits"])))


class TestSingleTaskBaselines:
    def test_segnet(self, images):
        model = SegNet(
            encoder_channels=TINY["encoder_channels"], num_classes=19, fpn_channels=16
        )
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[0])
        out = jax.jit(model.apply)(variables, images[0])
        assert out.shape == (1, H, W, 19)

    def test_flownet(self, images):
        model = FlowNet(corr_impl="pure", **TINY)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[0], images[1])
        out = jax.jit(model.apply)(variables, images[0], images[1])
        assert out["flow"].shape == (1, H, W, 2)

    def test_stereonet(self, images):
        model = StereoNet(corr_impl="pure", **TINY)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[0], images[1])
        out = jax.jit(model.apply)(variables, images[0], images[1])
        assert out["disp"].shape == (1, H, W, 1)
