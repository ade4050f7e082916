"""Device-side augmentation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberusnet_tpu.data.augment import AugmentConfig, augment_batch


def make_batch(stereo=True, b=2, h=16, w=24):
    rng = np.random.RandomState(0)
    batch = {
        "left": jnp.asarray(rng.randint(0, 255, (b, h, w, 3)), jnp.uint8),
        "temporal": jnp.asarray(rng.randint(0, 255, (b, h, w, 3)), jnp.uint8),
        "seg_labels": jnp.asarray(rng.randint(0, 19, (b, h, w)), jnp.uint8),
        "flow_gt": jnp.asarray(rng.randn(b, h, w, 2), jnp.float32),
        "flow_valid": jnp.ones((b, h, w), jnp.float32),
    }
    if stereo:
        batch["right"] = jnp.asarray(rng.randint(0, 255, (b, h, w, 3)), jnp.uint8)
        batch["disp_gt"] = jnp.asarray(rng.rand(b, h, w) * 10, jnp.float32)
        batch["disp_valid"] = jnp.ones((b, h, w), jnp.float32)
    return batch


class TestAugment:
    def test_crop_shapes(self):
        batch = make_batch()
        cfg = AugmentConfig(crop_hw=(8, 12))
        out = augment_batch(batch, jax.random.PRNGKey(0), cfg)
        assert out["left"].shape == (2, 8, 12, 3)
        assert out["seg_labels"].shape == (2, 8, 12)
        assert out["flow_gt"].shape == (2, 8, 12, 2)
        assert out["disp_gt"].shape == (2, 8, 12)

    def test_flip_negates_u_and_flips_content(self):
        batch = make_batch(stereo=False)
        cfg = AugmentConfig(flip_lr_prob=1.0)
        out = augment_batch(batch, jax.random.PRNGKey(0), cfg)
        np.testing.assert_array_equal(
            np.asarray(out["left"]), np.asarray(batch["left"])[:, :, ::-1]
        )
        np.testing.assert_allclose(
            np.asarray(out["flow_gt"][..., 0]),
            -np.asarray(batch["flow_gt"][..., 0])[:, :, ::-1],
        )
        np.testing.assert_allclose(
            np.asarray(out["flow_gt"][..., 1]),
            np.asarray(batch["flow_gt"][..., 1])[:, :, ::-1],
        )

    def test_flip_skipped_for_stereo(self):
        batch = make_batch(stereo=True)
        cfg = AugmentConfig(flip_lr_prob=1.0)
        out = augment_batch(batch, jax.random.PRNGKey(0), cfg)
        np.testing.assert_array_equal(np.asarray(out["left"]), np.asarray(batch["left"]))

    def test_color_jitter_bounded_images_only(self):
        batch = make_batch()
        cfg = AugmentConfig(brightness=0.2, contrast=0.2)
        out = augment_batch(batch, jax.random.PRNGKey(3), cfg)
        assert out["left"].dtype == jnp.uint8
        assert int(out["left"].max()) <= 255
        np.testing.assert_array_equal(
            np.asarray(out["flow_gt"]), np.asarray(batch["flow_gt"])
        )
        assert not np.array_equal(np.asarray(out["left"]), np.asarray(batch["left"]))

    def test_deterministic_with_key(self):
        batch = make_batch()
        cfg = AugmentConfig(crop_hw=(8, 12), brightness=0.1)
        a = augment_batch(batch, jax.random.PRNGKey(7), cfg)
        b = augment_batch(batch, jax.random.PRNGKey(7), cfg)
        np.testing.assert_array_equal(np.asarray(a["left"]), np.asarray(b["left"]))

    def test_disabled_passthrough(self):
        cfg = AugmentConfig()
        assert not cfg.enabled


class TestScaleAugment:
    """Random-zoom augmentation (AugmentConfig.scales): discrete scale set,
    static-shape branches under lax.switch, GT values rescale with the zoom
    (flow by (sx, sy), disparity by sx)."""

    def test_output_shapes_fixed_across_scales(self):
        batch = make_batch(h=32, w=48)
        cfg = AugmentConfig(crop_hw=(16, 24), scales=(0.75, 1.0, 1.5))
        for seed in range(6):  # several keys -> several branches taken
            out = augment_batch(batch, jax.random.PRNGKey(seed), cfg)
            assert out["left"].shape == (2, 16, 24, 3)
            assert out["seg_labels"].shape == (2, 16, 24)
            assert out["flow_gt"].shape == (2, 16, 24, 2)
            assert out["disp_gt"].shape == (2, 16, 24)
            assert out["left"].dtype == jnp.uint8

    def test_flow_and_disp_values_scale_with_zoom(self):
        b, h, w = 2, 32, 48
        batch = make_batch(b=b, h=h, w=w)
        # constant fields: the zoom ratio is read straight off the values
        batch["flow_gt"] = jnp.full((b, h, w, 2), 4.0, jnp.float32)
        batch["disp_gt"] = jnp.full((b, h, w), 8.0, jnp.float32)
        ch, cw = 16, 24
        for s in (0.75, 1.5):
            cfg = AugmentConfig(crop_hw=(ch, cw), scales=(s,))
            out = augment_batch(batch, jax.random.PRNGKey(0), cfg)
            sh = min(max(int(round(ch / s)), 1), h)
            sw = min(max(int(round(cw / s)), 1), w)
            sx, sy = cw / sw, ch / sh
            np.testing.assert_allclose(
                np.asarray(out["flow_gt"][..., 0]), 4.0 * sx, rtol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(out["flow_gt"][..., 1]), 4.0 * sy, rtol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(out["disp_gt"]), 8.0 * sx, rtol=1e-5
            )

    def test_labels_stay_in_class_set(self):
        batch = make_batch(h=32, w=48)
        cfg = AugmentConfig(crop_hw=(16, 24), scales=(0.6, 1.3))
        out = augment_batch(batch, jax.random.PRNGKey(3), cfg)
        orig = set(np.unique(np.asarray(batch["seg_labels"])))
        new = set(np.unique(np.asarray(out["seg_labels"])))
        assert new <= orig  # nearest resize invents no classes

    def test_scale_one_equals_identity_zoom(self):
        """scales=(1.0,) must reduce to a plain crop (values untouched)."""
        batch = make_batch(h=32, w=48)
        cfg = AugmentConfig(crop_hw=(32, 48), scales=(1.0,))
        out = augment_batch(batch, jax.random.PRNGKey(1), cfg)
        # full-size crop at scale 1: everything passes through unchanged
        np.testing.assert_array_equal(
            np.asarray(out["flow_gt"]), np.asarray(batch["flow_gt"])
        )
        np.testing.assert_array_equal(
            np.asarray(out["left"]), np.asarray(batch["left"])
        )
