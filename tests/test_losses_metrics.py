"""Loss and metric tests (SURVEY.md §5.5): hand-built confusion cases,
known flows, ignore-index / valid-mask handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberusnet_tpu.train import losses, metrics


class TestSegmentationLoss:
    def test_perfect_prediction_low_loss(self):
        labels = jnp.zeros((1, 4, 4), jnp.int32)
        logits = jnp.zeros((1, 4, 4, 3)).at[..., 0].set(20.0)
        assert float(losses.segmentation_loss(logits, labels)) < 1e-6

    def test_ignore_index_masks(self):
        labels = jnp.full((1, 4, 4), 255, jnp.int32)
        logits = jnp.asarray(np.random.randn(1, 4, 4, 3), jnp.float32)
        assert float(losses.segmentation_loss(logits, labels)) == 0.0

    def test_uniform_logits_log_c(self):
        labels = jnp.zeros((1, 8, 8), jnp.int32)
        logits = jnp.zeros((1, 8, 8, 19))
        np.testing.assert_allclose(
            float(losses.segmentation_loss(logits, labels)), np.log(19), rtol=1e-5
        )

    def test_focal_downweights_easy(self):
        labels = jnp.zeros((1, 4, 4), jnp.int32)
        logits = jnp.zeros((1, 4, 4, 3)).at[..., 0].set(3.0)
        plain = float(losses.segmentation_loss(logits, labels))
        focal = float(losses.segmentation_loss(logits, labels, focal_gamma=2.0))
        assert focal < plain


class TestRMILoss:
    """Region Mutual Information seg loss (SURVEY.md §3 C11 RMI variant):
    region-level statistics, so correct-but-misregioned predictions cost
    more than pixel CE alone would say."""

    def _case(self, seed=0, h=32, w=32, c=5):
        rng = np.random.RandomState(seed)
        labels = jnp.asarray(rng.randint(0, c, (2, h, w)), jnp.int32)
        return labels, c

    def test_confident_correct_beats_random(self):
        labels, c = self._case()
        good = 20.0 * jax.nn.one_hot(labels, c)
        rng = np.random.RandomState(1)
        bad = jnp.asarray(rng.randn(2, 32, 32, c), jnp.float32)
        lg = float(losses.rmi_loss(good, labels, pool_stride=2))
        lb = float(losses.rmi_loss(bad, labels, pool_stride=2))
        assert np.isfinite(lg) and np.isfinite(lb)
        assert lg < lb

    def test_gradients_finite_and_nonzero(self):
        labels, c = self._case(seed=2)
        logits = jnp.asarray(np.random.RandomState(3).randn(2, 32, 32, c), jnp.float32)
        g = jax.grad(lambda lg: losses.rmi_loss(lg, labels, pool_stride=2))(logits)
        g = np.asarray(g)
        assert np.all(np.isfinite(g))
        assert np.abs(g).max() > 0

    def test_all_ignored_is_finite(self):
        labels = jnp.full((1, 16, 16), 255, jnp.int32)
        logits = jnp.asarray(np.random.RandomState(4).randn(1, 16, 16, 4), jnp.float32)
        val = float(losses.rmi_loss(logits, labels, pool_stride=2))
        assert np.isfinite(val)

    def test_joint_loss_mixes_rmi(self):
        labels, c = self._case(seed=5, h=16, w=16, c=4)
        logits = jnp.asarray(np.random.RandomState(6).randn(2, 16, 16, c), jnp.float32)
        outputs = {"seg_logits": logits}
        batch = {"seg_labels": labels}
        _, plain = losses.joint_loss(outputs, batch)
        _, mixed = losses.joint_loss(outputs, batch, rmi_weight=0.5)
        assert "rmi" in mixed and "rmi" not in plain
        expected = 0.5 * float(plain["seg"]) + 0.5 * float(mixed["rmi"])
        np.testing.assert_allclose(float(mixed["seg"]), expected, rtol=1e-5)

    def test_jittable(self):
        labels, c = self._case(seed=7, h=16, w=16, c=4)
        logits = jnp.asarray(np.random.RandomState(8).randn(2, 16, 16, c), jnp.float32)
        f = jax.jit(lambda lg: losses.rmi_loss(lg, labels, pool_stride=2))
        np.testing.assert_allclose(
            float(f(logits)),
            float(losses.rmi_loss(logits, labels, pool_stride=2)),
            rtol=1e-5,
        )


class TestFlowLoss:
    def test_zero_for_perfect(self):
        gt = jnp.ones((1, 16, 16, 2), jnp.float32) * 8.0
        pyramid = {
            l: jnp.ones((1, 16 >> l, 16 >> l, 2), jnp.float32) * (8.0 / 2**l)
            for l in (2, 3, 4)
        }
        loss = losses.multiscale_flow_loss(pyramid, gt)
        assert float(loss) < 1e-4

    def test_level_value_scaling(self):
        # constant GT of 4 px at full res must become 1 px at level 2
        gt = jnp.full((1, 8, 8, 2), 4.0)
        valid = jnp.ones((1, 8, 8))
        gt_l, valid_l = losses.downsample_gt(gt, valid, 2, scale_values=True)
        np.testing.assert_allclose(gt_l, 1.0)
        np.testing.assert_allclose(valid_l, 1.0)

    def test_sparse_valid_pooling(self):
        gt = jnp.zeros((1, 4, 4, 1)).at[0, 1, 1, 0].set(8.0)
        valid = jnp.zeros((1, 4, 4)).at[0, 1, 1].set(1.0)
        gt_l, valid_l = losses.downsample_gt(gt, valid, 2, scale_values=True)
        # the single valid pixel dominates its cell mean: 8/4 (value scale)
        assert gt_l.shape == (1, 1, 1, 1)
        np.testing.assert_allclose(float(gt_l[0, 0, 0, 0]), 2.0)
        np.testing.assert_allclose(valid_l, 1.0)

    def test_robust_variant_differs(self):
        rng = np.random.RandomState(0)
        gt = jnp.asarray(rng.randn(1, 8, 8, 2), jnp.float32)
        pyr = {2: jnp.asarray(rng.randn(1, 2, 2, 2), jnp.float32)}
        a = float(losses.multiscale_flow_loss(pyr, gt))
        b = float(losses.multiscale_flow_loss(pyr, gt, robust_q=0.4))
        assert a != b and np.isfinite(a) and np.isfinite(b)


class TestBerhu:
    def test_small_errors_are_l1(self):
        pred = jnp.asarray([[0.0, 1.0]])
        gt = jnp.asarray([[0.0, 0.0]])
        # errors: 0, 1 -> c = 0.2; first is 0, second is (1+0.04)/0.4
        loss = float(losses.berhu_loss(pred, gt))
        expected = (0.0 + (1.0 + 0.2**2) / (2 * 0.2)) / 2.0
        np.testing.assert_allclose(loss, expected, rtol=1e-5)

    def test_valid_mask(self):
        pred = jnp.asarray([[5.0, 1.0]])
        gt = jnp.asarray([[0.0, 1.0]])
        valid = jnp.asarray([[0.0, 1.0]])
        assert float(losses.berhu_loss(pred, gt, valid)) == 0.0


class TestPhotometricSmoothness:
    def test_photometric_zero_flow_identical(self):
        rng = np.random.RandomState(0)
        im = jnp.asarray(rng.rand(1, 8, 8, 3), jnp.float32)
        flow = jnp.zeros((1, 8, 8, 2))
        loss = float(losses.photometric_loss(im, im, flow))
        assert loss < 1e-3

    def test_smoothness_zero_for_constant(self):
        field = jnp.ones((1, 8, 8, 2))
        im = jnp.asarray(np.random.rand(1, 8, 8, 3), jnp.float32)
        assert float(losses.smoothness_loss(field, im)) < 1e-7


class TestMetrics:
    def test_confusion_and_miou(self):
        # hand-built: 2 classes; preds: class0 correct 2, class1 correct 1,
        # one 0->1 error, one ignored pixel
        labels = jnp.asarray([[0, 0, 1, 0, 255]])
        pred = jnp.asarray([[0, 0, 1, 1, 1]])
        cm = metrics.confusion_matrix(pred, labels, 2)
        np.testing.assert_allclose(np.asarray(cm), [[2.0, 1.0], [0.0, 1.0]])
        # IoU0 = 2/3, IoU1 = 1/2 -> mIoU = 7/12
        np.testing.assert_allclose(
            float(metrics.miou_from_confusion(cm)), 7 / 12, rtol=1e-6
        )

    def test_flow_epe(self):
        gt = jnp.zeros((1, 2, 2, 2))
        pred = jnp.zeros((1, 2, 2, 2)).at[0, 0, 0, 0].set(3.0)
        epe_sum, fl_sum, count = metrics.flow_error_sums(pred, gt)
        np.testing.assert_allclose(float(epe_sum), 3.0)
        assert float(count) == 4.0
        assert float(fl_sum) == 0.0  # err==3 is not > 3

    def test_flow_outliers(self):
        gt = jnp.zeros((1, 1, 2, 2))
        pred = jnp.zeros((1, 1, 2, 2)).at[0, 0, 0, 0].set(4.0)
        _, fl_sum, _ = metrics.flow_error_sums(pred, gt)
        assert float(fl_sum) == 1.0

    def test_disparity_d1(self):
        gt = jnp.full((1, 1, 2), 10.0)
        pred = jnp.asarray([[[14.0, 10.2]]])
        abs_sum, d1_sum, count = metrics.disparity_error_sums(pred, gt)
        np.testing.assert_allclose(float(abs_sum), 4.2, rtol=1e-5)
        assert float(d1_sum) == 1.0
        assert float(count) == 2.0

    def test_metric_state_accumulates(self):
        state = metrics.MetricState.zeros(num_classes=3)
        outputs = {
            "seg_logits": jnp.zeros((1, 2, 2, 3)).at[..., 1].set(5.0),
            "flow": jnp.zeros((1, 2, 2, 2)),
            "disp": jnp.full((1, 2, 2, 1), 2.0),
        }
        batch = {
            "seg_labels": jnp.ones((1, 2, 2), jnp.int32),
            "flow_gt": jnp.zeros((1, 2, 2, 2)),
            "disp_gt": jnp.full((1, 2, 2), 2.0),
        }
        state = jax.jit(lambda s, o, b: s.update(o, b))(state, outputs, batch)
        state = state.merge(state)
        out = state.compute()
        assert out["miou"] == 1.0
        assert out["flow_epe"] == 0.0
        assert out["disp_mae"] == 0.0


class TestJointLoss:
    def test_joint_weights_and_components(self):
        rng = np.random.RandomState(0)
        outputs = {
            "seg_logits": jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32),
            "flow": jnp.asarray(rng.randn(1, 8, 8, 2), jnp.float32),
            "flow_pyramid": {2: jnp.asarray(rng.randn(1, 2, 2, 2), jnp.float32)},
            "disp_pyramid": {2: jnp.asarray(rng.rand(1, 2, 2, 1), jnp.float32)},
        }
        batch = {
            "left": jnp.asarray(rng.rand(1, 8, 8, 3), jnp.float32),
            "temporal": jnp.asarray(rng.rand(1, 8, 8, 3), jnp.float32),
            "seg_labels": jnp.zeros((1, 8, 8), jnp.int32),
            "flow_gt": jnp.asarray(rng.randn(1, 8, 8, 2), jnp.float32),
            "disp_gt": jnp.asarray(rng.rand(1, 8, 8), jnp.float32),
        }
        total, comps = losses.joint_loss(
            outputs, batch, photometric_weight=0.1, smoothness_weight=0.05
        )
        assert {"seg", "flow", "disp", "photometric", "smoothness", "total"} <= set(
            comps
        )
        recon = (
            comps["seg"] + comps["flow"] + comps["disp"]
            + 0.1 * comps["photometric"] + 0.05 * comps["smoothness"]
        )
        np.testing.assert_allclose(float(total), float(recon), rtol=1e-6)

    def test_missing_tasks_contribute_zero(self):
        outputs = {"seg_logits": jnp.zeros((1, 4, 4, 3))}
        batch = {"seg_labels": jnp.zeros((1, 4, 4), jnp.int32)}
        total, comps = losses.joint_loss(outputs, batch)
        assert set(comps) == {"seg", "total"}


class TestLossLoweringEquivalence:
    """The round-3 TPU lowerings (cascaded GT sum-pools, one-hot CE) must be
    numerically identical to the straightforward formulations."""

    def test_downsample_cascade_equals_one_shot(self):
        rng = np.random.RandomState(0)
        gt = jnp.asarray(rng.randn(2, 64, 128, 2), jnp.float32)
        valid = jnp.asarray((rng.rand(2, 64, 128) > 0.3), jnp.float32)
        for level in (1, 2, 4, 6):
            f = 2 ** level
            vm = valid[..., None]
            gsum = jax.lax.reduce_window(
                gt * vm, 0.0, jax.lax.add, (1, f, f, 1), (1, f, f, 1), "VALID"
            )
            vsum = jax.lax.reduce_window(
                vm, 0.0, jax.lax.add, (1, f, f, 1), (1, f, f, 1), "VALID"
            )
            ref = jnp.where(vsum > 0, gsum / jnp.maximum(vsum, 1.0), 0.0) / f
            got, got_v = losses.downsample_gt(gt, valid, level, scale_values=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-6, rtol=1e-5)
            np.testing.assert_array_equal(
                np.asarray(got_v), np.asarray((vsum[..., 0] > 0).astype(jnp.float32))
            )

    def test_gt_pyramid_matches_per_level(self):
        rng = np.random.RandomState(1)
        gt = jnp.asarray(rng.randn(1, 64, 64, 1), jnp.float32)
        valid = jnp.asarray((rng.rand(1, 64, 64) > 0.5), jnp.float32)
        pyr = losses.gt_pyramid(gt, valid, (2, 3, 6), scale_values=True)
        for level in (2, 3, 6):
            a, va = pyr[level]
            b, vb = losses.downsample_gt(gt, valid, level, scale_values=True)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    def test_ce_one_hot_equals_gather(self):
        rng = np.random.RandomState(2)
        logits = jnp.asarray(rng.randn(1, 8, 8, 19), jnp.float32)
        labels = jnp.asarray(rng.randint(0, 19, (1, 8, 8)), jnp.int32)
        labels = labels.at[0, 0, 0].set(255)
        got = float(losses.segmentation_loss(logits, labels))
        logp = jax.nn.log_softmax(logits, -1)
        safe = jnp.where(labels == 255, 0, labels)
        ll = jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
        vm = (labels != 255).astype(jnp.float32)
        ref = float(jnp.sum(-ll * vm) / jnp.sum(vm))
        assert abs(got - ref) < 1e-6
