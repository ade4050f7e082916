"""RAFT family tests: lookup/upsample golden oracles, scan-vs-unroll
equality, sequence loss, and trainer integration (SURVEY.md §5 items 1/2/3/6
applied to the iterative-refinement model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberusnet_tpu.models.raft import (
    RAFTFlowNet,
    RAFTStereoNet,
    allpairs_correlation,
    allpairs_correlation_1d,
    base_grid,
    convex_upsample,
    corr_lookup,
    corr_lookup_1d,
    correlation_pyramid,
    correlation_pyramid_1d,
)
from cerberusnet_tpu.train import losses


def tiny_raft(**kw):
    kw.setdefault("encoder_channels", (8, 12, 16, 16, 16, 16))
    kw.setdefault("fdim", 16)
    kw.setdefault("hdim", 12)
    kw.setdefault("cdim", 8)
    kw.setdefault("corr_levels", 3)
    kw.setdefault("radius", 2)
    kw.setdefault("iters", 3)
    return RAFTFlowNet(**kw)


class TestAllPairs:
    def test_matches_naive_dot(self):
        rng = np.random.RandomState(0)
        f1 = rng.randn(2, 4, 5, 7).astype(np.float32)
        f2 = rng.randn(2, 4, 5, 7).astype(np.float32)
        corr = np.asarray(allpairs_correlation(jnp.array(f1), jnp.array(f2)))
        for b in range(2):
            for y in range(4):
                for x in range(5):
                    n = y * 5 + x
                    expect = (f1[b, y, x, :, None, None] * f2[b].transpose(2, 0, 1)).sum(0)
                    np.testing.assert_allclose(
                        corr[b, n], expect / np.sqrt(7.0), rtol=1e-5, atol=1e-5
                    )

    def test_pyramid_pools_target_grid(self):
        corr = jnp.arange(2 * 6 * 4 * 4, dtype=jnp.float32).reshape(2, 6, 4, 4)
        pyr = correlation_pyramid(corr, 3)
        assert [p.shape for p in pyr] == [(2, 6, 4, 4), (2, 6, 2, 2), (2, 6, 1, 1)]
        np.testing.assert_allclose(
            np.asarray(pyr[1][0, 0, 0, 0]),
            np.asarray(corr[0, 0, :2, :2]).mean(),
            rtol=1e-6,
        )


class TestLookup:
    def _naive_lookup(self, pyramid, coords, radius):
        """Reference loop: bilinear sample with zero outside the frame."""
        b, h, w, _ = coords.shape
        outs = []
        for k, vol in enumerate(pyramid):
            vol = np.asarray(vol)
            _, n, hk, wk = vol.shape
            p = 2 * radius + 1
            out = np.zeros((b, h, w, p * p), np.float32)
            for bi in range(b):
                for y in range(h):
                    for x in range(w):
                        nidx = y * w + x
                        cx = coords[bi, y, x, 0] / (2.0**k)
                        cy = coords[bi, y, x, 1] / (2.0**k)
                        pi = 0
                        for dy in range(-radius, radius + 1):
                            for dx in range(-radius, radius + 1):
                                sx, sy = cx + dx, cy + dy
                                x0, y0 = int(np.floor(sx)), int(np.floor(sy))
                                wx, wy = sx - x0, sy - y0
                                acc = 0.0
                                for (qx, qy, wgt) in [
                                    (x0, y0, (1 - wx) * (1 - wy)),
                                    (x0 + 1, y0, wx * (1 - wy)),
                                    (x0, y0 + 1, (1 - wx) * wy),
                                    (x0 + 1, y0 + 1, wx * wy),
                                ]:
                                    if 0 <= qx < wk and 0 <= qy < hk:
                                        acc += wgt * vol[bi, nidx, qy, qx]
                                out[bi, y, x, pi] = acc
                                pi += 1
            outs.append(out)
        return np.concatenate(outs, axis=-1)

    def test_matches_naive(self):
        rng = np.random.RandomState(1)
        b, h, w = 1, 4, 5
        corr = jnp.array(rng.randn(b, h * w, h, w).astype(np.float32))
        pyr = correlation_pyramid(corr, 2)
        coords = np.asarray(base_grid(b, h, w)) + rng.uniform(
            -2.5, 2.5, (b, h, w, 2)
        ).astype(np.float32)
        got = np.asarray(corr_lookup(pyr, jnp.array(coords), radius=1))
        want = self._naive_lookup(pyr, coords, radius=1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_zero_flow_center_tap_is_self_correlation(self):
        """At zero flow the window center of level 0 is corr[n, y, x]."""
        rng = np.random.RandomState(2)
        b, h, w = 1, 4, 4
        corr = jnp.array(rng.randn(b, h * w, h, w).astype(np.float32))
        out = corr_lookup([corr], base_grid(b, h, w), radius=1)
        center = np.asarray(out)[..., 4]  # (2*1+1)^2 window, index 4 = center
        want = np.asarray(corr).reshape(b, h, w, h, w)
        for y in range(h):
            for x in range(w):
                np.testing.assert_allclose(
                    center[0, y, x], want[0, y, x, y, x], rtol=1e-5
                )


class TestStereo1D:
    def test_allpairs_1d_matches_naive(self):
        rng = np.random.RandomState(5)
        f1 = rng.randn(2, 3, 4, 6).astype(np.float32)
        f2 = rng.randn(2, 3, 4, 6).astype(np.float32)
        corr = np.asarray(
            allpairs_correlation_1d(jnp.array(f1), jnp.array(f2))
        )  # (2, 12, 4)
        for b in range(2):
            for y in range(3):
                for x1 in range(4):
                    for x2 in range(4):
                        want = f1[b, y, x1] @ f2[b, y, x2] / np.sqrt(6.0)
                        np.testing.assert_allclose(
                            corr[b, y * 4 + x1, x2], want, rtol=1e-5
                        )

    def test_lookup_1d_matches_naive(self):
        rng = np.random.RandomState(6)
        b, h, w = 1, 3, 6
        corr = jnp.array(rng.randn(b, h * w, w).astype(np.float32))
        pyr = correlation_pyramid_1d(corr, 2)
        assert pyr[1].shape == (b, h * w, 3)
        coords = rng.uniform(-1.0, w, (b, h, w)).astype(np.float32)
        got = np.asarray(corr_lookup_1d(pyr, jnp.array(coords), radius=1))
        for k, vol in enumerate(pyr):
            vol = np.asarray(vol)
            wk = vol.shape[2]
            for y in range(h):
                for x in range(w):
                    for pi, dx in enumerate((-1, 0, 1)):
                        sx = coords[0, y, x] / (2.0**k) + dx
                        x0 = int(np.floor(sx))
                        wx = sx - x0
                        acc = 0.0
                        if 0 <= x0 < wk:
                            acc += (1 - wx) * vol[0, y * w + x, x0]
                        if 0 <= x0 + 1 < wk:
                            acc += wx * vol[0, y * w + x, x0 + 1]
                        np.testing.assert_allclose(
                            got[0, y, x, k * 3 + pi], acc, rtol=1e-4,
                            atol=1e-5,
                        )


def tiny_raft_stereo(**kw):
    kw.setdefault("encoder_channels", (8, 12, 16, 16, 16, 16))
    kw.setdefault("fdim", 16)
    kw.setdefault("hdim", 12)
    kw.setdefault("cdim", 8)
    kw.setdefault("corr_levels", 2)
    kw.setdefault("radius", 2)
    kw.setdefault("iters", 2)
    return RAFTStereoNet(**kw)


class TestRAFTStereoModel:
    def test_shapes_and_scan_equals_unroll(self):
        m = tiny_raft_stereo()
        mu = tiny_raft_stereo(unroll_iters=True)
        left = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
        right = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))
        v = jax.jit(m.init)(jax.random.PRNGKey(0), left, right)
        vu = jax.jit(mu.init)(jax.random.PRNGKey(0), left, right)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vu)
        out = jax.jit(m.apply)(v, left, right)
        outu = jax.jit(mu.apply)(v, left, right)
        assert out["disp"].shape == (1, 64, 64, 1)
        assert out["disp_pyramid"][3].shape == (1, 8, 8, 1)
        assert out["disp_iterates"].shape == (2, 1, 8, 8, 1)
        np.testing.assert_allclose(
            np.asarray(out["disp"]), np.asarray(outu["disp"]), atol=1e-5
        )
        assert np.isfinite(np.asarray(out["disp"])).all()

    def test_one_train_step(self):
        from cerberusnet_tpu.train.config import (
            DataConfig,
            ExperimentConfig,
            ModelConfig,
            TrainConfig,
        )
        from cerberusnet_tpu.train.trainer import Trainer

        cfg = ExperimentConfig(
            name="raft_stereo_step",
            model=ModelConfig(
                variant="raft_stereo",
                encoder_channels=(8, 12, 16, 16, 16, 16),
                raft_fdim=16,
                raft_hdim=12,
                raft_cdim=8,
                raft_corr_levels=2,
                raft_radius=2,
                raft_iters=2,
            ),
            data=DataConfig(
                dataset="synthetic",
                hw=(64, 64),
                batch_size=2,
                num_workers=1,
                synthetic_length=2,
                shuffle=False,
            ),
            train=TrainConfig(epochs=1, log_every=1000, num_data_devices=1),
        )
        trainer = Trainer(cfg)
        from cerberusnet_tpu.data.loader import DataLoader

        batch = next(iter(DataLoader(trainer.dataset, batch_size=2, num_workers=1)))
        comps = trainer.train_step(batch)
        assert np.isfinite(float(comps["total"]))
        assert "disp" in comps


class TestCerberusRAFT:
    def test_joint_forward_shapes(self):
        from cerberusnet_tpu.models import CerberusRAFT

        m = CerberusRAFT(
            encoder_channels=(8, 12, 16, 16, 16, 16),
            num_classes=5,
            fdim=16,
            hdim=12,
            cdim=8,
            corr_levels=2,
            radius=2,
            iters=2,
            fpn_channels=16,
        )
        imgs = tuple(
            jax.random.normal(jax.random.PRNGKey(i), (1, 64, 64, 3))
            for i in range(3)
        )
        v = jax.jit(m.init)(jax.random.PRNGKey(0), *imgs)
        out = jax.jit(m.apply)(v, *imgs)
        assert out["seg_logits"].shape == (1, 64, 64, 5)
        assert out["flow"].shape == (1, 64, 64, 2)
        assert out["disp"].shape == (1, 64, 64, 1)
        assert out["flow_iterates"].shape == (2, 1, 8, 8, 2)
        assert out["disp_iterates"].shape == (2, 1, 8, 8, 1)
        for k in ("seg_logits", "flow", "disp"):
            assert np.isfinite(np.asarray(out[k])).all()

    def test_joint_train_step_all_components(self):
        from cerberusnet_tpu.train.config import (
            DataConfig,
            ExperimentConfig,
            ModelConfig,
            TrainConfig,
        )
        from cerberusnet_tpu.train.trainer import Trainer

        cfg = ExperimentConfig(
            name="cerberus_raft_step",
            model=ModelConfig(
                variant="cerberus_raft",
                encoder_channels=(8, 12, 16, 16, 16, 16),
                num_classes=5,
                raft_fdim=16,
                raft_hdim=12,
                raft_cdim=8,
                raft_corr_levels=2,
                raft_radius=2,
                raft_iters=2,
                fpn_channels=16,
            ),
            data=DataConfig(
                dataset="synthetic",
                hw=(64, 64),
                batch_size=2,
                num_workers=1,
                synthetic_length=2,
                shuffle=False,
            ),
            train=TrainConfig(epochs=1, log_every=1000, num_data_devices=1),
        )
        trainer = Trainer(cfg)
        from cerberusnet_tpu.data.loader import DataLoader

        batch = next(iter(DataLoader(trainer.dataset, batch_size=2, num_workers=1)))
        comps = trainer.train_step(batch)
        assert np.isfinite(float(comps["total"]))
        # all three task losses (seg CE + flow sequence + disp sequence)
        for k in ("seg", "flow", "disp"):
            assert k in comps, comps.keys()


class TestRAFTOverfit:
    def test_sequence_loss_decreases(self):
        """SURVEY.md §5 item 6 for the iterative family: repeated steps on
        one fixed batch must reduce the RAFT sequence loss (backward flows
        through the scanned GRU, the lookup gathers, and the all-pairs
        matmul)."""
        from cerberusnet_tpu.train.config import (
            DataConfig,
            ExperimentConfig,
            ModelConfig,
            OptimConfig,
            TrainConfig,
        )
        from cerberusnet_tpu.train.trainer import Trainer

        cfg = ExperimentConfig(
            name="raft_overfit",
            model=ModelConfig(
                variant="raft",
                encoder_channels=(8, 12, 16, 16, 16, 16),
                raft_fdim=16,
                raft_hdim=12,
                raft_cdim=8,
                raft_corr_levels=2,
                raft_radius=2,
                raft_iters=2,
            ),
            data=DataConfig(
                dataset="synthetic",
                hw=(64, 64),
                batch_size=2,
                num_workers=1,
                synthetic_length=2,
                shuffle=False,
            ),
            optim=OptimConfig(lr=1e-3, schedule="constant", total_steps=100),
            train=TrainConfig(epochs=1, log_every=1000, num_data_devices=1),
        )
        trainer = Trainer(cfg)
        from cerberusnet_tpu.data.loader import DataLoader

        batch = next(iter(DataLoader(trainer.dataset, batch_size=2, num_workers=1)))
        first = float(trainer.train_step(batch)["flow"])
        last = first
        for _ in range(9):
            last = float(trainer.train_step(dict(batch))["flow"])
        assert np.isfinite(last)
        assert last < first * 0.9, (first, last)


class TestRAFTDataParallel:
    def test_dp_train_step_8dev(self):
        """RAFT under the ('data','spatial') mesh: one DP train step on the
        8 fake devices with finite loss (the all-pairs einsum + gathers
        must be partitionable along batch)."""
        if jax.device_count() < 8:
            pytest.skip("needs 8 fake devices")
        from cerberusnet_tpu.train.config import (
            DataConfig,
            ExperimentConfig,
            ModelConfig,
            TrainConfig,
        )
        from cerberusnet_tpu.train.trainer import Trainer

        cfg = ExperimentConfig(
            name="raft_dp",
            model=ModelConfig(
                variant="raft",
                encoder_channels=(8, 12, 16, 16, 16, 16),
                raft_fdim=16,
                raft_hdim=12,
                raft_cdim=8,
                raft_corr_levels=2,
                raft_radius=2,
                raft_iters=2,
            ),
            data=DataConfig(
                dataset="synthetic",
                hw=(64, 64),
                batch_size=8,
                num_workers=1,
                synthetic_length=8,
                shuffle=False,
            ),
            train=TrainConfig(
                epochs=1, log_every=1000, num_data_devices=8,
                num_spatial_devices=1,
            ),
        )
        trainer = Trainer(cfg)
        from cerberusnet_tpu.data.loader import DataLoader

        batch = next(iter(DataLoader(trainer.dataset, batch_size=8, num_workers=1)))
        comps = trainer.train_step(batch)
        assert np.isfinite(float(comps["total"]))


class TestConvexUpsample:
    def test_uniform_mask_is_neighbourhood_mean(self):
        rng = np.random.RandomState(3)
        flow = jnp.array(rng.randn(1, 3, 4, 2).astype(np.float32))
        mask = jnp.zeros((1, 3, 4, 4 * 9), jnp.float32)  # softmax -> 1/9
        up = np.asarray(convex_upsample(flow, mask, factor=2))
        assert up.shape == (1, 6, 8, 2)
        fp = np.pad(np.asarray(flow) * 2, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        want00 = np.stack(
            [fp[:, i : i + 3, j : j + 4] for i in range(3) for j in range(3)]
        ).mean(0)
        np.testing.assert_allclose(up[:, ::2, ::2], want00, rtol=1e-5, atol=1e-6)

    def test_center_hot_mask_is_nearest_upsample(self):
        rng = np.random.RandomState(4)
        flow = jnp.array(rng.randn(1, 2, 2, 2).astype(np.float32))
        mask = np.full((1, 2, 2, 4, 9), -1e9, np.float32)
        mask[..., 4] = 0.0  # center neighbour wins the softmax
        up = np.asarray(
            convex_upsample(flow, jnp.array(mask.reshape(1, 2, 2, 36)), factor=2)
        )
        want = np.repeat(np.repeat(np.asarray(flow) * 2, 2, 1), 2, 2)
        np.testing.assert_allclose(up, want, rtol=1e-5, atol=1e-6)


class TestRAFTModel:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        m = tiny_raft()
        im1 = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
        im2 = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
        v = jax.jit(m.init)(jax.random.PRNGKey(0), im1, im2)
        return m, v, im1, im2

    def test_shapes(self, model_and_vars):
        m, v, im1, im2 = model_and_vars
        out = jax.jit(m.apply)(v, im1, im2)
        assert out["flow"].shape == (2, 64, 64, 2)
        assert out["flow_pyramid"][3].shape == (2, 8, 8, 2)
        assert out["flow_iterates"].shape == (3, 2, 8, 8, 2)
        assert np.isfinite(np.asarray(out["flow"])).all()

    def test_scan_equals_unroll(self, model_and_vars):
        m, v, im1, im2 = model_and_vars
        mu = tiny_raft(unroll_iters=True)
        vu = jax.jit(mu.init)(jax.random.PRNGKey(0), im1, im2)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vu)
        out = jax.jit(m.apply)(v, im1, im2)
        outu = jax.jit(mu.apply)(v, im1, im2)  # cross-apply: same params
        np.testing.assert_allclose(
            np.asarray(out["flow"]), np.asarray(outu["flow"]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["flow_iterates"]),
            np.asarray(outu["flow_iterates"]),
            atol=1e-5,
        )

    def test_grads_finite_and_nonzero(self, model_and_vars):
        m, v, im1, im2 = model_and_vars
        gt = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 64, 2))

        def loss_fn(params):
            out = m.apply({"params": params}, im1, im2)
            return losses.raft_sequence_loss(out["flow_iterates"], gt, level=3)

        g = jax.jit(jax.grad(loss_fn))(v["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        total = sum(float(jnp.sum(jnp.abs(x))) for x in leaves)
        assert total > 0.0

    def test_bf16_forward(self, model_and_vars):
        _, v, im1, im2 = model_and_vars
        mb = tiny_raft(dtype=jnp.bfloat16)
        out = jax.jit(mb.apply)(v, im1.astype(jnp.bfloat16), im2.astype(jnp.bfloat16))
        assert out["flow"].dtype == jnp.float32
        assert np.isfinite(np.asarray(out["flow"])).all()


class TestRAFTExport:
    def test_export_roundtrip_matches_jit(self, tmp_path):
        """The iterative scan model must survive the deploy path: nn.scan
        lowers to a StableHLO while loop; export -> serialize -> load ->
        call must match live jit (SURVEY.md §5 item 8 applied to RAFT)."""
        from cerberusnet_tpu.export.aot import (
            export_inference,
            load_exported,
            save_exported,
        )

        m = tiny_raft(iters=2, corr_levels=2)
        rng = np.random.RandomState(0)
        imgs = tuple(
            jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32) for _ in range(2)
        )
        v = jax.jit(m.init)(jax.random.PRNGKey(0), *imgs)

        def fn(im1, im2):
            out = m.apply(v, im1, im2)
            return out["flow"]

        exported = export_inference(fn, imgs)
        out_dir = save_exported(exported, str(tmp_path / "raft"))
        back = load_exported(out_dir)
        flow = back.call(*imgs)
        live = jax.jit(fn)(*imgs)
        assert np.shape(flow) == np.shape(live)
        np.testing.assert_allclose(
            np.asarray(flow), np.asarray(live), rtol=1e-5, atol=1e-5
        )


class TestSequenceLoss:
    def test_hand_computed(self):
        # T=2, trivial spatial extent: level 0, 1x1 "image"
        gt = jnp.zeros((1, 1, 1, 2), jnp.float32).at[0, 0, 0, 0].set(2.0)
        it0 = jnp.zeros((1, 1, 1, 2), jnp.float32)  # L1 err = 2
        it1 = jnp.ones((1, 1, 1, 2), jnp.float32)  # L1 err = |1-2| + |1-0| = 2
        iterates = jnp.stack([it0, it1])
        got = float(
            losses.raft_sequence_loss(iterates, gt, level=0, gamma=0.5)
        )
        assert np.isclose(got, 0.5 * 2.0 + 1.0 * 2.0)

    def test_invalid_pixels_excluded(self):
        gt = jnp.full((1, 2, 2, 2), 3.0)
        valid = jnp.array([[[1.0, 0.0], [0.0, 0.0]]])
        iterates = jnp.zeros((1, 1, 2, 2, 2))
        got = float(
            losses.raft_sequence_loss(iterates, gt, valid, level=0, gamma=1.0)
        )
        assert np.isclose(got, 6.0)  # only the single valid pixel counts

    def test_joint_loss_uses_sequence_term(self):
        gt = jnp.zeros((1, 8, 8, 2))
        outputs = {
            "flow": jnp.zeros((1, 8, 8, 2)),
            "flow_pyramid": {1: jnp.zeros((1, 4, 4, 2))},
            "flow_iterates": jnp.ones((2, 1, 4, 4, 2)),
        }
        total, comps = losses.joint_loss(outputs, {"flow_gt": gt}, seq_gamma=0.5)
        # sequence L1: each iterate err 2.0 (|1|+|1|), weights (0.5, 1.0)
        assert np.isclose(float(comps["flow"]), 3.0)


class TestRAFTTrainer:
    def test_one_train_step(self, tmp_path):
        from cerberusnet_tpu.train.config import (
            DataConfig,
            ExperimentConfig,
            ModelConfig,
            TrainConfig,
        )
        from cerberusnet_tpu.train.trainer import Trainer

        cfg = ExperimentConfig(
            name="raft_step",
            model=ModelConfig(
                variant="raft",
                encoder_channels=(8, 12, 16, 16, 16, 16),
                raft_fdim=16,
                raft_hdim=12,
                raft_cdim=8,
                raft_corr_levels=2,
                raft_radius=2,
                raft_iters=2,
            ),
            data=DataConfig(
                dataset="synthetic",
                hw=(64, 64),
                batch_size=2,
                num_workers=1,
                synthetic_length=2,
                shuffle=False,
            ),
            train=TrainConfig(epochs=1, log_every=1000, num_data_devices=1),
        )
        trainer = Trainer(cfg)
        from cerberusnet_tpu.data.loader import DataLoader

        batch = next(iter(DataLoader(trainer.dataset, batch_size=2, num_workers=1)))
        comps = trainer.train_step(batch)
        assert np.isfinite(float(comps["total"]))
        assert "flow" in comps


class TestOnehotLookup:
    """lookup_impl='onehot' (gather-free two-matmul factorization, round 4)
    must match the gather path bit-for-semantics at every coordinate regime,
    including far out-of-bounds (where the window is fully masked)."""

    def _pyr2d(self, rng, b=1, h=4, w=5, levels=3):
        corr = jnp.array(rng.randn(b, h * w, h, w).astype(np.float32))
        return correlation_pyramid(corr, levels), b, h, w

    @pytest.mark.parametrize("spread", [2.5, 50.0])
    def test_2d_matches_gather(self, spread):
        rng = np.random.RandomState(7)
        pyr, b, h, w = self._pyr2d(rng)
        coords = jnp.array(
            (np.asarray(base_grid(b, h, w))
             + rng.uniform(-spread, spread, (b, h, w, 2))).astype(np.float32)
        )
        got = np.asarray(corr_lookup(pyr, coords, radius=2, impl="onehot"))
        want = np.asarray(corr_lookup(pyr, coords, radius=2, impl="gather"))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_2d_integer_positions(self):
        """Exact-integer sample positions (frac == 0) hit the equality-test
        corner case of the interpolation matrix."""
        rng = np.random.RandomState(8)
        pyr, b, h, w = self._pyr2d(rng)
        coords = base_grid(b, h, w)  # zero flow: all-integer positions
        got = np.asarray(corr_lookup(pyr, coords, radius=1, impl="onehot"))
        want = np.asarray(corr_lookup(pyr, coords, radius=1, impl="gather"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("spread", [2.5, 50.0])
    def test_1d_matches_gather(self, spread):
        rng = np.random.RandomState(9)
        b, h, w = 1, 3, 6
        corr = jnp.array(rng.randn(b, h * w, w).astype(np.float32))
        pyr = correlation_pyramid_1d(corr, 3)
        gx = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
        coords_x = gx + jnp.array(
            rng.uniform(-spread, spread, (b, h, w)).astype(np.float32)
        )
        got = np.asarray(
            corr_lookup_1d(pyr, coords_x, radius=3, impl="onehot")
        )
        want = np.asarray(
            corr_lookup_1d(pyr, coords_x, radius=3, impl="gather")
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_model_forward_equal(self):
        """Full RAFTFlowNet forward: onehot == gather under the same params
        (the knob changes program structure only)."""
        imgs = tuple(
            jax.random.normal(jax.random.PRNGKey(i), (1, 32, 48, 3))
            for i in range(2)
        )
        kw = dict(encoder_channels=(8, 12, 16), level=3, fdim=16, hdim=12,
                  cdim=8, corr_levels=2, radius=2, iters=2)
        m_g = RAFTFlowNet(lookup_impl="gather", **kw)
        m_o = RAFTFlowNet(lookup_impl="onehot", **kw)
        v = jax.jit(m_g.init)(jax.random.PRNGKey(0), *imgs)
        og = jax.jit(m_g.apply)(v, *imgs)
        oo = jax.jit(m_o.apply)(v, *imgs)
        np.testing.assert_allclose(
            np.asarray(oo["flow"]), np.asarray(og["flow"]),
            rtol=1e-4, atol=1e-4,
        )


class TestLookupImplValidation:
    def test_typo_impl_raises(self):
        """A lookup-impl typo must error, not silently select the 12-58x
        slower gather path (ADVICE r4)."""
        from cerberusnet_tpu.models.raft import corr_lookup, corr_lookup_1d

        pyr = [jnp.zeros((1, 4, 2, 2), jnp.float32)]
        coords = jnp.zeros((1, 2, 2, 2), jnp.float32)
        with pytest.raises(ValueError, match="onehot"):
            corr_lookup(pyr, coords, 1, impl="one-hot")
        pyr1 = [jnp.zeros((1, 4, 2), jnp.float32)]
        with pytest.raises(ValueError, match="onehot"):
            corr_lookup_1d(pyr1, jnp.zeros((1, 2, 2), jnp.float32), 1,
                           impl="onehots")


class TestRAFTVisualization:
    def test_panel_renders_for_raft_family(self, tmp_path):
        """The RAFT decoders share the repo-wide (B, H, W, 1) disp contract
        (VERDICT r4 item 6) and the eval panel must render them (chain r4g
        raft_evidence crashed in render_panel under the old rank-3 fork)."""
        from cerberusnet_tpu.train.config import (
            DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
        )
        from cerberusnet_tpu.train.trainer import Trainer

        cfg = ExperimentConfig(
            name="raftpanel",
            model=ModelConfig(
                variant="cerberus_raft",
                encoder_channels=(8, 12, 16, 16, 16, 16),
                num_classes=5,
                raft_level=3,
                raft_fdim=16,
                raft_hdim=12,
                raft_cdim=8,
                raft_corr_levels=2,
                raft_radius=2,
                raft_iters=2,
                fpn_channels=16,
            ),
            data=DataConfig(
                dataset="synthetic", hw=(64, 64), batch_size=1,
                num_workers=1, synthetic_length=1, shuffle=False,
            ),
            train=TrainConfig(epochs=1, log_every=1000, num_data_devices=1),
        )
        tr = Trainer(cfg)
        out = tr.dump_visualization(str(tmp_path / "panel.png"))
        import os

        assert os.path.exists(out)
