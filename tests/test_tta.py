"""TTA evaluation tests (cerberusnet_tpu/eval/tta.py): inverse-transform
math pinned with stub models, plus the Trainer.evaluate_tta path and
per-class IoU reporting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberusnet_tpu.eval import tta_forward


def _batch(h=16, w=24):
    rng = np.random.RandomState(0)
    return {
        "left": jnp.asarray(rng.rand(1, h, w, 3), jnp.float32),
        "right": jnp.asarray(rng.rand(1, h, w, 3), jnp.float32),
        "temporal": jnp.asarray(rng.rand(1, h, w, 3), jnp.float32),
    }


class TestInverseTransforms:
    def test_identity_equals_forward(self):
        def forward(variables, batch):
            return {"seg_logits": batch["left"], "flow": batch["left"][..., :2],
                    "disp": batch["left"][..., :1]}

        b = _batch()
        out = tta_forward(forward, {}, b, scales=(1.0,), flip=False)
        np.testing.assert_allclose(out["seg_logits"], b["left"], rtol=1e-6)
        np.testing.assert_allclose(out["flow"], b["left"][..., :2], rtol=1e-6)

    def test_flip_negates_u_for_constant_flow(self):
        """A model predicting constant flow (u0, v0) regardless of input:
        the mirrored pass contributes (-u0, v0), so flip-TTA averages to
        (0, v0) — pins the u-negation inverse."""

        def forward(variables, batch):
            shape = batch["left"].shape[:3] + (2,)
            return {"flow": jnp.broadcast_to(jnp.asarray([3.0, 5.0]), shape)}

        out = tta_forward(forward, {}, _batch(), scales=(1.0,), flip=True)
        np.testing.assert_allclose(np.asarray(out["flow"][..., 0]), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["flow"][..., 1]), 5.0, atol=1e-5)

    def test_flip_skips_disp_by_default(self):
        """disp_flip='skip' (default): a disp-only model gets NO mirrored
        pass — a mirrored pair without a view swap is geometrically invalid,
        and with a swap it's only a right-view approximation (ADVICE r1)."""
        seen = []

        def forward(variables, batch):
            seen.append((np.asarray(batch["left"]), np.asarray(batch["right"])))
            return {"disp": batch["left"][..., :1] * 0 + 2.0}

        b = _batch()
        out = tta_forward(forward, {}, b, scales=(1.0,), flip=True)
        assert len(seen) == 1  # identity pass only
        np.testing.assert_allclose(np.asarray(out["disp"]), 2.0, atol=1e-5)

    def test_flip_swap_optin_swaps_stereo_pair(self):
        """disp_flip='swap': the mirrored disparity pass feeds
        (mirror(right), mirror(left)) — the mirrored right camera acts as the
        left camera of the mirrored scene."""
        seen = []

        def forward(variables, batch):
            seen.append((np.asarray(batch["left"]), np.asarray(batch["right"])))
            return {"disp": batch["left"][..., :1] * 0 + 2.0}

        b = _batch()
        out = tta_forward(forward, {}, b, scales=(1.0,), flip=True,
                          disp_flip="swap")
        assert len(seen) == 2
        np.testing.assert_allclose(seen[1][0], np.asarray(b["right"][:, :, ::-1]))
        np.testing.assert_allclose(seen[1][1], np.asarray(b["left"][:, :, ::-1]))
        np.testing.assert_allclose(np.asarray(out["disp"]), 2.0, atol=1e-5)

    def test_joint_model_flip_anchors_per_task(self):
        """Joint model with flip: the seg/flow mirrored pass must NOT swap
        the stereo pair (left-anchored tasks see mirror(left)), and by
        default disparity averages over the identity pass only (ADVICE r1
        fix: no right-anchored predictions mixed into left-anchored ones)."""
        seen = []

        def forward(variables, batch):
            seen.append({k: np.asarray(v) for k, v in batch.items()})
            x = batch["left"]
            return {
                "seg_logits": x, "flow": x[..., :2],
                "disp": x[..., :1] * 0 + 4.0,
            }

        b = _batch()
        out = tta_forward(forward, {}, b, scales=(1.0,), flip=True)
        assert len(seen) == 2
        # Mirrored pass: left stays left (no swap), everything mirrored.
        np.testing.assert_allclose(seen[1]["left"], np.asarray(b["left"][:, :, ::-1]))
        np.testing.assert_allclose(seen[1]["right"], np.asarray(b["right"][:, :, ::-1]))
        np.testing.assert_allclose(seen[1]["temporal"],
                                   np.asarray(b["temporal"][:, :, ::-1]))
        # seg averaged over identity + mirrored (identity-model ⇒ mean of
        # x and unflip(mirror(x)) == x).
        np.testing.assert_allclose(np.asarray(out["seg_logits"]),
                                   np.asarray(b["left"]), rtol=1e-5)
        # disp untouched by the mirrored pass.
        np.testing.assert_allclose(np.asarray(out["disp"]), 4.0, atol=1e-5)

    def test_joint_model_flip_swap_runs_three_passes(self):
        """Joint + flip + disp_flip='swap': identity, noswap-mirror
        (seg/flow), swap-mirror (disp) — per-key averaging counts stay
        consistent."""
        seen = []

        def forward(variables, batch):
            seen.append({k: np.asarray(v) for k, v in batch.items()})
            x = batch["left"]
            return {"seg_logits": x * 0 + 1.0, "flow": x[..., :2] * 0,
                    "disp": x[..., :1] * 0 + 3.0}

        b = _batch()
        out = tta_forward(forward, {}, b, scales=(1.0,), flip=True,
                          disp_flip="swap")
        assert len(seen) == 3
        np.testing.assert_allclose(seen[2]["left"], np.asarray(b["right"][:, :, ::-1]))
        np.testing.assert_allclose(np.asarray(out["seg_logits"]), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["disp"]), 3.0, atol=1e-5)

    def test_scale_rescales_flow_values(self):
        """At scale 0.5 a model predicting constant flow (4, 2) in its own
        pixel units contributes (8, 4) at base resolution."""

        def forward(variables, batch):
            shape = batch["left"].shape[:3] + (2,)
            return {"flow": jnp.broadcast_to(jnp.asarray([4.0, 2.0]), shape)}

        out = tta_forward(forward, {}, _batch(), scales=(0.5,), flip=False)
        np.testing.assert_allclose(np.asarray(out["flow"][..., 0]), 8.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out["flow"][..., 1]), 4.0, rtol=1e-5)

    def test_scale_rescales_disp(self):
        def forward(variables, batch):
            shape = batch["left"].shape[:3] + (1,)
            return {"disp": jnp.full(shape, 6.0)}

        out = tta_forward(forward, {}, _batch(), scales=(0.5,), flip=False)
        np.testing.assert_allclose(np.asarray(out["disp"]), 12.0, rtol=1e-5)

    def test_multi_scale_seg_averages(self):
        def forward(variables, batch):
            h = batch["left"].shape[1]
            val = float(h)  # distinguishable per scale
            return {"seg_logits": jnp.full(batch["left"].shape[:3] + (4,), val)}

        b = _batch(h=16, w=24)
        out = tta_forward(forward, {}, b, scales=(1.0, 0.5), flip=False)
        np.testing.assert_allclose(np.asarray(out["seg_logits"]), (16 + 8) / 2.0,
                                   rtol=1e-5)


class TestTrainerTTA:
    def test_evaluate_tta_runs(self):
        from tests.test_train_step import tiny_config
        from cerberusnet_tpu.train.trainer import Trainer

        t = Trainer(tiny_config(variant="seg"))
        out = t.evaluate_tta(scales=(1.0, 0.5), flip=True, per_class=True)
        assert np.isfinite(out["miou"])
        percls = [k for k in out if k.startswith("iou/")]
        assert len(percls) == 19
        assert "iou/road" in out


class TestPerClassIoU:
    def test_per_class_values(self):
        from cerberusnet_tpu.train.metrics import MetricState

        m = MetricState.zeros(3)
        # class 0: 2 correct of 3; class 1: perfect; class 2 absent
        pred = jnp.asarray([[[0, 0, 1, 1, 1]]])
        labels = jnp.asarray([[[0, 0, 0, 1, 1]]])
        m = m.update({"seg_logits": jax.nn.one_hot(pred, 3)}, {"seg_labels": labels})
        out = m.compute(per_class=True, class_names=("a", "b", "c"))
        assert out["iou/a"] == pytest.approx(2 / 3)
        assert out["iou/b"] == pytest.approx(2 / 3)  # 2 TP, 1 FP
        assert np.isnan(out["iou/c"])
        assert out["miou"] == pytest.approx(2 / 3)


class TestVideoStreamExample:
    def test_stream_runs_tiny(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from examples.video_stream import stream

        stats = stream("fast", frames=6, hw=(64, 64), latency_samples=2,
                       verbose=False)
        assert stats["latency_ms_p50"] > 0
        assert stats["throughput_fps"] and stats["throughput_fps"] > 0


class TestTiledInference:
    """Sliding-window inference (eval/tiled.py)."""

    def test_pointwise_model_tiling_is_exact(self):
        """For a pointwise model (output depends only on the pixel), tiled
        inference must reproduce the full-image forward exactly — pins the
        window placement, blending normalization, and stitching."""
        from cerberusnet_tpu.eval import tiled_forward

        def forward(variables, batch):
            x = batch["left"]
            return {"seg_logits": x * 2.0 + 1.0, "flow": x[..., :2] - 0.5,
                    "disp": x[..., :1] * 3.0}

        b = _batch(h=40, w=56)
        ref = forward({}, b)
        out = tiled_forward(forward, {}, b, tile_hw=(16, 24), overlap=0.25)
        for k in ("seg_logits", "flow", "disp"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-5, atol=1e-5
            )

    def test_tile_larger_than_image(self):
        from cerberusnet_tpu.eval import tiled_forward

        def forward(variables, batch):
            return {"disp": batch["left"][..., :1]}

        b = _batch(h=16, w=24)
        out = tiled_forward(forward, {}, b, tile_hw=(32, 32))
        np.testing.assert_allclose(
            np.asarray(out["disp"]), np.asarray(b["left"][..., :1]), rtol=1e-5
        )

    def test_real_model_tiles(self):
        """Tiny CerberusNet over a larger canvas: finite outputs, right
        shapes, single compile shape across tiles."""
        import jax
        from cerberusnet_tpu.eval import tiled_forward
        from cerberusnet_tpu.models import CerberusNet

        m = CerberusNet(
            encoder_channels=(8, 12, 16, 16, 16, 16), est_channels=(16, 16, 12),
            ctx_channels=(16, 16), fpn_channels=16, corr_impl="pure",
        )
        rng = np.random.RandomState(0)
        batch = {
            k: jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32)
            for k in ("left", "right", "temporal")
        }
        tile = {k: v[:, :64, :64] for k, v in batch.items()}
        v = jax.jit(m.init)(jax.random.PRNGKey(0), *tile.values())

        def forward(variables, bt):
            return m.apply(variables, bt["left"], bt["right"], bt["temporal"])

        out = tiled_forward(forward, v, batch, tile_hw=(64, 64), overlap=0.5)
        assert out["seg_logits"].shape == (1, 128, 128, 19)
        assert out["flow"].shape == (1, 128, 128, 2)
        for k in out:
            assert np.isfinite(np.asarray(out[k])).all(), k

    def test_real_raft_model_tiles(self):
        """Tiny CerberusRAFT through eval/tiled.py (VERDICT r4 item 6: the
        recommended fast family must run through every eval path — the old
        rank-3 disp contract broke the rank-4-only tiled blender)."""
        import jax
        from cerberusnet_tpu.eval import tiled_forward
        from cerberusnet_tpu.models import CerberusRAFT

        m = CerberusRAFT(
            encoder_channels=(8, 12, 16, 16, 16, 16), num_classes=5,
            level=3, fdim=16, hdim=12, cdim=8, corr_levels=2, radius=2,
            iters=2, fpn_channels=16,
        )
        rng = np.random.RandomState(0)
        batch = {
            k: jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32)
            for k in ("left", "right", "temporal")
        }
        tile = {k: v[:, :64, :64] for k, v in batch.items()}
        v = jax.jit(m.init)(jax.random.PRNGKey(0), *tile.values())

        def forward(variables, bt):
            return m.apply(variables, bt["left"], bt["right"], bt["temporal"])

        out = tiled_forward(forward, v, batch, tile_hw=(64, 64), overlap=0.5)
        assert out["seg_logits"].shape == (1, 128, 128, 5)
        assert out["flow"].shape == (1, 128, 128, 2)
        assert out["disp"].shape == (1, 128, 128, 1)
        for k in out:
            assert np.isfinite(np.asarray(out[k])).all(), k

    def test_real_raft_model_tta(self):
        """Tiny CerberusRAFT through eval/tta.py multi-scale + flip (the
        second eval path the rank-3 disp fork blocked)."""
        import jax
        from cerberusnet_tpu.models import CerberusRAFT

        m = CerberusRAFT(
            encoder_channels=(8, 12, 16, 16, 16, 16), num_classes=5,
            level=3, fdim=16, hdim=12, cdim=8, corr_levels=2, radius=2,
            iters=2, fpn_channels=16,
        )
        rng = np.random.RandomState(0)
        batch = {
            k: jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
            for k in ("left", "right", "temporal")
        }
        v = jax.jit(m.init)(jax.random.PRNGKey(0), *batch.values())

        def forward(variables, bt):
            return m.apply(variables, bt["left"], bt["right"], bt["temporal"])

        out = tta_forward(forward, v, batch, scales=(0.5, 1.0), flip=True)
        assert out["seg_logits"].shape == (1, 64, 64, 5)
        assert out["flow"].shape == (1, 64, 64, 2)
        assert out["disp"].shape == (1, 64, 64, 1)
        for k in out:
            assert np.isfinite(np.asarray(out[k])).all(), k

    def test_batch_tiles_matches_sequential(self):
        """batch_tiles=True (all windows in one forward at batch b*ntiles)
        produces the same blended output as the sequential path."""
        from cerberusnet_tpu.eval import tiled_forward

        def forward(variables, batch):
            x = batch["left"]
            return {"seg_logits": x * 2.0 + 1.0, "flow": x[..., :2] - 0.5,
                    "disp": x[..., :1] * 3.0,
                    # real models return nested pyramid dicts — the batched
                    # slicer must slice leaves, not top-level values (the
                    # r4e tiled_bench KeyError regression)
                    "flow_pyramid": {"l2": x[..., :2] * 0.25}}

        b = _batch(h=40, w=56)
        seq = tiled_forward(forward, {}, b, tile_hw=(16, 24), overlap=0.25)
        bat = tiled_forward(forward, {}, b, tile_hw=(16, 24), overlap=0.25,
                            batch_tiles=True)
        for k in ("seg_logits", "flow", "disp"):
            np.testing.assert_allclose(
                np.asarray(bat[k]), np.asarray(seq[k]), rtol=1e-5, atol=1e-5
            )
