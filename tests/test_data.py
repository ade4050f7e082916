"""Data pipeline tests (SURVEY.md §5.4): synthetic 16-bit PNG fixtures
exercising the KITTI encodings and resize->GT-rescale invariants."""

import numpy as np
import jax.numpy as jnp
import pytest

from cerberusnet_tpu.data import encodings
from cerberusnet_tpu.data.kitti import Kitti2015Dataset
from cerberusnet_tpu.data.loader import DataLoader, collate, make_preprocess_fn
from cerberusnet_tpu.data.synthetic import SyntheticPerceptionDataset


class TestEncodings:
    def test_kitti_flow_roundtrip(self):
        rng = np.random.RandomState(0)
        flow = (rng.randn(8, 12, 2) * 30).astype(np.float32)
        valid = (rng.rand(8, 12) > 0.5).astype(np.float32)
        png = encodings.encode_kitti_flow(flow, valid)
        dec, dec_valid = encodings.decode_kitti_flow(png)
        np.testing.assert_array_equal(dec_valid, valid)
        # 1/64 px quantization
        np.testing.assert_allclose(
            dec[valid > 0], flow[valid > 0], atol=1 / 64 + 1e-6
        )

    def test_kitti_flow_formula(self):
        # u = (R - 2^15)/64 exactly (SURVEY.md §9.5)
        png = np.zeros((1, 1, 3), np.uint16)
        png[0, 0] = [2**15 + 640, 2**15 - 64, 1]
        flow, valid = encodings.decode_kitti_flow(png)
        np.testing.assert_allclose(flow[0, 0], [10.0, -1.0])
        assert valid[0, 0] == 1.0

    def test_kitti_disparity_roundtrip(self):
        disp = np.asarray([[0.0, 1.25, 96.0]], np.float32)
        valid = np.asarray([[0.0, 1.0, 1.0]], np.float32)
        png = encodings.encode_kitti_disparity(disp, valid)
        dec, dec_valid = encodings.decode_kitti_disparity(png)
        np.testing.assert_array_equal(dec_valid, valid)
        np.testing.assert_allclose(dec[0, 1:], [1.25, 96.0], atol=1 / 256)

    def test_labelid_mapping(self):
        labels = np.asarray([[7, 26, 0, 33]], np.uint8)
        t = encodings.labelids_to_trainids(labels)
        np.testing.assert_array_equal(t, [[0, 13, 255, 18]])

    def test_resize_flow_scales_values(self):
        flow = jnp.full((1, 8, 16, 2), 4.0)
        valid = jnp.ones((1, 8, 16))
        out, v = encodings.resize_flow(flow, valid, (4, 4))
        # sx = 4/16 = 0.25, sy = 4/8 = 0.5
        np.testing.assert_allclose(out[..., 0], 1.0)
        np.testing.assert_allclose(out[..., 1], 2.0)

    def test_resize_disparity_scales_x_only(self):
        disp = jnp.full((1, 8, 16), 8.0)
        valid = jnp.ones((1, 8, 16))
        out, v = encodings.resize_disparity(disp, valid, (8, 8))
        np.testing.assert_allclose(out, 4.0)


class TestSynthetic:
    def test_sample_schema_and_consistency(self):
        ds = SyntheticPerceptionDataset(length=2, hw=(64, 96), seed=3)
        s = ds[0]
        assert s["left"].shape == (64, 96, 3) and s["left"].dtype == np.uint8
        assert s["flow_gt"].shape == (64, 96, 2)
        assert s["disp_gt"].shape == (64, 96)
        assert s["seg_labels"].max() < 19
        assert np.all(s["disp_gt"] >= 0)

    def test_deterministic(self):
        a = SyntheticPerceptionDataset(length=1, hw=(32, 32), seed=5)[0]
        b = SyntheticPerceptionDataset(length=1, hw=(32, 32), seed=5)[0]
        np.testing.assert_array_equal(a["left"], b["left"])


class TestKittiLoader:
    def test_fixture_roundtrip(self, tmp_path):
        ds = SyntheticPerceptionDataset(length=2, hw=(64, 96), sparse=True, seed=1)
        ds.write_kitti_fixture(str(tmp_path), n=2)
        kitti = Kitti2015Dataset(str(tmp_path), split="")
        assert len(kitti) == 2
        s = kitti[0]
        ref = ds[0]
        np.testing.assert_array_equal(s["left"], ref["left"])
        np.testing.assert_array_equal(s["right"], ref["right"])
        np.testing.assert_array_equal(s["flow_valid"], ref["flow_valid"])
        m = s["flow_valid"] > 0
        np.testing.assert_allclose(
            s["flow_gt"][m], ref["flow_gt"][m], atol=1 / 64 + 1e-6
        )
        np.testing.assert_allclose(
            s["disp_gt"][s["disp_valid"] > 0],
            ref["disp_gt"][ref["disp_valid"] > 0],
            atol=1 / 256 + 1e-6,
        )


class TestDataLoader:
    def test_batching_and_shapes(self):
        ds = SyntheticPerceptionDataset(length=6, hw=(32, 48))
        dl = DataLoader(ds, batch_size=2, num_workers=2)
        batches = list(dl)
        assert len(batches) == 3
        assert batches[0]["left"].shape == (2, 32, 48, 3)
        assert batches[0]["flow_gt"].shape == (2, 32, 48, 2)

    def test_shuffle_differs_across_epochs(self):
        ds = SyntheticPerceptionDataset(length=8, hw=(16, 16))
        dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=1)
        e1 = [int(b["left"].sum()) for b in dl]
        e2 = [int(b["left"].sum()) for b in dl]
        assert sum(e1) == sum(e2)  # same content overall, regrouped

    def test_collate_intersects_keys(self):
        a = {"x": np.zeros(2), "y": np.ones(2)}
        b = {"x": np.ones(2)}
        out = collate([a, b])
        assert set(out) == {"x"}

    def test_preprocess_fn(self):
        ds = SyntheticPerceptionDataset(length=2, hw=(32, 48))
        dl = DataLoader(ds, batch_size=2, num_workers=1)
        batch = next(iter(dl))
        prep = make_preprocess_fn(out_hw=(16, 24))
        out = prep(batch)
        assert out["left"].shape == (2, 16, 24, 3)
        assert out["left"].dtype == jnp.float32
        assert out["flow_gt"].shape == (2, 16, 24, 2)
        assert out["seg_labels"].dtype == jnp.int32
        # flow values scaled by 0.5
        np.testing.assert_allclose(
            np.asarray(out["flow_gt"]).mean(),
            np.asarray(batch["flow_gt"]).mean() * 0.5,
            rtol=0.2, atol=0.05,
        )


class TestCityscapesLoader:
    def _write_fixture(self, root):
        import os
        from cerberusnet_tpu.data import io as data_io

        rng = np.random.RandomState(0)
        city, seq, frame = "testcity", "000000", "000019"
        base = f"{city}_{seq}_{frame}"
        for sub, suffix, img in [
            ("leftImg8bit", "_leftImg8bit.png",
             (rng.rand(64, 96, 3) * 255).astype(np.uint8)),
            ("rightImg8bit", "_rightImg8bit.png",
             (rng.rand(64, 96, 3) * 255).astype(np.uint8)),
        ]:
            d = os.path.join(root, sub, "train", city)
            os.makedirs(d, exist_ok=True)
            data_io.write_image_u8(os.path.join(d, base + suffix), img)
        # labelIds (single-channel uint8) and 16-bit disparity
        import cv2

        d = os.path.join(root, "gtFine", "train", city)
        os.makedirs(d, exist_ok=True)
        labels = rng.choice([7, 26, 0], (64, 96)).astype(np.uint8)
        cv2.imwrite(os.path.join(d, base + "_gtFine_labelIds.png"), labels)
        d = os.path.join(root, "disparity", "train", city)
        os.makedirs(d, exist_ok=True)
        disp_png = (rng.rand(64, 96) * 20000).astype(np.uint16)
        cv2.imwrite(os.path.join(d, base + "_disparity.png"), disp_png)
        return labels, disp_png

    def test_loads_all_modalities(self, tmp_path):
        from cerberusnet_tpu.data.cityscapes import CityscapesDataset

        labels, disp_png = self._write_fixture(str(tmp_path))
        ds = CityscapesDataset(str(tmp_path), "train")
        assert len(ds) == 1
        s = ds[0]
        assert s["left"].shape == (64, 96, 3)
        assert s["right"].shape == (64, 96, 3)
        # no sequence package -> temporal falls back to left
        np.testing.assert_array_equal(s["temporal"], s["left"])
        # labelId 7 -> trainId 0, 26 -> 13, 0 -> 255
        expected = encodings.labelids_to_trainids(labels)
        np.testing.assert_array_equal(s["seg_labels"], expected)
        valid = disp_png > 0
        np.testing.assert_allclose(
            s["disp_gt"][valid], (disp_png[valid].astype(np.float32) - 1) / 256
        )
