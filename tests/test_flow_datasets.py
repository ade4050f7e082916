"""Flow-dataset family: .flo/.pfm IO roundtrips and the Sintel /
FlyingChairs / FlyingThings3D loaders over synthetic fixture trees
(SURVEY.md §5.4 — data-pipeline tests via synthetic encoded files)."""

import os

import numpy as np
import pytest

from cerberusnet_tpu.data import io as data_io
from cerberusnet_tpu.data.flow_datasets import (
    FlyingChairsDataset,
    FlyingThings3DDataset,
    SintelDataset,
)

rng = np.random.default_rng(0)


def _img(h=12, w=16):
    return rng.integers(0, 255, (h, w, 3), np.uint8)


class TestFloPfmIO:
    def test_flo_roundtrip(self, tmp_path):
        flow = rng.normal(scale=5.0, size=(7, 9, 2)).astype(np.float32)
        p = tmp_path / "a.flo"
        data_io.write_flo(p, flow)
        back = data_io.read_flo(p)
        np.testing.assert_array_equal(back, flow)

    def test_flo_rejects_garbage(self, tmp_path):
        p = tmp_path / "bad.flo"
        p.write_bytes(b"\x00" * 32)
        with pytest.raises(IOError):
            data_io.read_flo(p)

    def test_pfm_roundtrip_gray_and_color(self, tmp_path):
        for shape in [(6, 8), (6, 8, 3)]:
            arr = rng.normal(size=shape).astype(np.float32)
            p = tmp_path / "a.pfm"
            data_io.write_pfm(p, arr)
            back = data_io.read_pfm(p)
            np.testing.assert_array_equal(back, arr)

    def test_pfm_row_order_is_top_down(self, tmp_path):
        # bottom-up storage is the format's trap: a gradient image must
        # come back with row 0 == the row we wrote at index 0.
        arr = np.arange(4 * 3, dtype=np.float32).reshape(4, 3)
        p = tmp_path / "g.pfm"
        data_io.write_pfm(p, arr)
        np.testing.assert_array_equal(data_io.read_pfm(p)[0], arr[0])


def _make_sintel(root, scenes=("alley_1",), n_frames=3):
    for scene in scenes:
        for kind in ("clean", "flow", "invalid"):
            os.makedirs(os.path.join(root, "training", kind, scene))
        for t in range(1, n_frames + 1):
            data_io.write_image_u8(
                os.path.join(root, "training", "clean", scene,
                             f"frame_{t:04d}.png"), _img())
            if t < n_frames:
                flow = np.full((12, 16, 2), float(t), np.float32)
                data_io.write_flo(
                    os.path.join(root, "training", "flow", scene,
                                 f"frame_{t:04d}.flo"), flow)
                inv = np.zeros((12, 16), np.uint8)
                inv[0, :4] = 255
                data_io.write_image_u8(
                    os.path.join(root, "training", "invalid", scene,
                                 f"frame_{t:04d}.png"),
                    np.repeat(inv[..., None], 3, -1))


class TestSintel:
    def test_pairs_and_decode(self, tmp_path):
        _make_sintel(str(tmp_path), n_frames=3)
        ds = SintelDataset(str(tmp_path), render_pass="clean")
        assert len(ds) == 2  # 3 frames -> 2 consecutive pairs
        s = ds[0]
        assert s["left"].shape == (12, 16, 3)
        assert s["temporal"].shape == (12, 16, 3)
        np.testing.assert_array_equal(s["flow_gt"], np.full((12, 16, 2), 1.0))
        assert s["flow_valid"][0, 0] == 0.0  # invalid-marked pixel
        assert s["flow_valid"][5, 5] == 1.0
        assert s["flow_valid"].mean() < 1.0

    def test_missing_pass_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            SintelDataset(str(tmp_path))


class TestFlyingChairs:
    def _make(self, root, n=3):
        os.makedirs(os.path.join(root, "data"))
        for i in range(1, n + 1):
            base = os.path.join(root, "data", f"{i:05d}")
            data_io.write_image_u8(base + "_img1.ppm", _img())
            data_io.write_image_u8(base + "_img2.ppm", _img())
            data_io.write_flo(base + "_flow.flo",
                              np.full((12, 16, 2), float(i), np.float32))

    def test_load_all(self, tmp_path):
        self._make(str(tmp_path))
        ds = FlyingChairsDataset(str(tmp_path))
        assert len(ds) == 3
        s = ds[1]
        assert s["left"].shape == (12, 16, 3)
        np.testing.assert_array_equal(s["flow_gt"][..., 0], 2.0)
        assert s["flow_valid"].all()

    def test_split_file(self, tmp_path):
        self._make(str(tmp_path))
        split = tmp_path / "FlyingChairs_train_val.txt"
        split.write_text("1\n2\n1\n")
        assert len(FlyingChairsDataset(str(tmp_path), split="train")) == 2
        # the DataConfig default spelling must also mean TRAIN (a default
        # config must not silently train on the val subset)
        assert len(FlyingChairsDataset(str(tmp_path), split="training")) == 2
        val = FlyingChairsDataset(str(tmp_path), split="val")
        assert len(val) == 1
        np.testing.assert_array_equal(val[0]["flow_gt"][..., 1], 2.0)

    def test_split_flags_indexed_by_id_not_position(self, tmp_path):
        """A missing sample file must not shift later ids' train/val
        assignment (flags pair by id, not by glob position)."""
        self._make(str(tmp_path))
        os.remove(os.path.join(str(tmp_path), "data", "00002_flow.flo"))
        split = tmp_path / "FlyingChairs_train_val.txt"
        split.write_text("2\n1\n1\n")  # id1=val, id2=train, id3=train
        train = FlyingChairsDataset(str(tmp_path), split="train")
        assert [s for s in train.ids] == ["00003"]

    def test_split_file_too_short_fails_loudly(self, tmp_path):
        self._make(str(tmp_path))
        split = tmp_path / "FlyingChairs_train_val.txt"
        split.write_text("1\n1\n")  # 3 sample ids on disk
        with pytest.raises(ValueError):
            FlyingChairsDataset(str(tmp_path), split="train")


class TestTrainerIntegration:
    def test_trainer_fits_on_sintel_fixture(self, tmp_path):
        """The config factory builds Sintel and the flow-only variant trains
        over it end-to-end (dense .flo GT + invalid masks through the masked
        multi-scale loss)."""
        _make_sintel(str(tmp_path), n_frames=3)
        from cerberusnet_tpu.train.config import (
            DataConfig,
            ExperimentConfig,
            ModelConfig,
            OptimConfig,
            TrainConfig,
        )
        from cerberusnet_tpu.train.trainer import Trainer

        cfg = ExperimentConfig(
            name="sintel-fixture",
            model=ModelConfig(
                variant="flow",
                encoder_channels=(8, 12, 16, 16, 16, 16),
                est_channels=(16, 16, 12),
                ctx_channels=(16, 16),
                corr_impl="pure",
            ),
            data=DataConfig(
                dataset="sintel",
                root=str(tmp_path),
                hw=(64, 64),
                batch_size=2,
                num_workers=1,
                shuffle=False,
            ),
            optim=OptimConfig(lr=1e-3, warmup_steps=0, total_steps=10,
                              schedule="constant"),
            train=TrainConfig(epochs=1, log_every=1000, num_data_devices=1),
        )
        tr = Trainer(cfg)
        assert len(tr.dataset) == 2
        logs = tr.fit()
        loss_keys = [k for k in logs[-1] if k.startswith("loss_")]
        assert loss_keys, logs[-1]
        assert all(np.isfinite(logs[-1][k]) for k in loss_keys), logs[-1]


class TestFlyingThings3D:
    def _make(self, root):
        seq = os.path.join("A", "0000")
        for cam in ("left", "right"):
            d = os.path.join(root, "frames_cleanpass", "TRAIN", seq, cam)
            os.makedirs(d)
            for t in (6, 7):
                data_io.write_image_u8(os.path.join(d, f"{t:04d}.png"), _img())
        fd = os.path.join(root, "optical_flow", "TRAIN", seq,
                          "into_future", "left")
        os.makedirs(fd)
        flow = np.zeros((12, 16, 3), np.float32)
        flow[..., 0] = 2.5
        flow[..., 1] = -1.5
        flow[0, 0, 0] = np.inf  # release contains a handful of these
        data_io.write_pfm(
            os.path.join(fd, "OpticalFlowIntoFuture_0006_L.pfm"), flow)
        dd = os.path.join(root, "disparity", "TRAIN", seq, "left")
        os.makedirs(dd)
        disp = np.full((12, 16), 3.25, np.float32)
        disp[1, 1] = -4.0  # nonpositive -> invalid
        data_io.write_pfm(os.path.join(dd, "0006.pfm"), disp)

    def test_config_split_vocabulary_maps_to_release_dirs(self, tmp_path):
        """The release only has TRAIN/ and TEST/; the DataConfig spellings
        ('training', 'val') must map onto them."""
        self._make(str(tmp_path))
        assert len(FlyingThings3DDataset(str(tmp_path), split="training")) == 1
        with pytest.raises(FileNotFoundError):  # maps to TEST/, not VAL/
            FlyingThings3DDataset(str(tmp_path), split="val")

    def test_joint_sample(self, tmp_path):
        self._make(str(tmp_path))
        ds = FlyingThings3DDataset(str(tmp_path))
        assert len(ds) == 1  # frames 6,7 -> one pair
        s = ds[0]
        for k in ("left", "right", "temporal"):
            assert s[k].shape == (12, 16, 3)
        assert s["flow_gt"][3, 3, 0] == 2.5 and s["flow_gt"][3, 3, 1] == -1.5
        assert s["flow_valid"][0, 0] == 0.0  # the inf pixel
        assert s["flow_gt"][0, 0, 0] == 0.0  # masked, not propagated
        assert s["disp_gt"][2, 2] == 3.25
        assert s["disp_valid"][1, 1] == 0.0
