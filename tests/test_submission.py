"""Benchmark-submission writers (eval/submission.py): written PNGs decode
back to the predictions through the SAME decoders the datasets use
(data/encodings.py, SURVEY.md §9.5) — the write/read pair is self-inverse
up to the formats' quantization (flow 1/64 px, disparity 1/256 px)."""

import numpy as np
import pytest

from cerberusnet_tpu.data.encodings import (
    CITYSCAPES_LABELID_TO_TRAINID,
    decode_kitti_disparity,
    decode_kitti_flow,
)
from cerberusnet_tpu.data.io import read_image_gray_u8, read_png16
from cerberusnet_tpu.eval.submission import (
    TRAINID_TO_LABELID,
    write_predictions,
)


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def test_trainid_labelid_inverse():
    assert np.all(
        CITYSCAPES_LABELID_TO_TRAINID[TRAINID_TO_LABELID] == np.arange(19)
    )


def test_write_predictions_roundtrip(tmp_path, rng):
    b, h, w = 2, 16, 24
    outputs = {
        "flow": rng.uniform(-30, 30, (b, h, w, 2)).astype(np.float32),
        "disp": rng.uniform(0.5, 90, (b, h, w, 1)).astype(np.float32),
        "seg_logits": rng.randn(b, h, w, 19).astype(np.float32),
    }
    names = ["000000_10", "000001_10"]
    made = write_predictions(outputs, str(tmp_path), names)
    assert len(made) == 3 * b

    for i, stem in enumerate(names):
        flow, valid = decode_kitti_flow(
            read_png16(str(tmp_path / "flow" / f"{stem}.png"))
        )
        assert valid.min() == 1.0
        np.testing.assert_allclose(
            flow, outputs["flow"][i], atol=1.0 / 64 + 1e-6
        )

        disp, dvalid = decode_kitti_disparity(
            read_png16(str(tmp_path / "disp_0" / f"{stem}.png"))
        )
        assert dvalid.min() == 1.0
        np.testing.assert_allclose(
            disp, outputs["disp"][i, ..., 0], atol=1.0 / 256 + 1e-6
        )

        labelids = read_image_gray_u8(str(tmp_path / "semantic" / f"{stem}.png"))
        trainids = CITYSCAPES_LABELID_TO_TRAINID[labelids]
        np.testing.assert_array_equal(
            trainids, outputs["seg_logits"][i].argmax(-1)
        )


def test_trainer_predict_to_dir(tmp_path):
    """Trainer.predict_to_dir writes one benchmark file per head per eval
    sample (odd-sized last batch included), decodable by the dataset
    decoders."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from cerberusnet_tpu.train.config import ExperimentConfig
    from cerberusnet_tpu.train.trainer import Trainer

    cfg = ExperimentConfig()
    cfg.model.encoder_channels = (8, 12, 16, 16, 16, 16)
    cfg.model.estimator_channels = (16, 16, 12)
    cfg.model.context_channels = (16, 16)
    cfg.model.corr_impl = "pure"
    cfg.data.dataset = "synthetic"
    cfg.data.hw = (64, 128)
    cfg.data.synthetic_length = 5  # odd vs batch 2: last batch is partial
    cfg.data.batch_size = 2
    cfg.train.num_data_devices = 1  # conftest exposes 8 fake devices
    t = Trainer(cfg)
    made = t.predict_to_dir(str(tmp_path))
    assert len(made) == 3 * 5
    flow, valid = decode_kitti_flow(
        read_png16(str(tmp_path / "flow" / "000004_10.png"))
    )
    assert flow.shape == (64, 128, 2) and np.isfinite(flow).all()
    assert valid.min() == 1.0


def test_native_resolution_rescaling(tmp_path, rng):
    """native_hw resizes predictions with benchmark-correct value scaling:
    flow u scales with the width ratio, v with height, disparity with
    width; seg resizes as nearest labels."""
    from cerberusnet_tpu.eval.submission import write_predictions

    h, w = 8, 16
    flow = np.zeros((1, h, w, 2), np.float32)
    flow[..., 0] = 2.0
    flow[..., 1] = 1.0
    disp = np.full((1, h, w, 1), 3.0, np.float32)
    seg = np.zeros((1, h, w, 19), np.float32)
    seg[..., 5] = 1.0  # constant class
    out = {"flow": flow, "disp": disp, "seg_logits": seg}
    made = write_predictions(out, str(tmp_path), ["x"], native_hw=(16, 64))
    assert len(made) == 3
    got_flow, valid = decode_kitti_flow(
        read_png16(str(tmp_path / "flow" / "x.png"))
    )
    assert got_flow.shape == (16, 64, 2)
    # width x4 -> u 2.0*4=8.0; height x2 -> v 1.0*2=2.0 (1/64 px quantization)
    np.testing.assert_allclose(got_flow[..., 0], 8.0, atol=1 / 32)
    np.testing.assert_allclose(got_flow[..., 1], 2.0, atol=1 / 32)
    from cerberusnet_tpu.data.encodings import decode_kitti_disparity

    got_disp, dvalid = decode_kitti_disparity(
        read_png16(str(tmp_path / "disp_0" / "x.png"))
    )
    np.testing.assert_allclose(got_disp, 12.0, atol=1 / 128)  # 3.0 * 4
    import cv2

    labels = cv2.imread(str(tmp_path / "semantic" / "x.png"),
                        cv2.IMREAD_GRAYSCALE)
    assert labels.shape == (16, 64)
    assert (labels == 17).all()  # trainId 5 -> labelId 17 (pole)
