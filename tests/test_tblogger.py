"""TensorBoard event-writer tests (SURVEY.md §3 C18): the dependency-free
writer in utils/tblogger.py must produce files the REAL tensorboard reader
accepts — wire-format compatibility pinned by round-tripping through
tensorboard's EventAccumulator."""

import numpy as np
import pytest

from cerberusnet_tpu.utils.tblogger import TBLogger, crc32c, _masked_crc


class TestCRC32C:
    def test_known_vectors(self):
        # RFC 3720 / kernel test vectors
        assert crc32c(b"") == 0x00000000
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
        assert crc32c(b"\xff" * 32) == 0x62A8AB43

    def test_mask_matches_tfrecord_spec(self):
        # masked_crc = rot15(crc) + 0xa282ead8 (mod 2^32)
        crc = crc32c(b"123456789")
        expect = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert _masked_crc(b"123456789") == expect


@pytest.fixture()
def accumulator():
    try:
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )
    except Exception:
        pytest.skip("tensorboard package not available to verify against")
    return EventAccumulator


class TestRoundtrip:
    def test_scalars_read_back_by_real_tensorboard(self, tmp_path, accumulator):
        logdir = str(tmp_path / "tb")
        with TBLogger(logdir) as tb:
            for step in range(5):
                tb.scalar("loss/total", 1.0 / (step + 1), step)
            tb.scalars({"miou": 0.5, "flow_epe": 2.0}, step=7, prefix="eval/")

        acc = accumulator(logdir)
        acc.Reload()
        events = acc.Scalars("loss/total")
        assert [e.step for e in events] == list(range(5))
        np.testing.assert_allclose(
            [e.value for e in events], [1.0 / (s + 1) for s in range(5)], rtol=1e-6
        )
        assert acc.Scalars("eval/miou")[0].value == pytest.approx(0.5)
        assert acc.Scalars("eval/flow_epe")[0].step == 7

    def test_image_read_back(self, tmp_path, accumulator):
        logdir = str(tmp_path / "tb")
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (32, 48, 3), np.uint8)
        with TBLogger(logdir) as tb:
            tb.image("eval/panel", img, step=3)

        acc = accumulator(logdir)
        acc.Reload()
        imgs = acc.Images("eval/panel")
        assert len(imgs) == 1
        assert imgs[0].step == 3
        assert imgs[0].width == 48 and imgs[0].height == 32
        import cv2

        decoded = cv2.imdecode(
            np.frombuffer(imgs[0].encoded_image_string, np.uint8),
            cv2.IMREAD_COLOR,
        )
        np.testing.assert_array_equal(
            cv2.cvtColor(decoded, cv2.COLOR_BGR2RGB), img
        )

    def test_trainer_writes_tensorboard(self, tmp_path, accumulator):
        """train.tensorboard=True: fit() produces event files with loss
        scalars and the eval panel image (C18 parity with the reference's
        tensorboard logging)."""
        from tests.test_train_step import tiny_config
        from cerberusnet_tpu.train.trainer import Trainer

        cfg = tiny_config(ckpt_dir=str(tmp_path / "ckpt"), variant="seg")
        cfg.train.tensorboard = True
        cfg.train.log_every = 1
        cfg.data.eval_split = "val"
        t = Trainer(cfg)
        t.fit()

        import os

        logdir = str(tmp_path / "ckpt" / "tb")
        assert os.listdir(logdir)
        acc = accumulator(logdir)
        acc.Reload()
        tags = acc.Tags()
        assert "loss/total" in tags["scalars"]
        assert "miou" in tags["scalars"]
        assert "eval/panel" in tags["images"]
        assert all(np.isfinite(e.value) for e in acc.Scalars("loss/total"))

    def test_scalars_skips_non_numeric(self, tmp_path, accumulator):
        logdir = str(tmp_path / "tb")
        with TBLogger(logdir) as tb:
            tb.scalars({"a": 1.0, "b": "not-a-number"}, step=0)
        acc = accumulator(logdir)
        acc.Reload()
        assert acc.Scalars("a")[0].value == 1.0
        assert "b" not in acc.Tags()["scalars"]
