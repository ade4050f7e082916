"""CLI entry-point tests (SURVEY.md §2 L6)."""

import json
import subprocess
import sys

import pytest

from cerberusnet_tpu import cli


class TestCli:
    def test_print_config(self, tmp_path, capsys):
        cfg_path = tmp_path / "c.json"
        cfg_path.write_text(json.dumps({"name": "x", "model": {"variant": "seg"}}))
        rc = cli.main(["--config", str(cfg_path), "--print-config"])
        assert rc == 0
        out = capsys.readouterr().out
        assert json.loads(out)["model"]["variant"] == "seg"

    def test_missing_config_flag(self):
        with pytest.raises(SystemExit):
            cli.main([])

    def test_infer_single_sample(self, tmp_path, capsys):
        """--infer writes raw npz + benchmark PNGs + panel for one sample."""
        import numpy as np

        from cerberusnet_tpu.data import io as data_io

        rng = np.random.default_rng(0)
        imgs = []
        for n in ("l", "r", "t"):
            p = tmp_path / f"{n}.png"
            data_io.write_image_u8(
                p, rng.integers(0, 255, (48, 64, 3), np.uint8)
            )
            imgs.append(str(p))
        cfg_path = tmp_path / "c.json"
        cfg_path.write_text(json.dumps({
            "model": {
                "variant": "cerberus",
                "encoder_channels": [8, 12, 16, 16, 16, 16],
                "est_channels": [16, 16, 12],
                "ctx_channels": [16, 16],
                "fpn_channels": 16,
                "corr_impl": "pure",
            },
            "data": {"dataset": "synthetic", "hw": [64, 64],
                     "synthetic_length": 2, "batch_size": 1},
            "train": {"num_data_devices": 1},
        }))
        out_dir = tmp_path / "preds"
        rc = cli.main(["--config", str(cfg_path), "--infer", ",".join(imgs),
                       "--infer-out", str(out_dir)])
        assert rc == 0
        assert (out_dir / "sample.npz").exists()
        assert (out_dir / "sample_panel.png").exists()
        assert (out_dir / "flow" / "sample.png").exists()
        arrs = np.load(out_dir / "sample.npz")
        assert arrs["flow"].shape == (64, 64, 2)
        assert arrs["seg_logits"].shape[-1] == 19

    def test_infer_wrong_image_count(self, tmp_path):
        cfg_path = tmp_path / "c.json"
        cfg_path.write_text(json.dumps({
            "model": {"variant": "seg",
                      "encoder_channels": [8, 12, 16, 16, 16, 16],
                      "fpn_channels": 16},
            "data": {"dataset": "synthetic", "hw": [64, 64],
                     "synthetic_length": 2, "batch_size": 1},
            "train": {"num_data_devices": 1},
        }))
        with pytest.raises(SystemExit):
            cli.main(["--config", str(cfg_path), "--infer", "a.png,b.png"])

    def test_ckpt_dir_override(self, tmp_path, capsys):
        cfg_path = tmp_path / "c.json"
        cfg_path.write_text(json.dumps({"train": {"ckpt_dir": "original"}}))
        cli.main(["--config", str(cfg_path), "--ckpt-dir", "/tmp/other",
                  "--print-config"])
        out = json.loads(capsys.readouterr().out)
        assert out["train"]["ckpt_dir"] == "/tmp/other"
