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

    def test_ckpt_dir_override(self, tmp_path, capsys):
        cfg_path = tmp_path / "c.json"
        cfg_path.write_text(json.dumps({"train": {"ckpt_dir": "original"}}))
        cli.main(["--config", str(cfg_path), "--ckpt-dir", "/tmp/other",
                  "--print-config"])
        out = json.loads(capsys.readouterr().out)
        assert out["train"]["ckpt_dir"] == "/tmp/other"
