"""Config system tests (SURVEY.md §3 C14, §6.6)."""

import pytest

from cerberusnet_tpu.train.config import ExperimentConfig, ModelConfig


class TestConfig:
    def test_json_roundtrip(self, tmp_path):
        cfg = ExperimentConfig(name="exp1")
        cfg.model.variant = "flow"
        cfg.data.batch_size = 8
        cfg.optim.lr = 3e-4
        path = str(tmp_path / "cfg.json")
        cfg.to_json(path)
        back = ExperimentConfig.from_json(path)
        assert back.name == "exp1"
        assert back.model.variant == "flow"
        assert back.data.batch_size == 8
        assert back.optim.lr == 3e-4
        assert tuple(back.model.encoder_channels) == tuple(cfg.model.encoder_channels)

    def test_from_json_string(self):
        cfg = ExperimentConfig.from_json('{"model": {"variant": "seg"}}')
        assert cfg.model.variant == "seg"

    def test_unknown_key_rejected(self):
        with pytest.raises(ValueError):
            ExperimentConfig.from_json('{"model": {"nope": 1}}')

    def test_unknown_top_level_section_rejected(self):
        # a typo'd section ("trian") must not be silently ignored
        with pytest.raises(ValueError):
            ExperimentConfig.from_json('{"trian": {"epochs": 5}}')

    def test_dtype_property(self):
        import jax.numpy as jnp

        assert ModelConfig(dtype="bfloat16").jnp_dtype == jnp.bfloat16
        assert ModelConfig().jnp_dtype == jnp.float32
