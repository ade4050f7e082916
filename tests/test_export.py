"""AOT export tests (SURVEY.md §5.8): serialize the inference graph, reload
the artifact, and compare outputs with the live jit path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberusnet_tpu.export import export_inference, load_exported, save_exported
from cerberusnet_tpu.export.aot import export_cerberus
from cerberusnet_tpu.models import CerberusNet

TINY = dict(
    encoder_channels=(8, 12, 16, 16, 16, 16),
    est_channels=(16, 16, 12),
    ctx_channels=(16, 16),
    fpn_channels=16,
    corr_impl="pure",
)


class TestExport:
    def test_roundtrip_simple_fn(self, tmp_path):
        def fn(x, y):
            return jnp.tanh(x) @ y

        args = (jnp.ones((4, 8)), jnp.ones((8, 2)))
        exported = export_inference(fn, args)
        out_dir = save_exported(exported, str(tmp_path / "art"))
        back = load_exported(out_dir)
        np.testing.assert_allclose(back.call(*args), fn(*args), rtol=1e-6)

    def test_manifest_written(self, tmp_path):
        import json
        import os

        def fn(x):
            return x * 2

        exported = export_inference(fn, (jnp.zeros((2, 3)),))
        out_dir = save_exported(exported, str(tmp_path / "art"))
        with open(os.path.join(out_dir, "manifest.json")) as f:
            manifest = json.load(f)
        assert manifest["inputs"][0]["shape"] == [2, 3]
        assert manifest["platforms"] == ["cpu"]

    def test_cerberus_export_matches_jit(self, tmp_path):
        model = CerberusNet(**TINY)
        rng = np.random.RandomState(0)
        imgs = tuple(jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32) for _ in range(3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)

        out_dir = export_cerberus(
            variables, model, hw=(64, 64), dtype=jnp.float32,
            out_dir=str(tmp_path / "cerb"),
        )
        back = load_exported(out_dir)
        seg, flow, disp = back.call(*imgs)
        live = jax.jit(model.apply)(variables, *imgs)
        np.testing.assert_allclose(seg, live["seg_logits"], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(flow, live["flow"], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(disp, live["disp"], rtol=1e-5, atol=1e-5)

    def test_trainer_stacked_export(self, tmp_path):
        """Producer-stacked export (VERDICT r3 item 9): ONE (3B,H,W,3)
        input, same outputs as the separate-frame artifact."""
        import json
        import os

        from cerberusnet_tpu.train.config import ExperimentConfig
        from cerberusnet_tpu.train.trainer import Trainer

        cfg = ExperimentConfig.from_dict(
            {
                "name": "stacked-export",
                "model": {
                    "variant": "cerberus",
                    "encoder_channels": [8, 12, 16, 16, 16, 16],
                    "est_channels": [16, 16, 12],
                    "ctx_channels": [16, 16],
                    "fpn_channels": 16,
                    "corr_impl": "pure",
                },
                "data": {
                    "dataset": "synthetic",
                    "hw": [64, 64],
                    "batch_size": 1,
                    "num_workers": 1,
                    "synthetic_length": 2,
                },
                "optim": {"lr": 1e-3, "total_steps": 4, "warmup_steps": 0,
                          "schedule": "constant"},
                "train": {"epochs": 1, "num_data_devices": 1},
            }
        )
        tr = Trainer(cfg)
        sep = tr.export(str(tmp_path / "sep"))
        stk = tr.export(str(tmp_path / "stk"), stacked=True)
        with open(os.path.join(stk, "manifest.json")) as f:
            man = json.load(f)
        assert len(man["inputs"]) == 1
        assert man["inputs"][0]["shape"] == [3, 64, 64, 3]

        rng = np.random.RandomState(0)
        imgs = [rng.rand(1, 64, 64, 3).astype(np.float32) for _ in range(3)]
        out_sep = load_exported(sep).call(*imgs)
        out_stk = load_exported(stk).call(np.concatenate(imgs, 0))
        for a, b in zip(out_sep, out_stk):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
