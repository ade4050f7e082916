"""Train-step integration tests (SURVEY.md §5.6): loss decreases when
overfitting one batch; checkpoint save/resume roundtrip (§6.4)."""

import jax
import numpy as np
import pytest

from cerberusnet_tpu.data.synthetic import SyntheticPerceptionDataset
from cerberusnet_tpu.data.loader import DataLoader
from cerberusnet_tpu.train.config import (
    DataConfig,
    ExperimentConfig,
    LossConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from cerberusnet_tpu.train.trainer import Trainer


def tiny_config(ckpt_dir="", variant="cerberus", epochs=1):
    return ExperimentConfig(
        name="tiny-test",
        model=ModelConfig(
            variant=variant,
            encoder_channels=(8, 12, 16, 16, 16, 16),
            est_channels=(16, 16, 12),
            ctx_channels=(16, 16),
            fpn_channels=16,
            corr_impl="pure",
        ),
        data=DataConfig(
            dataset="synthetic",
            hw=(64, 64),
            batch_size=2,
            num_workers=1,
            synthetic_length=4,
            shuffle=False,
        ),
        optim=OptimConfig(lr=2e-3, warmup_steps=0, total_steps=100, schedule="constant"),
        loss=LossConfig(),
        train=TrainConfig(
            epochs=epochs,
            ckpt_dir=ckpt_dir,
            log_every=1000,
            num_data_devices=1,
        ),
    )


@pytest.fixture(scope="module")
def trainer():
    return Trainer(tiny_config())


class TestTrainStep:
    def test_loss_decreases_overfitting_one_batch(self, trainer):
        ds = SyntheticPerceptionDataset(length=2, hw=(64, 64))
        batch = next(iter(DataLoader(ds, batch_size=2, num_workers=1)))
        first = None
        last = None
        for i in range(12):
            comps = trainer.train_step(batch)
            total = float(comps["total"])
            assert np.isfinite(total)
            if first is None:
                first = total
            last = total
        assert last < first, f"loss did not decrease: {first} -> {last}"

    def test_components_present(self, trainer):
        ds = SyntheticPerceptionDataset(length=2, hw=(64, 64))
        batch = next(iter(DataLoader(ds, batch_size=2, num_workers=1)))
        comps = trainer.train_step(batch)
        assert {"seg", "flow", "disp", "total"} <= set(comps)

    def test_evaluate_returns_metrics(self, trainer):
        out = trainer.evaluate()
        for key in ("miou", "flow_epe", "disp_mae"):
            assert key in out and np.isfinite(out[key])


class TestCheckpointing:
    def test_save_and_resume(self, tmp_path):
        cfg = tiny_config(ckpt_dir=str(tmp_path / "ckpt"), variant="seg")
        t1 = Trainer(cfg)
        t1.fit()
        step1 = int(t1.state.step)
        assert step1 > 0

        t2 = Trainer(cfg)  # resume=True by default
        assert int(t2.state.step) == step1
        p1 = jax.tree.leaves(t1.state.params)[0]
        p2 = jax.tree.leaves(t2.state.params)[0]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


class TestUncertaintyWeighting:
    def test_logvars_learn(self):
        cfg = tiny_config()
        cfg.loss.uncertainty_weighting = True
        t = Trainer(cfg)
        assert "__task_uncertainty__" in t.state.params
        ds = SyntheticPerceptionDataset(length=2, hw=(64, 64))
        batch = next(iter(DataLoader(ds, batch_size=2, num_workers=1)))
        before = {
            k: float(v) for k, v in t.state.params["__task_uncertainty__"].items()
        }
        for _ in range(3):
            comps = t.train_step(batch)
        assert np.isfinite(float(comps["total"]))
        after = {
            k: float(v) for k, v in t.state.params["__task_uncertainty__"].items()
        }
        assert any(abs(after[k] - before[k]) > 1e-6 for k in before)


class TestTrainerExport:
    def test_export_roundtrip(self, trainer, tmp_path):
        import jax.numpy as jnp

        from cerberusnet_tpu.export.aot import load_exported

        out_dir = trainer.export(str(tmp_path / "artifact"))
        back = load_exported(out_dir)
        outs = back.call(
            *[jnp.zeros((1, 64, 64, 3), jnp.float32) for _ in range(3)]
        )
        shapes = [tuple(o.shape) for o in outs]
        assert (1, 64, 64, 19) in shapes
        assert (1, 64, 64, 2) in shapes
        assert (1, 64, 64, 1) in shapes
