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

    def test_nondefault_num_classes_labels_in_range(self):
        """model.num_classes != 19 on the synthetic dataset: labels must
        stay inside the model's class range — out-of-range labels made CE
        silently NaN (take_along_axis OOB) before the trainer forwarded
        num_classes into SyntheticPerceptionDataset."""
        cfg = tiny_config()
        cfg.model.num_classes = 7
        t = Trainer(cfg)
        batch = next(iter(DataLoader(t.dataset, batch_size=2, num_workers=1)))
        labels = np.asarray(batch["seg_labels"])
        assert labels.max() < 7
        comps = t.train_step(batch)
        assert np.isfinite(float(comps["seg"]))

    def test_evaluate_returns_metrics(self, trainer):
        out = trainer.evaluate()
        for key in ("miou", "flow_epe", "disp_mae"):
            assert key in out and np.isfinite(out[key])

    def test_evaluate_counts_every_sample_with_partial_tail(self):
        """len(dataset) % batch_size != 0: the final partial batch must be
        padded-and-masked, not dropped — the accumulated flow pixel count
        equals dataset_size x H x W exactly (VERDICT r1 W5)."""
        cfg = tiny_config()
        cfg.data.synthetic_length = 5  # batch 2 -> batches of 2, 2, 1
        t = Trainer(cfg)

        from cerberusnet_tpu.train.metrics import MetricState

        loader = t._eval_loader(None)
        assert len(loader) == 3
        metrics = MetricState.zeros(cfg.model.num_classes)
        for batch in loader:
            batch = t._prep_eval_batch(batch)
            metrics = t._eval_step(t.state, metrics, batch)
        h, w = cfg.data.hw
        # synthetic flow_valid is all-ones -> count == 5 * H * W, not 4 * H * W
        assert float(metrics.flow_sums[2]) == 5 * h * w
        out = metrics.compute()
        assert np.isfinite(out["flow_epe"])


class TestBf16Gradients:
    """optim.grads_dtype='bfloat16' (round 5, VERDICT r4 item 3): the
    backward runs on bf16 tensors with f32 master weights. Not
    math-identical — these tests pin mechanism (params still f32, training
    still converges on an overfit batch); the accuracy gate is the
    held-out evidence protocol (configs/cerberus_evidence_bf16g.json)."""

    def test_loss_decreases_and_params_stay_f32(self):
        import dataclasses

        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, grads_dtype="bfloat16")
        )
        tr = Trainer(cfg)
        ds = SyntheticPerceptionDataset(length=2, hw=(64, 64))
        batch = next(iter(DataLoader(ds, batch_size=2, num_workers=1)))
        first = last = None
        for _ in range(12):
            comps = tr.train_step(batch)
            total = float(comps["total"])
            assert np.isfinite(total)
            first = total if first is None else first
            last = total
        assert last < first, f"bf16-grads loss did not decrease: {first} -> {last}"
        for leaf in jax.tree.leaves(tr.state.params):
            assert leaf.dtype == np.float32, leaf.dtype

    def test_invalid_grads_dtype_rejected(self):
        import dataclasses

        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, grads_dtype="fp8")
        )
        with pytest.raises(ValueError, match="grads_dtype"):
            Trainer(cfg)._make_train_step()


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


class TestEMA:
    def test_ema_follows_update_rule(self):
        cfg = tiny_config(variant="seg")
        cfg.optim.ema_decay = 0.9
        t = Trainer(cfg)
        ds = SyntheticPerceptionDataset(length=2, hw=(64, 64))
        batch = next(iter(DataLoader(ds, batch_size=2, num_workers=1)))
        p0 = jax.tree.map(np.asarray, t.state.params)
        t.train_step(batch)
        p1 = jax.tree.map(np.asarray, t.state.params)
        ema1 = jax.tree.map(np.asarray, t.state.ema_params)
        # ema_1 = 0.9 * p0 + 0.1 * p1 (ema initialized to p0)
        leaf = lambda tree: jax.tree.leaves(tree)[0]
        np.testing.assert_allclose(
            leaf(ema1), 0.9 * leaf(p0) + 0.1 * leaf(p1), rtol=1e-5, atol=1e-7
        )

    def test_ema_off_by_default(self, trainer):
        assert trainer.state.ema_params is None

    def test_eval_uses_ema(self):
        cfg = tiny_config(variant="seg")
        cfg.optim.ema_decay = 0.5
        t = Trainer(cfg)
        out = t.evaluate()
        assert np.isfinite(out["miou"])


class TestGradAccumulation:
    def test_params_update_every_k_steps(self):
        cfg = tiny_config(variant="seg")
        cfg.optim.accum_steps = 2
        cfg.optim.grad_clip = 0.0
        t = Trainer(cfg)
        ds = SyntheticPerceptionDataset(length=2, hw=(64, 64))
        batch = next(iter(DataLoader(ds, batch_size=2, num_workers=1)))
        leaf = lambda: np.asarray(jax.tree.leaves(t.state.params)[0]).copy()
        p0 = leaf()
        t.train_step(batch)
        p1 = leaf()  # micro-step 1: accumulate only, no param change
        np.testing.assert_array_equal(p0, p1)
        t.train_step(batch)
        p2 = leaf()  # micro-step 2: optimizer applies the averaged grad
        assert np.abs(p2 - p1).max() > 0


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

    def test_export_int8_roundtrip(self, trainer, tmp_path):
        """quant='int8': calibrated PTQ artifact (the TRT-int8 analogue,
        SURVEY.md §3 C16) loads and produces finite, close-to-f32 outputs."""
        import jax.numpy as jnp

        from cerberusnet_tpu.export.aot import load_exported

        f32_dir = trainer.export(str(tmp_path / "f32"))
        q_dir = trainer.export(str(tmp_path / "int8"), quant="int8")
        imgs = [jnp.ones((1, 64, 64, 3), jnp.float32) * 0.25 for _ in range(3)]
        ref = load_exported(f32_dir).call(*imgs)
        out = load_exported(q_dir).call(*imgs)
        for r, q in zip(ref, out):
            q = np.asarray(q, np.float32)
            r = np.asarray(r, np.float32)
            assert np.isfinite(q).all()
            rel = np.linalg.norm((q - r).ravel()) / (np.linalg.norm(r.ravel()) + 1e-9)
            assert rel < 0.5, rel  # untrained weights: just sanity-bound it


def test_flatten_optimizer_matches_per_leaf():
    """optim.flatten=True (optax.flatten over the raveled param vector) is
    math-identical to the per-leaf optimizer for elementwise updates
    (train/trainer.py build_optimizer)."""
    import jax.numpy as jnp
    import numpy as np
    import optax

    from cerberusnet_tpu.train.config import OptimConfig
    from cerberusnet_tpu.train.trainer import build_optimizer

    params = {
        "a": jnp.ones((3, 4)),
        "b": {"k": jnp.arange(6.0).reshape(2, 3), "bias": jnp.zeros(3)},
    }
    grads = jax.tree.map(lambda p: p * 0.1 + 0.01, params)
    for opt in ("adamw", "adam", "sgd"):
        t0 = build_optimizer(OptimConfig(optimizer=opt))
        t1 = build_optimizer(OptimConfig(optimizer=opt, flatten=True))
        s0, s1 = t0.init(params), t1.init(params)
        p0, p1 = params, params
        for _ in range(3):
            u0, s0 = t0.update(grads, s0, p0)
            p0 = optax.apply_updates(p0, u0)
            u1, s1 = t1.update(grads, s1, p1)
            p1 = optax.apply_updates(p1, u1)
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )
