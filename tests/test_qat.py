"""QAT tests (quant/qat.py): STE fake-quant correctness, EMA range
tracking, trainability (loss decreases THROUGH the fake-quant graph), and
the finalize -> ptq.quantized_apply handoff that makes QAT'd weights ship
through the existing int8 deploy path."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax
import pytest

from cerberusnet_tpu.quant import (
    calibrate,
    finalize,
    init_ema,
    qat_apply,
    quantized_apply,
    update_ema,
)
from cerberusnet_tpu.quant.qat import EMA_COLLECTION, _ste_round_clip


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(16, (3, 3), padding="SAME", name="c1")(x)
        x = nn.leaky_relu(x, 0.1)
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME", name="c2")(x)
        x = nn.leaky_relu(x, 0.1)
        return nn.Conv(4, (1, 1), name="head")(x)


@pytest.fixture(scope="module")
def tiny():
    model = TinyNet()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3), jnp.float32)
    variables = jax.jit(model.init)(key, x)
    return model, variables, x


class TestSTE:
    def test_fake_quant_values(self):
        x = jnp.asarray([0.0, 0.4, 1.0, -2.0, 200.0])
        scale = jnp.asarray(1.0)
        q = _ste_round_clip(x, scale)
        np.testing.assert_allclose(q, [0.0, 0.0, 1.0, -2.0, 127.0])

    def test_gradient_is_identity_in_range(self):
        g = jax.grad(lambda x: jnp.sum(_ste_round_clip(x, jnp.asarray(0.1))))(
            jnp.asarray([0.33, -0.71])
        )
        np.testing.assert_allclose(g, [1.0, 1.0])


class TestQATForward:
    def test_close_to_float_and_observes_ranges(self, tiny):
        model, variables, x = tiny
        ref = model.apply(variables, x)
        scales = calibrate(model, variables, [(x,)])
        qvars = init_ema(variables, scales)
        out, observed = qat_apply(model, qvars, x)
        # int8 fake-quant error on a random tiny net: small but nonzero
        rel = float(
            jnp.linalg.norm(out - ref) / jnp.maximum(jnp.linalg.norm(ref), 1e-9)
        )
        assert 0 < rel < 0.1, rel
        flat = jax.tree.leaves(observed)
        assert len(flat) == 3  # c1, c2, head

    def test_runs_without_ema_seed(self, tiny):
        model, variables, x = tiny
        out, observed = qat_apply(model, variables, x)
        assert jnp.isfinite(out).all()


class TestEMA:
    def test_update_moves_toward_observed(self, tiny):
        model, variables, x = tiny
        scales = calibrate(model, variables, [(x,)])
        qvars = init_ema(variables, scales)
        _, observed = qat_apply(model, qvars, x * 2.0)  # ranges grew
        updated = update_ema(qvars, observed, momentum=0.5)
        before = qvars[EMA_COLLECTION]["c1"]["in_absmax"]
        after = updated[EMA_COLLECTION]["c1"]["in_absmax"]
        obs = np.asarray(observed["c1"]["in_absmax"]).reshape(())
        np.testing.assert_allclose(after, 0.5 * before + 0.5 * obs, rtol=1e-6)

    def test_unobserved_entries_survive(self, tiny):
        """An EMA entry for a conv that did not appear in this step's
        observations must keep its trained range."""
        model, variables, x = tiny
        scales = calibrate(model, variables, [(x,)])
        qvars = init_ema(variables, scales)
        _, observed = qat_apply(model, qvars, x)
        pruned = {k: v for k, v in observed.items() if k != "head"}
        updated = update_ema(qvars, pruned, momentum=0.5)
        np.testing.assert_allclose(
            updated[EMA_COLLECTION]["head"]["in_absmax"],
            qvars[EMA_COLLECTION]["head"]["in_absmax"],
        )

    def test_adopts_unseeded_convs(self, tiny):
        model, variables, x = tiny
        _, observed = qat_apply(model, variables, x)
        updated = update_ema(variables, observed)
        assert float(updated[EMA_COLLECTION]["c1"]["in_absmax"]) > 0


class TestQATTraining:
    def test_loss_decreases_through_fake_quant(self, tiny):
        model, variables, x = tiny
        target = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 4))
        scales = calibrate(model, variables, [(x,)])
        state = init_ema(variables, scales)
        tx = optax.adam(3e-3)
        opt = tx.init(state["params"])

        @jax.jit
        def step(params, ema, opt):
            def loss_fn(p):
                out, obs = qat_apply(model, {"params": p,
                                             EMA_COLLECTION: ema}, x)
                return jnp.mean((out - target) ** 2), obs

            (loss, obs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            upd, opt = tx.update(grads, opt)
            return optax.apply_updates(params, upd), obs, opt, loss

        params, ema = state["params"], state[EMA_COLLECTION]
        first = last = None
        for i in range(30):
            params, obs, opt, loss = step(params, ema, opt)
            ema = update_ema({EMA_COLLECTION: ema}, obs)[EMA_COLLECTION]
            first = float(loss) if first is None else first
            last = float(loss)
        assert last < 0.7 * first, (first, last)

    def test_gradients_reach_every_conv(self, tiny):
        model, variables, x = tiny
        scales = calibrate(model, variables, [(x,)])
        qvars = init_ema(variables, scales)

        def loss_fn(p):
            out, _ = qat_apply(
                model, {"params": p, EMA_COLLECTION: qvars[EMA_COLLECTION]}, x
            )
            return jnp.sum(out ** 2)

        grads = jax.grad(loss_fn)(qvars["params"])
        for leaf in jax.tree.leaves(grads):
            assert float(jnp.max(jnp.abs(leaf))) > 0


class TestTrainerQAT:
    def _cfg(self, tmp, qat=True):
        from cerberusnet_tpu.train.config import (
            DataConfig,
            ExperimentConfig,
            ModelConfig,
            OptimConfig,
            TrainConfig,
        )

        return ExperimentConfig(
            name="qat-test",
            model=ModelConfig(
                variant="cerberus",
                encoder_channels=(8, 12, 16, 16, 16, 16),
                est_channels=(16, 16, 12),
                ctx_channels=(16, 16),
                fpn_channels=16,
                corr_impl="pure",
            ),
            data=DataConfig(dataset="synthetic", hw=(64, 64), batch_size=2,
                            num_workers=1, synthetic_length=4, shuffle=False),
            optim=OptimConfig(lr=1e-3, warmup_steps=0, total_steps=20,
                              schedule="constant"),
            train=TrainConfig(epochs=1, log_every=1000, num_data_devices=1,
                              qat=qat, qat_calib_batches=1),
        )

    def test_qat_trainer_fits_and_exports_int8(self, tmp_path):
        from cerberusnet_tpu.train.trainer import Trainer

        tr = Trainer(self._cfg(tmp_path))
        assert tr.config.model.fused is False  # forced for interception
        assert tr._qat_ema is not None
        logs = tr.fit()
        losses = [v for k, v in logs[-1].items() if k.startswith("loss_")]
        assert losses and all(np.isfinite(v) for v in losses)
        # int8 export must reuse the trained ranges (no fresh calibration)
        out = tr.export(str(tmp_path / "artifact"), quant="int8")
        assert (tmp_path / "artifact" / "model.mlir").exists()

    def test_torch_import_recalibrates_ranges(self, tmp_path):
        """import_torch_weights under QAT must re-calibrate the activation
        ranges — construction-time calibration saw the random-init
        weights."""
        import torch

        from cerberusnet_tpu.train.trainer import Trainer
        from tools.torch_baseline import TorchCerberus

        cfg = self._cfg(tmp_path)
        tr = Trainer(cfg)
        before = jax.tree.map(lambda x: np.asarray(x), tr._qat_ema)
        tmodel = TorchCerberus(
            enc=(8, 12, 16, 16, 16, 16), est=(16, 16, 12), ctx=(16, 16),
            fpn=16, num_classes=cfg.model.num_classes,
        )
        with torch.no_grad():  # make the imported weights clearly different
            for p in tmodel.parameters():
                p.mul_(3.0)
        ckpt = tmp_path / "ref.pt"
        torch.save(tmodel.state_dict(), ckpt)
        tr.import_torch_weights(str(ckpt))
        after = tr._qat_ema
        changed = [
            float(abs(a - b))
            for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
        ]
        assert max(changed) > 0, "QAT ranges unchanged after torch import"

    def test_qat_eval_runs_fake_quant(self, tmp_path):
        from cerberusnet_tpu.train.trainer import Trainer

        cfg = self._cfg(tmp_path)
        tr = Trainer(cfg)
        ref = Trainer(self._cfg(tmp_path, qat=False))
        # same seed -> same params; outputs must DIFFER (fake-quant active)
        batch = {
            k: jnp.ones((1, 64, 64, 3), jnp.float32) * 0.3
            for k in ("left", "right", "temporal")
        }
        a = tr.forward({"params": tr.state.params}, batch)
        b = ref.forward({"params": ref.state.params}, batch)
        diff = float(jnp.max(jnp.abs(a["flow"] - b["flow"])))
        assert diff > 0, "QAT forward identical to float forward"


class TestFinalize:
    def test_finalize_feeds_quantized_apply(self, tiny):
        model, variables, x = tiny
        scales = calibrate(model, variables, [(x,)])
        state = init_ema(variables, scales)
        qvars = finalize(state)
        assert EMA_COLLECTION not in qvars
        int8_out = quantized_apply(model, qvars, x, simulate=True)
        fake_out, _ = qat_apply(model, state, x)
        # same ranges, same rounding: the deployed int8 graph must agree
        # with what training simulated — up to round-to-nearest boundary
        # flips from ptq computing scales in f64 vs qat's f32 (a handful of
        # elements land exactly on .5 and round differently)
        a, b = np.asarray(int8_out), np.asarray(fake_out)
        exact = np.isclose(a, b, atol=1e-4).mean()
        assert exact > 0.97, exact
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        assert rel < 0.02, rel

    def test_finalize_requires_ema(self, tiny):
        model, variables, x = tiny
        with pytest.raises(ValueError):
            finalize(variables)
