"""Int8 PTQ tests (SURVEY.md §3 C16 — the reference's TensorRT int8 deploy
option, rebuilt TPU-native in cerberusnet_tpu/quant/ptq.py).

Hardware note (measured on v5e, 2026-08-16): int8 convs only out-run bf16
at >=256 channels on this chip; the production CerberusNet configs stay
bf16 by default, and PTQ is the capability-parity path (validated here for
accuracy, export-compatibility, and the skip/strip options).
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from cerberusnet_tpu.models import CerberusNet
from cerberusnet_tpu.quant import (
    calibrate,
    quantize,
    quantized_apply,
    quantization_error,
)
from cerberusnet_tpu.quant.ptq import QUANT_COLLECTION


class TinyNet(nn.Module):
    """Conv / strided conv / dilated conv / ConvTranspose / 1x1 — covers
    every conv-attribute codepath the interceptor must honor."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(16, (3, 3), padding="SAME", name="c1")(x)
        x = nn.leaky_relu(x, 0.1)
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME", name="c2")(x)
        x = nn.leaky_relu(x, 0.1)
        x = nn.Conv(16, (3, 3), kernel_dilation=(2, 2), padding="SAME", name="c3")(x)
        x = nn.ConvTranspose(8, (4, 4), strides=(2, 2), name="up")(x)
        return nn.Conv(4, (1, 1), name="head")(x)


@pytest.fixture(scope="module")
def tiny():
    model = TinyNet()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 32, 32, 3), jnp.float32)
    variables = jax.jit(model.init)(key, x)
    return model, variables, x


class TestCalibrate:
    def test_collects_all_convs(self, tiny):
        model, variables, x = tiny
        scales = calibrate(model, variables, [(x,)])
        # 4 nn.Conv layers; ConvTranspose is not calibrated
        assert set(scales) == {("c1",), ("c2",), ("c3",), ("head",)}
        assert all(v > 0 for v in scales.values())

    def test_max_reduces_across_batches(self, tiny):
        model, variables, x = tiny
        s1 = calibrate(model, variables, [(x,)])
        s2 = calibrate(model, variables, [(x,), (x * 3.0,)])
        assert s2[("c1",)] == pytest.approx(3.0 * s1[("c1",)], rel=1e-5)
        # downstream scales grow too but at least never shrink
        assert all(s2[k] >= s1[k] * 0.999 for k in s1)


class TestQuantize:
    def test_int8_kernels_and_scales(self, tiny):
        model, variables, x = tiny
        scales = calibrate(model, variables, [(x,)])
        qv = quantize(variables, scales)
        q = qv[QUANT_COLLECTION]["c1"]
        assert q["kernel_q"].dtype == jnp.int8
        assert q["scale_w"].shape == (16,)  # per-output-channel
        # kernel reconstruction error bounded by one quantization step
        kern = variables["params"]["c1"]["kernel"]
        recon = q["kernel_q"].astype(jnp.float32) * q["scale_w"]
        assert float(jnp.max(jnp.abs(recon - kern))) <= float(jnp.max(q["scale_w"])) * 0.51

    def test_skip_and_strip(self, tiny):
        model, variables, x = tiny
        scales = calibrate(model, variables, [(x,)])
        qv = quantize(variables, scales, skip=("head",), strip=True)
        assert "head" not in qv[QUANT_COLLECTION]
        assert qv["params"]["c1"]["kernel"].shape == (0,)  # stripped
        assert qv["params"]["head"]["kernel"].shape != (0,)  # kept f32
        # stripped variables still run through the quantized path
        y = jax.jit(lambda v, x: quantized_apply(model, v, x))(qv, x)
        assert np.isfinite(np.asarray(y)).all()

    def test_original_variables_untouched(self, tiny):
        model, variables, x = tiny
        scales = calibrate(model, variables, [(x,)])
        quantize(variables, scales, strip=True)
        assert variables["params"]["c1"]["kernel"].shape == (3, 3, 3, 16)


class TestQuantizedApply:
    def test_close_to_f32(self, tiny):
        model, variables, x = tiny
        scales = calibrate(model, variables, [(x,)])
        qv = quantize(variables, scales)
        ref = jax.jit(model.apply)(variables, x)
        out = jax.jit(lambda v, x: quantized_apply(model, v, x))(qv, x)
        rel = float(
            jnp.linalg.norm((out - ref).ravel()) / jnp.linalg.norm(ref.ravel())
        )
        assert rel < 0.06, rel

    def test_simulate_matches_int8(self, tiny):
        model, variables, x = tiny
        scales = calibrate(model, variables, [(x,)])
        qv = quantize(variables, scales)
        out_i = jax.jit(lambda v, x: quantized_apply(model, v, x))(qv, x)
        out_s = jax.jit(
            lambda v, x: quantized_apply(model, v, x, simulate=True)
        )(qv, x)
        np.testing.assert_allclose(
            np.asarray(out_i), np.asarray(out_s), rtol=1e-4, atol=1e-4
        )

    def test_unsupported_conv_attrs_fall_back_to_float(self):
        """A calibrated Conv using features _int8_conv does not forward
        (a kernel mask here) must execute on the FLOAT path — bit-identical
        to the unquantized model — instead of silently dropping the
        attribute under quantization (ADVICE r1)."""

        class MaskedNet(nn.Module):
            @nn.compact
            def __call__(self, x):
                mask = jnp.ones((3, 3, 3, 8)).at[0, 0].set(0.0)
                return nn.Conv(
                    8, (3, 3), padding="SAME", mask=mask, name="c"
                )(x)

        model = MaskedNet()
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, 16, 16, 3), jnp.float32)
        variables = jax.jit(model.init)(key, x)
        scales = calibrate(model, variables, [(x,)])
        qv = quantize(variables, scales)
        assert "c" in qv[QUANT_COLLECTION]  # calibrated...
        ref = jax.jit(model.apply)(variables, x)
        out = jax.jit(lambda v, x: quantized_apply(model, v, x))(qv, x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_quantization_error_report(self, tiny):
        model, variables, x = tiny
        scales = calibrate(model, variables, [(x,)])
        qv = quantize(variables, scales)
        errs = quantization_error(model, variables, qv, (x,))
        assert set(errs) == {"out"} and 0 < errs["out"] < 0.06


class TestCerberusQuant:
    """End-to-end on the tiny 3-head joint model (CPU-sized)."""

    def test_fused_model_calibrates_fewer_convs(self):
        """Interception only sees nn.Conv calls: the fused estimator's raw
        lax convs are invisible to PTQ — quantize unfused models (same
        param tree; Trainer.export(quant='int8') switches automatically)."""
        kw = dict(
            encoder_channels=(8, 12, 16, 16, 16, 16),
            est_channels=(16, 16, 12),
            ctx_channels=(16, 16),
            fpn_channels=16,
            corr_impl="pure",
        )
        rng = np.random.RandomState(0)
        imgs = tuple(
            jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32) for _ in range(3)
        )
        mf = CerberusNet(fused=True, **kw)
        mu = CerberusNet(fused=False, **kw)
        v = jax.jit(mf.init)(jax.random.PRNGKey(0), *imgs)
        sf = calibrate(mf, v, [imgs])
        su = calibrate(mu, v, [imgs])
        assert len(su) > len(sf)  # unfused sees the estimator+pred convs too
        assert set(sf) <= set(su)

    def test_joint_model_quantizes(self):
        model = CerberusNet(
            encoder_channels=(8, 12, 16, 16, 16, 16),
            est_channels=(16, 16, 12),
            ctx_channels=(16, 16),
            fpn_channels=16,
            corr_impl="pure",
            fused=False,  # full conv coverage for PTQ (see test above)
        )
        rng = np.random.RandomState(0)
        imgs = tuple(
            jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32) for _ in range(3)
        )
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)
        scales = calibrate(model, variables, [imgs])
        qv = quantize(variables, scales)
        errs = quantization_error(model, variables, qv, imgs)
        assert errs["seg_logits"] < 0.2
        assert errs["flow"] < 0.35
        assert errs["disp"] < 0.35

    def test_quantized_export_roundtrip(self, tmp_path):
        """The int8 graph must serialize through the same AOT path as bf16
        (SURVEY.md §4.3) — quantized deploy artifacts for the C++ runner."""
        from cerberusnet_tpu.export import (
            export_inference,
            load_exported,
            save_exported,
        )

        model = TinyNet()
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, 32, 32, 3), jnp.float32)
        variables = jax.jit(model.init)(key, x)
        scales = calibrate(model, variables, [(x,)])
        qv = quantize(variables, scales, strip=True)

        def infer(x):
            return quantized_apply(model, qv, x)

        exported = export_inference(infer, (x,))
        out_dir = save_exported(exported, str(tmp_path / "q"))
        back = load_exported(out_dir)
        np.testing.assert_allclose(
            np.asarray(back.call(x)),
            np.asarray(jax.jit(infer)(x)),
            rtol=1e-5,
            atol=1e-5,
        )


class TestRawLaxKnobRebuild:
    """Knobs that route convs through raw lax ops (fused estimator, s2d /
    padded-stem encoder) are invisible to flax interception; the QAT/PTQ
    paths must rebuild in the interceptable form (trainer.py)."""

    def test_s2d_levels_hides_encoder_convs_from_calibration(self):
        kw = dict(
            encoder_channels=(8, 12, 16, 16, 16, 16),
            est_channels=(16, 16, 12),
            ctx_channels=(16, 16),
            fpn_channels=16,
            corr_impl="pure",
            fused=False,
        )
        rng = np.random.RandomState(0)
        imgs = tuple(
            jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32) for _ in range(3)
        )
        m_plain = CerberusNet(**kw)
        m_s2d = CerberusNet(s2d_levels=2, **kw)
        v = jax.jit(m_plain.init)(jax.random.PRNGKey(0), *imgs)
        s_plain = calibrate(m_plain, v, [imgs])
        s_s2d = calibrate(m_s2d, v, [imgs])  # same param tree (test_models)
        # the first two levels' 6 convs are raw-lax under s2d_levels=2
        assert len(s_plain) - len(s_s2d) == 6
        assert set(s_s2d) <= set(s_plain)

    def test_qat_trainer_resets_raw_lax_knobs(self, tmp_path):
        from cerberusnet_tpu.train.config import (
            DataConfig,
            ExperimentConfig,
            LossConfig,
            ModelConfig,
            OptimConfig,
            TrainConfig,
        )
        from cerberusnet_tpu.train.trainer import Trainer

        cfg = ExperimentConfig(
            name="qat-knob-reset",
            model=ModelConfig(
                variant="cerberus",
                encoder_channels=(8, 12, 16, 16, 16, 16),
                est_channels=(16, 16, 12),
                ctx_channels=(16, 16),
                fpn_channels=16,
                corr_impl="pure",
                s2d_levels=2,
                fused=True,
                entry_grad="phase",
                pallas_levels=2,
            ),
            data=DataConfig(
                dataset="synthetic", hw=(64, 64), batch_size=1,
                num_workers=1, synthetic_length=1, shuffle=False,
            ),
            optim=OptimConfig(lr=1e-3, warmup_steps=0, total_steps=10,
                              schedule="constant"),
            loss=LossConfig(),
            train=TrainConfig(epochs=1, qat=True, log_every=1000,
                              num_data_devices=1),
        )
        tr = Trainer(cfg)
        assert tr.config.model.fused is False
        assert tr.config.model.s2d_levels == 0
        assert tr.config.model.s2d_stem is False
        assert tr.config.model.stem_pad_channels == 0
        # entry_grad='phase' routes level-entry convs through raw-lax
        # conv_s2_phase, invisible to flax quant interception (ADVICE r3)
        assert tr.config.model.entry_grad == "auto"
        # pallas_levels convs are custom calls — likewise uninterceptable
        assert tr.config.model.pallas_levels == 0
