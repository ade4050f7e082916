"""Cross-framework fidelity test (SURVEY.md §7 'fidelity demonstrated as
... equivalence'): the flax CerberusNet and the architecture-equivalent
PyTorch mirror (tools/torch_baseline) produce numerically identical outputs
after weight transfer — which also certifies bench.py's vs_baseline
comparison as apples-to-apples."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import torch  # noqa: E402

from cerberusnet_tpu.models import CerberusNet  # noqa: E402
from tools.parity import transfer_cerberus  # noqa: E402
from tools.torch_baseline import TorchCerberus  # noqa: E402

TINY = dict(
    encoder_channels=(8, 12, 16, 16, 16, 16),
    est_channels=(16, 16, 12),
    ctx_channels=(16, 16),
    fpn_channels=16,
)


@pytest.fixture(scope="module")
def parity_pair():
    model = CerberusNet(corr_impl="pure", num_classes=7, **TINY)
    rng = np.random.RandomState(0)
    imgs = tuple(
        jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32) for _ in range(3)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)
    tmodel = TorchCerberus(
        enc=TINY["encoder_channels"],
        est=TINY["est_channels"],
        ctx=TINY["ctx_channels"],
        fpn=TINY["fpn_channels"],
        num_classes=7,
    ).eval()
    transfer_cerberus(variables, tmodel)
    return model, variables, tmodel, imgs


class TestTorchParity:
    def test_full_forward_matches(self, parity_pair):
        model, variables, tmodel, imgs = parity_pair
        jout = jax.jit(model.apply)(variables, *imgs)
        with torch.no_grad():
            tout = tmodel(
                *[torch.tensor(np.asarray(im)).permute(0, 3, 1, 2) for im in imgs]
            )
        for key, jkey in (("seg_logits", "seg_logits"), ("flow", "flow"),
                          ("disp", "disp")):
            tv = tout[key].permute(0, 2, 3, 1).numpy()
            jv = np.asarray(jout[jkey])
            err = np.abs(tv - jv).max()
            scale = max(np.abs(jv).max(), 1.0)
            assert err / scale < 2e-3, f"{key}: max rel err {err / scale}"

    def test_outputs_nontrivial(self, parity_pair):
        # guard against both sides degenerating to zeros
        model, variables, tmodel, imgs = parity_pair
        jout = jax.jit(model.apply)(variables, *imgs)
        assert float(jnp.abs(jout["seg_logits"]).max()) > 1e-3


class TestTorchImport:
    """torch -> flax weight import (tools/parity.py import_cerberus): a
    freshly-initialized TorchCerberus imported into flax matches the torch
    forward — the migration path for users bringing torch weights."""

    def test_import_matches_torch_forward(self):
        from tools.parity import import_cerberus

        torch.manual_seed(3)
        tmodel = TorchCerberus(
            enc=TINY["encoder_channels"],
            est=TINY["est_channels"],
            ctx=TINY["ctx_channels"],
            fpn=TINY["fpn_channels"],
            num_classes=7,
        ).eval()
        model = CerberusNet(corr_impl="pure", num_classes=7, **TINY)
        rng = np.random.RandomState(1)
        imgs = tuple(
            jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32) for _ in range(3)
        )
        template = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)
        variables = import_cerberus(tmodel, template)
        jout = jax.jit(model.apply)(variables, *imgs)
        with torch.no_grad():
            tout = tmodel(
                *[torch.tensor(np.asarray(im)).permute(0, 3, 1, 2) for im in imgs]
            )
        for key in ("seg_logits", "flow", "disp"):
            tv = tout[key].permute(0, 2, 3, 1).numpy()
            jv = np.asarray(jout[key], np.float32)
            scale = max(np.abs(tv).max(), 1e-3)
            assert np.abs(tv - jv).max() / scale < 2e-3, key

    def test_roundtrip_exact(self):
        """flax -> torch -> flax returns the original params bit-exactly
        (same permutes/flips, no arithmetic)."""
        from tools.parity import import_cerberus

        model = CerberusNet(corr_impl="pure", num_classes=7, **TINY)
        rng = np.random.RandomState(2)
        imgs = tuple(
            jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32) for _ in range(3)
        )
        variables = jax.jit(model.init)(jax.random.PRNGKey(4), *imgs)
        tmodel = TorchCerberus(
            enc=TINY["encoder_channels"],
            est=TINY["est_channels"],
            ctx=TINY["ctx_channels"],
            fpn=TINY["fpn_channels"],
            num_classes=7,
        ).eval()
        transfer_cerberus(variables, tmodel)
        back = import_cerberus(tmodel, variables)
        for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTrainerTorchImport:
    def test_cli_level_import(self, tmp_path):
        """Trainer.import_torch_weights loads a saved torch checkpoint and
        the resulting forward matches the torch mirror's."""
        from cerberusnet_tpu.train.config import (
            DataConfig,
            ExperimentConfig,
            ModelConfig,
            OptimConfig,
            TrainConfig,
        )
        from cerberusnet_tpu.train.trainer import Trainer

        tmodel = TorchCerberus(
            enc=TINY["encoder_channels"],
            est=TINY["est_channels"],
            ctx=TINY["ctx_channels"],
            fpn=TINY["fpn_channels"],
            num_classes=7,
        ).eval()
        ckpt = tmp_path / "ref.pt"
        torch.save({"state_dict": tmodel.state_dict()}, ckpt)

        cfg = ExperimentConfig(
            model=ModelConfig(variant="cerberus", corr_impl="pure",
                              num_classes=7, **{k: v for k, v in TINY.items()}),
            data=DataConfig(dataset="synthetic", hw=(64, 64), batch_size=1,
                            num_workers=1, synthetic_length=2, shuffle=False),
            optim=OptimConfig(lr=1e-3, warmup_steps=0, total_steps=10,
                              schedule="constant"),
            train=TrainConfig(epochs=1, num_data_devices=1),
        )
        tr = Trainer(cfg)
        tr.import_torch_weights(str(ckpt))

        rng = np.random.RandomState(5)
        img = rng.rand(1, 64, 64, 3).astype(np.float32)
        batch = {k: jnp.asarray(img) for k in ("left", "right", "temporal")}
        out = tr.forward({"params": tr.state.params}, batch)
        with torch.no_grad():
            t = torch.tensor(img).permute(0, 3, 1, 2)
            tout = tmodel(t, t, t)
        np.testing.assert_allclose(
            np.asarray(out["flow"], np.float32),
            tout["flow"].permute(0, 2, 3, 1).numpy(),
            atol=2e-3,
        )

    def test_rejects_non_joint_variant(self, tmp_path):
        from cerberusnet_tpu.train.config import (
            DataConfig,
            ExperimentConfig,
            ModelConfig,
            TrainConfig,
        )
        from cerberusnet_tpu.train.trainer import Trainer

        cfg = ExperimentConfig(
            model=ModelConfig(variant="seg",
                              encoder_channels=TINY["encoder_channels"],
                              fpn_channels=16),
            data=DataConfig(dataset="synthetic", hw=(64, 64), batch_size=1,
                            num_workers=1, synthetic_length=2),
            train=TrainConfig(epochs=1, num_data_devices=1),
        )
        tr = Trainer(cfg)
        with pytest.raises(ValueError):
            tr.import_torch_weights("whatever.pt")
