"""End-to-end demo: train tiny CerberusNet on synthetic data, evaluate,
visualize predictions, export an AOT artifact.

Run (CPU is fine):
  PYTHONPATH=. python examples/demo_end_to_end.py /tmp/cerberus_demo
"""

import os
import sys

import jax
import numpy as np

# Probing jax.default_backend() initializes the backend and can hang or
# raise when the axon tunnel is down — CPU unless explicitly requested.
if os.environ.get("CERBERUS_EXAMPLE_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")


def main(out_dir="/tmp/cerberus_demo"):
    from cerberusnet_tpu.data.loader import DataLoader
    from cerberusnet_tpu.data.synthetic import SyntheticPerceptionDataset
    from cerberusnet_tpu.export.aot import export_cerberus
    from cerberusnet_tpu.train.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        OptimConfig,
        TrainConfig,
    )
    from cerberusnet_tpu.train.trainer import Trainer
    from cerberusnet_tpu.utils import visualization as vis
    from cerberusnet_tpu.data import io as data_io

    os.makedirs(out_dir, exist_ok=True)
    cfg = ExperimentConfig(
        name="demo",
        model=ModelConfig(
            variant="cerberus",
            encoder_channels=(8, 12, 16, 16, 16, 16),
            est_channels=(16, 16, 12),
            ctx_channels=(16, 16),
            fpn_channels=16,
            corr_impl=None,  # auto: pallas on TPU, pure on CPU
        ),
        data=DataConfig(
            dataset="synthetic", hw=(128, 256), batch_size=2,
            num_workers=2, synthetic_length=8,
        ),
        optim=OptimConfig(lr=1e-3, warmup_steps=0, schedule="constant",
                          total_steps=100),
        train=TrainConfig(epochs=2, ckpt_dir=os.path.join(out_dir, "ckpt"),
                          log_every=2, num_data_devices=1),
    )
    trainer = Trainer(cfg)
    trainer.fit()
    print("metrics:", trainer.evaluate())

    # visualize one prediction
    batch = next(iter(DataLoader(trainer.dataset, batch_size=1, num_workers=1)))
    prep = trainer.preprocess(batch)
    out = jax.jit(trainer.forward)({"params": trainer.state.params}, prep)
    panel = vis.summary_panel(
        {
            "image": np.asarray(batch["left"][0]),
            "seg": np.asarray(out["seg_logits"][0].argmax(-1)),
            "flow": np.asarray(out["flow"][0]),
            "disp": np.asarray(out["disp"][0, ..., 0]),
        }
    )
    panel_path = os.path.join(out_dir, "predictions.png")
    data_io.write_image_u8(panel_path, panel)
    print("wrote", panel_path)

    # AOT export
    art = export_cerberus(
        {"params": trainer.state.params}, trainer.model,
        hw=tuple(cfg.data.hw), dtype=cfg.model.jnp_dtype,
        out_dir=os.path.join(out_dir, "export"),
    )
    print("exported AOT artifact to", art)


if __name__ == "__main__":
    main(*sys.argv[1:])
