"""End-to-end migration demo for reference (PyTorch) users.

Simulates the full path a CerberusNet user takes into this framework:

  1. a "reference" PyTorch checkpoint appears (here: the architecture-
     equivalent torch mirror with random weights, saved with torch.save);
  2. `Trainer.import_torch_weights` loads it through the weight-transfer
     layer (tools/parity.py — exact permutes/flips, no arithmetic);
  3. the imported model is evaluated, used for single-sample inference,
     and exported as a deployment artifact (StableHLO, consumable by the
     C++ PJRT runner in native/pjrt_runner/).

Run (CPU is fine):
  PYTHONPATH=. python examples/migrate_from_torch.py /tmp/cerberus_migrate
"""

import os
import sys

import jax

# Deciding CPU-vs-TPU by probing (jax.default_backend()) initializes the
# backend and can hang or raise when the axon tunnel is down — demos run
# on CPU unless the TPU is explicitly requested.
if os.environ.get("CERBERUS_EXAMPLE_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")


TINY = dict(
    encoder_channels=(8, 12, 16, 16, 16, 16),
    est_channels=(16, 16, 12),
    ctx_channels=(16, 16),
    fpn_channels=16,
)


def main(out_dir="/tmp/cerberus_migrate"):
    import numpy as np
    import torch

    from cerberusnet_tpu.data import io as data_io
    from cerberusnet_tpu.train.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        OptimConfig,
        TrainConfig,
    )
    from cerberusnet_tpu.train.trainer import Trainer
    from tools.torch_baseline import TorchCerberus

    os.makedirs(out_dir, exist_ok=True)

    # -- 1. the "reference checkpoint" ------------------------------------
    tmodel = TorchCerberus(
        enc=TINY["encoder_channels"], est=TINY["est_channels"],
        ctx=TINY["ctx_channels"], fpn=TINY["fpn_channels"], num_classes=19,
    )
    ckpt = os.path.join(out_dir, "reference.pt")
    torch.save({"state_dict": tmodel.state_dict()}, ckpt)
    print(f"[1] saved simulated reference checkpoint: {ckpt}")

    # -- 2. import into the TPU-native trainer ----------------------------
    cfg = ExperimentConfig(
        name="migrated",
        model=ModelConfig(variant="cerberus", corr_impl="pure", **TINY),
        data=DataConfig(dataset="synthetic", hw=(64, 64), batch_size=2,
                        num_workers=1, synthetic_length=4, shuffle=False,
                        eval_split="val"),
        optim=OptimConfig(lr=1e-4, warmup_steps=0, total_steps=10,
                          schedule="constant"),
        train=TrainConfig(epochs=1, num_data_devices=1),
    )
    trainer = Trainer(cfg)
    trainer.import_torch_weights(ckpt)
    print("[2] weights imported through the torch mirror")

    # -- 3. evaluate / infer / export the imported model ------------------
    metrics = trainer.evaluate()
    print(f"[3a] evaluate(): { {k: round(float(v), 4) for k, v in metrics.items()} }")

    rng = np.random.default_rng(0)
    img_paths = []
    for n in ("left", "right", "temporal"):
        p = os.path.join(out_dir, f"{n}.png")
        data_io.write_image_u8(p, rng.integers(0, 255, (64, 64, 3), np.uint8))
        img_paths.append(p)
    made = trainer.predict_images(
        dict(zip(trainer.example_keys, img_paths)),
        os.path.join(out_dir, "preds"),
    )
    print(f"[3b] predict_images wrote {len(made)} files")

    artifact = trainer.export(os.path.join(out_dir, "artifact"))
    print(f"[3c] exported deployment artifact: {artifact}")
    print("migration demo complete")


if __name__ == "__main__":
    main(*sys.argv[1:])
