"""RAFT anytime inference: one set of weights, any iteration count.

The RAFT update block is weight-tied, so the param tree is independent of
the iteration count (models/raft.py). That gives a latency/accuracy dial
at DEPLOY time with no retraining: construct RAFTFlowNet with fewer (or
more) iters than training used and apply the SAME params — fewer iters for
a low-latency stream, more for offline quality. This demo trains a tiny
model briefly at iters=4, then runs inference at iters 1/2/4/8 and shows
the per-count sequence error against GT (monotone improvement is the
expected RAFT behavior once trained; a freshly-initialized model only
demonstrates the mechanism).

Run (CPU is fine):
  PYTHONPATH=. python examples/raft_anytime_inference.py
"""

import os

import jax
import numpy as np

# Probing jax.default_backend() initializes the backend and can hang or
# raise when the axon tunnel is down — CPU unless explicitly requested.
if os.environ.get("CERBERUS_EXAMPLE_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")


def main():

    from cerberusnet_tpu.data.loader import DataLoader
    from cerberusnet_tpu.models.raft import RAFTFlowNet
    from cerberusnet_tpu.train.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        OptimConfig,
        TrainConfig,
    )
    from cerberusnet_tpu.train.trainer import Trainer

    tiny = dict(
        encoder_channels=(8, 12, 16, 16, 16, 16),
        fdim=16, hdim=12, cdim=8, corr_levels=2, radius=2,
    )
    cfg = ExperimentConfig(
        name="raft_anytime",
        model=ModelConfig(
            variant="raft",
            encoder_channels=tiny["encoder_channels"],
            raft_fdim=tiny["fdim"],
            raft_hdim=tiny["hdim"],
            raft_cdim=tiny["cdim"],
            raft_corr_levels=tiny["corr_levels"],
            raft_radius=tiny["radius"],
            raft_iters=4,
        ),
        data=DataConfig(dataset="synthetic", hw=(64, 64), batch_size=2,
                        num_workers=1, synthetic_length=2, shuffle=False),
        optim=OptimConfig(lr=1e-3, schedule="constant", total_steps=1000),
        train=TrainConfig(epochs=1, log_every=1000, num_data_devices=1),
    )
    trainer = Trainer(cfg)
    batch = next(iter(DataLoader(trainer.dataset, batch_size=2, num_workers=1)))
    print("training 20 steps at iters=4 ...")
    for step in range(20):
        comps = trainer.train_step(dict(batch))
        if step % 5 == 0:
            print(f"  step {step}: flow seq loss {float(comps['flow']):.4f}")

    params = {"params": trainer.state.params}
    prep = trainer.preprocess(batch)  # uint8 -> normalized model inputs
    gt = np.asarray(batch["flow_gt"])
    for iters in (1, 2, 4, 8):
        model = RAFTFlowNet(iters=iters, **tiny)  # same params, new trace
        out = jax.jit(model.apply)(params, prep["left"], prep["temporal"])
        epe = float(
            np.sqrt(((np.asarray(out["flow"]) - gt) ** 2).sum(-1)).mean()
        )
        print(f"inference iters={iters}: full-res EPE {epe:.3f} px")


if __name__ == "__main__":
    main()
