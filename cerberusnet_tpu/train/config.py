"""Experiment configuration (SURVEY.md §3 C14, §6.6).

A single dataclass tree serialized to/from JSON; every [BASELINE:L7-L11]
benchmark row is expressible as one config (see configs/*.json). Mirrors the
reference's per-experiment JSON config capability with typed fields.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass
class ModelConfig:
    variant: str = "cerberus"
    # cerberus | flow | stereo | seg | dcv_flow | dcv_stereo | cerberus_dcv
    # | raft | raft_stereo | cerberus_raft
    encoder_channels: Tuple[int, ...] = (16, 32, 64, 96, 128, 196)
    num_classes: int = 19
    max_disp_full: int = 96
    flow_max_disp: int = 4
    est_channels: Tuple[int, ...] = (128, 128, 96, 64, 32)
    ctx_channels: Tuple[int, ...] = (128, 128, 128, 96, 64, 32)
    fpn_channels: int = 96
    seg_head: str = "fpn"  # fpn | aspp (DeepLab-style dilated pyramid)
    corr_impl: Optional[str] = None  # None=auto | pure | pallas
    # Fused DenseNet-estimator + prediction convs (identical math and param
    # tree; each stack component convolved once — measured 1.6x on v5e).
    fused: bool = True
    # Cost-volume assembly order (ops/correlation.py _stack_maps) and
    # estimator output-stack distribution (models/common.py) — bit-identical
    # perf knobs, A/B'd in tools/ab_forward.py.
    corr_stack: str = "major"
    distribute_outputs: bool = True
    upfeat_impl: str = "subpixel"  # subpixel | convt (models/common.py)
    upsample_impl: str = "resize"  # resize | phase (models/common.py)
    batched_encoder: bool = True  # one B*3 encoder pass (r3 A/B winner)
    s2d_stem: bool = False  # space-to-depth level-1 conv (encoder.py)
    stem_pad_channels: int = 0  # zero-pad image channels for the stem conv
    s2d_levels: int = 0  # first N encoder levels fully in s2d space
    entry_grad: str = "auto"  # auto | phase stride-2 input-grad (common.py)
    pallas_levels: int = 0  # first N encoder levels as fused Pallas kernels
    pallas_grad: str = "xla"  # xla | pallas backward for the fused levels
    est_input: str = "concat"  # concat | split estimator feed (models/flow.py; concat won the r3 race)
    dtype: str = "float32"  # compute dtype: float32 | bfloat16
    # RAFT family (models/raft.py) — iterative all-pairs refinement:
    raft_iters: int = 12
    raft_radius: int = 4
    raft_fdim: int = 128
    raft_hdim: int = 96
    raft_cdim: int = 64
    raft_corr_levels: int = 4
    raft_level: int = 3  # operating resolution 1/2^level
    raft_unroll: bool = False  # unroll iterations instead of nn.scan
    raft_lookup: str = "onehot"  # onehot | gather volume lookup (raft.py; onehot promoted after the 12-58x r4f race)

    @property
    def jnp_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


@dataclasses.dataclass
class DataConfig:
    dataset: str = "synthetic"
    # synthetic | kitti | cityscapes | sintel | flyingchairs | flyingthings3d
    root: str = ""
    split: str = "training"
    render_pass: str = "clean"  # sintel: clean | final
    eval_split: Optional[str] = None  # e.g. "val" for cityscapes
    hw: Tuple[int, int] = (512, 1024)  # [BASELINE:L2] working resolution
    batch_size: int = 4
    num_workers: int = 4
    shuffle: bool = True
    synthetic_length: int = 64
    synthetic_sparse: bool = False
    # Augmentations (device-side, SURVEY.md §4.4); crop_hw None = off.
    crop_hw: Optional[Tuple[int, int]] = None
    flip_lr_prob: float = 0.0
    brightness: float = 0.0
    contrast: float = 0.0
    # Random zoom: discrete scale set (e.g. [0.8, 1.0, 1.25]); each scale
    # crops crop_hw/s and resizes to crop_hw with GT value rescaling.
    # Requires crop_hw. Empty = off.
    scales: Tuple[float, ...] = ()


@dataclasses.dataclass
class OptimConfig:
    optimizer: str = "adamw"  # adamw | adam | sgd
    lr: float = 1e-4
    weight_decay: float = 4e-4
    schedule: str = "cosine"  # cosine | poly | onecycle | constant
    warmup_steps: int = 100
    total_steps: int = 10000
    grad_clip: float = 1.0
    poly_power: float = 0.9
    # Gradient accumulation: optimizer applies the mean of every
    # accum_steps micro-batch gradients (optax.MultiSteps) — large effective
    # batches without the HBM of a large per-step batch.
    accum_steps: int = 1
    # Run the optimizer on one raveled flat vector (optax.flatten) — math-
    # identical for elementwise optimizers, collapses the per-leaf update
    # op chains. Hardware A/B (chain r3e, b2 512x1024 full train step):
    # 44.78 vs 46.09 ms/frame — a consistent ~1.3 ms/frame win, so it is
    # the default. Changes the opt-state pytree (flat), so set False to
    # resume pre-round-3 checkpoints.
    flatten: bool = True
    # Exponential moving average of params; 0.0 = off. When on, eval and
    # export use the EMA weights (the deployment-quality weights).
    ema_decay: float = 0.0
    # "bfloat16": compute gradients w.r.t. bf16-cast params — the whole
    # backward runs on bf16 tensors and the materialized gradient tree is
    # bf16 (half the backward copy/materialization bytes); grads are cast
    # back to f32 before the (f32 master-weight) optimizer update. NOT
    # math-identical — the round-5 convergence gate is the 20-epoch
    # held-out evidence protocol (configs/cerberus_evidence_bf16g.json),
    # not an equality test. "float32" (default) keeps the r3/r4 behavior.
    grads_dtype: str = "float32"


@dataclasses.dataclass
class LossConfig:
    seg_weight: float = 1.0
    flow_weight: float = 1.0
    disp_weight: float = 1.0
    focal_gamma: Optional[float] = None
    robust_q: Optional[float] = None
    photometric_weight: float = 0.0
    smoothness_weight: float = 0.0
    # Region-Mutual-Information mix for the seg term (SURVEY.md §3 C11
    # 'focal/RMI variants'): seg = (1-w)*CE + w*RMI; 0.0 = plain CE.
    rmi_weight: float = 0.0
    # Kendall-style homoscedastic task weighting (SURVEY.md §9.6 variant):
    # learnable per-task log-variances replace the fixed weights.
    uncertainty_weighting: bool = False
    # RAFT sequence-loss decay over refinement iterates (losses.py
    # raft_sequence_loss); only used by iterative models (variant 'raft').
    seq_gamma: float = 0.8

    @property
    def weights(self):
        return {
            "seg": self.seg_weight,
            "flow": self.flow_weight,
            "disp": self.disp_weight,
        }


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 10
    seed: int = 0
    log_every: int = 50
    eval_every_epochs: int = 1
    ckpt_dir: str = ""
    resume: bool = True
    keep_checkpoints: int = 3
    # Checkpoint cadence: a full Orbax save costs seconds over a remote
    # backend; short-epoch runs should not pay it every epoch. The final
    # epoch always checkpoints.
    ckpt_every_epochs: int = 1
    # Failure detection/recovery (SURVEY.md §6.3): when the train loss goes
    # non-finite, restore the last checkpoint and continue (abort after
    # max_nan_recoveries). Costs one host sync per step — off by default.
    recover_on_nan: bool = False
    max_nan_recoveries: int = 3
    # Successful steps after which the recovery counter resets — so a few
    # transient NaNs spread over a long run don't accumulate to an abort
    # (ADVICE r1). 0 disables the reset.
    nan_recovery_reset_steps: int = 200
    num_data_devices: int = 0  # 0 = all visible devices
    num_spatial_devices: int = 1
    remat: bool = False  # jax.checkpoint the forward (HBM <-> FLOPs trade)
    # Sanitizers (SURVEY.md §6.2): jax_debug_nans aborts on the first
    # non-finite value; interpret_kernels runs every Pallas kernel in
    # interpreter mode (bounds-checked, CPU-exact) regardless of backend.
    debug_nans: bool = False
    interpret_kernels: bool = False
    # TensorBoard event files (dependency-free writer, utils/tblogger.py)
    # under <ckpt_dir>/tb: step losses, eval metrics, prediction panels.
    tensorboard: bool = False
    # Quantization-aware training (quant/qat.py): train/eval with int8
    # fake-quant convs (TRT-style fixed ranges, calibrated on construction
    # from qat_calib_batches batches; re-calibrated after resume). Forces
    # the unfused estimator formulation (interception sees nn.Conv only;
    # param trees are identical). export(quant='int8') then reuses the
    # trained ranges instead of fresh PTQ calibration.
    qat: bool = False
    qat_calib_batches: int = 2


@dataclasses.dataclass
class ExperimentConfig:
    name: str = "experiment"
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    def to_json(self, path: Optional[str] = None) -> str:
        s = json.dumps(dataclasses.asdict(self), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s

    @classmethod
    def from_json(cls, path_or_str: str) -> "ExperimentConfig":
        if path_or_str.lstrip().startswith("{"):
            raw = json.loads(path_or_str)
        else:
            with open(path_or_str) as f:
                raw = json.load(f)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "ExperimentConfig":
        def build(dc, d):
            fields = {f.name: f for f in dataclasses.fields(dc)}
            kwargs = {}
            for k, v in d.items():
                if k not in fields:
                    raise ValueError(f"unknown config key {k!r} for {dc.__name__}")
                ft = fields[k].type
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[k] = v
            return dc(**kwargs)

        known = {"name", "model", "data", "optim", "loss", "train"}
        unknown = set(raw) - known
        if unknown:
            raise ValueError(
                f"unknown top-level config section(s) {sorted(unknown)} "
                f"(expected {sorted(known)})"
            )
        return cls(
            name=raw.get("name", "experiment"),
            model=build(ModelConfig, raw.get("model", {})),
            data=build(DataConfig, raw.get("data", {})),
            optim=build(OptimConfig, raw.get("optim", {})),
            loss=build(LossConfig, raw.get("loss", {})),
            train=build(TrainConfig, raw.get("train", {})),
        )
