"""Trainer framework (SURVEY.md §3 C13, §4.1/§4.2).

One donated, jitted train step = forward (3 heads) + joint loss + backward
(re-enters the Pallas correlation VJPs) + optimizer update, all in a single
XLA program. Data parallelism comes from sharding annotations over a
('data', 'spatial') mesh — XLA SPMD inserts the gradient psum over ICI
(SURVEY.md §6.8); there is no DDP-style wrapper object.

Aux subsystems (SURVEY.md §6):
  * checkpoint/resume: Orbax — full train state (params, opt state, step),
    retained per-epoch, restored on construction when present (§6.4)
  * metrics/logging: on-device MetricState accumulators; scalars to CSV +
    stdout (§6.5)
  * tracing: `Trainer.profile(path)` wraps steps in jax.profiler.trace (§6.1)
"""

from __future__ import annotations

import csv
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from cerberusnet_tpu.data.augment import AugmentConfig, augment_batch
from cerberusnet_tpu.data.loader import DataLoader, make_preprocess_fn
from cerberusnet_tpu.models import (
    CerberusDCV,
    CerberusNet,
    DCVFlowNet,
    DCVStereoNet,
    FlowNet,
    SegNet,
    StereoNet,
)
from cerberusnet_tpu.parallel import make_mesh, replicated_sharding, shard_batch
from cerberusnet_tpu.train import losses as losses_lib
from cerberusnet_tpu.train.config import ExperimentConfig, ModelConfig
from cerberusnet_tpu.train.metrics import MetricState


def build_model(cfg: ModelConfig):
    """ModelConfig -> (flax module, forward(variables, batch) -> output dict).

    The forward adapter normalizes every variant to the CerberusNet output
    dict so losses/metrics are variant-agnostic."""
    common = dict(
        encoder_channels=tuple(cfg.encoder_channels),
        corr_impl=cfg.corr_impl,
        dtype=cfg.jnp_dtype,
    )
    if cfg.variant != "seg":  # seg has no estimator convs
        common["fused"] = cfg.fused
    if cfg.variant == "cerberus_dcv":
        model = CerberusDCV(
            num_classes=cfg.num_classes,
            flow_max_disp=cfg.flow_max_disp,
            est_channels=tuple(cfg.est_channels),
            ctx_channels=tuple(cfg.ctx_channels),
            fpn_channels=cfg.fpn_channels,
            seg_head=cfg.seg_head,
            **common,
        )

        def forward(variables, batch):
            return model.apply(
                variables, batch["left"], batch["right"], batch["temporal"]
            )

        example_keys = ("left", "right", "temporal")
    elif cfg.variant == "cerberus":
        model = CerberusNet(
            num_classes=cfg.num_classes,
            max_disp_full=cfg.max_disp_full,
            flow_max_disp=cfg.flow_max_disp,
            est_channels=tuple(cfg.est_channels),
            ctx_channels=tuple(cfg.ctx_channels),
            fpn_channels=cfg.fpn_channels,
            seg_head=cfg.seg_head,
            corr_stack=cfg.corr_stack,
            distribute_outputs=cfg.distribute_outputs,
            upfeat_impl=cfg.upfeat_impl,
            upsample_impl=cfg.upsample_impl,
            batched_encoder=cfg.batched_encoder,
            s2d_stem=cfg.s2d_stem,
            stem_pad_channels=cfg.stem_pad_channels,
            s2d_levels=cfg.s2d_levels,
            entry_grad=cfg.entry_grad,
            pallas_levels=cfg.pallas_levels,
            pallas_grad=cfg.pallas_grad,
            est_input=cfg.est_input,
            **common,
        )

        def forward(variables, batch):
            return model.apply(
                variables, batch["left"], batch["right"], batch["temporal"]
            )

        example_keys = ("left", "right", "temporal")
    elif cfg.variant == "flow":
        model = FlowNet(
            max_disp=cfg.flow_max_disp,
            est_channels=tuple(cfg.est_channels),
            ctx_channels=tuple(cfg.ctx_channels),
            **common,
        )

        def forward(variables, batch):
            return model.apply(variables, batch["left"], batch["temporal"])

        example_keys = ("left", "temporal")
    elif cfg.variant == "raft":
        from cerberusnet_tpu.models.raft import RAFTFlowNet

        model = RAFTFlowNet(
            encoder_channels=tuple(cfg.encoder_channels),
            level=cfg.raft_level,
            fdim=cfg.raft_fdim,
            hdim=cfg.raft_hdim,
            cdim=cfg.raft_cdim,
            corr_levels=cfg.raft_corr_levels,
            radius=cfg.raft_radius,
            iters=cfg.raft_iters,
            unroll_iters=cfg.raft_unroll,
            lookup_impl=cfg.raft_lookup,
            dtype=cfg.jnp_dtype,
        )

        def forward(variables, batch):
            return model.apply(variables, batch["left"], batch["temporal"])

        example_keys = ("left", "temporal")
    elif cfg.variant == "raft_stereo":
        from cerberusnet_tpu.models.raft import RAFTStereoNet

        model = RAFTStereoNet(
            encoder_channels=tuple(cfg.encoder_channels),
            level=cfg.raft_level,
            fdim=cfg.raft_fdim,
            hdim=cfg.raft_hdim,
            cdim=cfg.raft_cdim,
            corr_levels=cfg.raft_corr_levels,
            radius=cfg.raft_radius,
            iters=cfg.raft_iters,
            unroll_iters=cfg.raft_unroll,
            lookup_impl=cfg.raft_lookup,
            dtype=cfg.jnp_dtype,
        )

        def forward(variables, batch):
            return model.apply(variables, batch["left"], batch["right"])

        example_keys = ("left", "right")
    elif cfg.variant == "cerberus_raft":
        from cerberusnet_tpu.models.raft import CerberusRAFT

        model = CerberusRAFT(
            encoder_channels=tuple(cfg.encoder_channels),
            num_classes=cfg.num_classes,
            level=cfg.raft_level,
            fdim=cfg.raft_fdim,
            hdim=cfg.raft_hdim,
            cdim=cfg.raft_cdim,
            corr_levels=cfg.raft_corr_levels,
            radius=cfg.raft_radius,
            iters=cfg.raft_iters,
            unroll_iters=cfg.raft_unroll,
            lookup_impl=cfg.raft_lookup,
            fpn_channels=cfg.fpn_channels,
            seg_head=cfg.seg_head,
            dtype=cfg.jnp_dtype,
        )

        def forward(variables, batch):
            return model.apply(
                variables, batch["left"], batch["right"], batch["temporal"]
            )

        example_keys = ("left", "right", "temporal")
    elif cfg.variant == "dcv_flow":
        model = DCVFlowNet(
            max_disp=cfg.flow_max_disp,
            est_channels=tuple(cfg.est_channels),
            ctx_channels=tuple(cfg.ctx_channels),
            **common,
        )

        def forward(variables, batch):
            return model.apply(variables, batch["left"], batch["temporal"])

        example_keys = ("left", "temporal")
    elif cfg.variant == "dcv_stereo":
        model = DCVStereoNet(
            est_channels=tuple(cfg.est_channels),
            ctx_channels=tuple(cfg.ctx_channels),
            **common,
        )

        def forward(variables, batch):
            return model.apply(variables, batch["left"], batch["right"])

        example_keys = ("left", "right")
    elif cfg.variant == "stereo":
        model = StereoNet(
            max_disp_full=cfg.max_disp_full,
            est_channels=tuple(cfg.est_channels),
            ctx_channels=tuple(cfg.ctx_channels),
            **common,
        )

        def forward(variables, batch):
            return model.apply(variables, batch["left"], batch["right"])

        example_keys = ("left", "right")
    elif cfg.variant == "seg":
        model = SegNet(
            encoder_channels=tuple(cfg.encoder_channels),
            num_classes=cfg.num_classes,
            fpn_channels=cfg.fpn_channels,
            seg_head=cfg.seg_head,
            dtype=cfg.jnp_dtype,
        )

        def forward(variables, batch):
            return {"seg_logits": model.apply(variables, batch["left"])}

        example_keys = ("left",)
    else:
        raise ValueError(f"unknown model variant {cfg.variant!r}")
    return model, forward, example_keys


def build_optimizer(cfg):
    if cfg.schedule in ("cosine", "poly") and cfg.warmup_steps >= cfg.total_steps:
        raise ValueError(
            f"optim.warmup_steps ({cfg.warmup_steps}) must be < "
            f"optim.total_steps ({cfg.total_steps}) for the "
            f"{cfg.schedule!r} schedule (decay phase would be empty)"
        )
    if cfg.schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, cfg.warmup_steps, cfg.total_steps
        )
    elif cfg.schedule == "onecycle":
        # RAFT-family policy: linear ramp to peak then linear anneal
        sched = optax.linear_onecycle_schedule(cfg.total_steps, cfg.lr)
    elif cfg.schedule == "poly":
        sched = optax.polynomial_schedule(
            cfg.lr, cfg.lr * 1e-3, cfg.poly_power, cfg.total_steps - cfg.warmup_steps,
            transition_begin=cfg.warmup_steps,
        )
    else:
        sched = cfg.lr
    if cfg.optimizer == "adamw":
        tx = optax.adamw(sched, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "adam":
        tx = optax.adam(sched)
    elif cfg.optimizer == "sgd":
        tx = optax.sgd(sched, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    if getattr(cfg, "flatten", False):
        # One flat-vector update instead of ~100 per-leaf elementwise chains:
        # adamw/adam/sgd are elementwise, so ravel-then-update is math-
        # identical while collapsing the optimizer's XLA op count ~leafcount-
        # fold — on this backend every device op carries wall overhead
        # beyond its busy time (tools/overhead_diag.py), so op count shows
        # up directly in train-step wall time. Changes the opt-state pytree
        # (flat), so flip it only on fresh runs or matching checkpoints.
        tx = optax.flatten(tx)
    if getattr(cfg, "accum_steps", 1) > 1:
        # Gradient accumulation: optimizer state carries the running mean of
        # micro-batch grads; params update once every accum_steps calls.
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


class TrainState(train_state.TrainState):
    # EMA of params (None when optim.ema_decay == 0). Saved/restored with
    # the rest of the state by Orbax; eval/export prefer it when present.
    ema_params: Any = None


class Trainer:
    def __init__(self, config: ExperimentConfig, dataset=None, eval_dataset=None):
        self.config = config
        if config.train.debug_nans:
            jax.config.update("jax_debug_nans", True)
        if config.train.interpret_kernels and config.model.corr_impl is None:
            # force the pure (interpretable, bounds-exact) op path
            config.model.corr_impl = "pure"
        if config.train.qat and (
            getattr(config.model, "fused", False)
            or config.model.s2d_levels
            or config.model.s2d_stem
            or config.model.stem_pad_channels
            or config.model.entry_grad == "phase"
            or config.model.pallas_levels
        ):
            # QAT fake-quants convs via flax interception, which cannot see
            # raw-lax convs: the fused estimator AND the s2d/padded-stem
            # encoder forms (encoder.py) compute through lax directly. All
            # of these are param-tree-identical to the nn.Conv layout
            # (tests/test_fused_estimator.py, tests/test_models.py), so the
            # QAT graph simply rebuilds in the interceptable form.
            config.model.fused = False
            config.model.s2d_levels = 0
            config.model.s2d_stem = False
            config.model.stem_pad_channels = 0
            config.model.entry_grad = "auto"
            config.model.pallas_levels = 0
        if getattr(config.model, "pallas_levels", 0) and (
            config.train.num_spatial_devices > 1
            or config.train.num_data_devices > 1
        ):
            # The fused Pallas level kernel sees only its local H-shard and
            # cannot halo-exchange across shards (spatial), and a
            # pallas_call has no GSPMD partitioning rule, so under a >1
            # data mesh XLA would force a gather/replicate around it.
            # The plain conv path lets GSPMD shard/halo everything.
            # Identical math either way; single-device training and all
            # inference/serving surfaces keep the fused kernels.
            config.model.pallas_levels = 0
        self.model, self.forward, self.example_keys = build_model(config.model)
        self.tx = build_optimizer(config.optim)
        self.mesh = make_mesh(
            config.train.num_data_devices, config.train.num_spatial_devices
        )
        n_spatial = self.mesh.shape["spatial"]
        if n_spatial > 1:
            # Spatial (H) sharding is only numerically safe while EVERY
            # pyramid level keeps >= 1 real row per shard. Below that, GSPMD
            # pads shards and the fused-estimator partial-sum formulation
            # returns silently wrong values at the padded rows (measured on
            # the 8-fake-device mesh: level-5 flow off by >100% relative at
            # H_level=2, n_spatial=4; exact once H_level >= n_spatial).
            # Refuse loudly instead.
            min_level_h = config.data.hw[0] // (
                2 ** len(config.model.encoder_channels)
            )
            if min_level_h < n_spatial:
                raise ValueError(
                    f"num_spatial_devices={n_spatial} exceeds the coarsest "
                    f"pyramid level height {min_level_h} (input H "
                    f"{config.data.hw[0]} / 2^{len(config.model.encoder_channels)}); "
                    f"spatial sharding would be numerically wrong at the "
                    f"coarse levels — use H >= {64 * n_spatial} or fewer "
                    f"spatial devices"
                )
        self.preprocess = make_preprocess_fn(
            out_hw=tuple(config.data.hw), dtype=config.model.jnp_dtype
        )
        d = config.data
        self.augment_config = AugmentConfig(
            crop_hw=tuple(d.crop_hw) if d.crop_hw else None,
            flip_lr_prob=d.flip_lr_prob,
            brightness=d.brightness,
            contrast=d.contrast,
            scales=tuple(d.scales),
        )
        self._aug_rng = jax.random.PRNGKey(config.train.seed + 1)
        self.dataset = dataset if dataset is not None else self._build_dataset()
        if eval_dataset is None and config.data.eval_split:
            eval_dataset = self._build_dataset(split=config.data.eval_split)
        self.eval_dataset = eval_dataset
        self.state = self._create_state()
        self._ckpt_mgr = self._make_ckpt_mgr()
        if self._ckpt_mgr and config.train.resume:
            self._maybe_restore()
        self._qat_ema = None
        if config.train.qat:
            self._setup_qat()
        self._train_step = self._make_train_step()
        self._eval_step = self._make_eval_step()
        self.history: list = []

    # -- construction -------------------------------------------------------

    def _build_dataset(self, split=None):
        d = self.config.data
        split = split if split is not None else d.split
        if d.dataset == "synthetic":
            from cerberusnet_tpu.data.synthetic import SyntheticPerceptionDataset

            return SyntheticPerceptionDataset(
                length=d.synthetic_length,
                hw=tuple(d.hw),
                # Labels must live in the model's class range — a 19-class
                # default against a smaller model head makes CE silently NaN
                # (out-of-range take_along_axis).
                num_classes=self.config.model.num_classes,
                sparse=d.synthetic_sparse,
                seed=1 if split == "val" else 0,
            )
        if d.dataset == "kitti":
            from cerberusnet_tpu.data.kitti import Kitti2015Dataset

            return Kitti2015Dataset(d.root, split)
        if d.dataset == "cityscapes":
            from cerberusnet_tpu.data.cityscapes import CityscapesDataset

            return CityscapesDataset(d.root, split)
        if d.dataset == "sintel":
            from cerberusnet_tpu.data.flow_datasets import SintelDataset

            return SintelDataset(d.root, split, render_pass=d.render_pass)
        if d.dataset == "flyingchairs":
            from cerberusnet_tpu.data.flow_datasets import FlyingChairsDataset

            return FlyingChairsDataset(d.root, split)
        if d.dataset == "flyingthings3d":
            from cerberusnet_tpu.data.flow_datasets import FlyingThings3DDataset

            return FlyingThings3DDataset(d.root, split)
        raise ValueError(f"unknown dataset {d.dataset!r}")

    def _calib_batches(self, batch_size: int, n: int):
        """First ``n`` preprocessed batches as model-input tuples (shared by
        QAT range calibration and int8 PTQ export)."""
        loader = DataLoader(self.dataset, batch_size=batch_size, num_workers=1)
        batches = []
        for i, b in enumerate(loader):
            if i >= n:
                break
            prep = self.preprocess(b)
            batches.append(
                tuple(
                    prep[k].astype(self.config.model.jnp_dtype)
                    for k in self.example_keys
                )
            )
        return batches

    def _calibrate_qat_ranges(self):
        """Per-conv activation absmaxes on the CURRENT params -> EMA tree."""
        from cerberusnet_tpu.quant import calibrate
        from cerberusnet_tpu.quant.qat import EMA_COLLECTION, init_ema

        cfg = self.config
        batches = self._calib_batches(
            cfg.data.batch_size, cfg.train.qat_calib_batches
        )
        params = dict(self.state.params)
        params.pop("__task_uncertainty__", None)
        scales = calibrate(self.model, {"params": params}, batches)
        print(f"[trainer] QAT: calibrated {len(scales)} conv ranges")
        return init_ema({}, scales)[EMA_COLLECTION]

    def _setup_qat(self):
        """Calibrate activation ranges and swap in the fake-quant forward.

        TRT-style fixed-range QAT: ranges come from calibration on the
        CURRENT params (fresh or checkpoint-restored; re-calibrated by
        import_torch_weights) and stay constant while the weights adapt to
        the rounding. Every consumer of self.forward (train loss, eval,
        TTA, visualization) runs the same fake-quant graph, so train and
        eval numerics agree. The wrapper reads self._qat_ema at call time,
        so re-calibration never needs a re-wrap."""
        from cerberusnet_tpu.quant.qat import EMA_COLLECTION, qat_interception

        self._qat_ema = self._calibrate_qat_ranges()
        self._base_forward = self.forward

        def qat_forward(variables, batch):
            v = dict(variables)
            v[EMA_COLLECTION] = self._qat_ema
            with qat_interception():
                return self._base_forward(v, batch)

        self.forward = qat_forward

    def _example_batch(self):
        h, w = self.config.data.hw
        b = max(self.config.data.batch_size // self.mesh.shape["data"], 1)
        b = b * self.mesh.shape["data"]
        batch = {
            k: jnp.zeros((b, h, w, 3), self.config.model.jnp_dtype)
            for k in self.example_keys
        }
        return batch

    def _create_state(self):
        rng = jax.random.PRNGKey(self.config.train.seed)
        batch = self._example_batch()
        init = jax.jit(
            lambda r, bt: self.model.init(
                r, *[bt[k] for k in self.example_keys]
            )
        )
        variables = init(rng, batch)
        params = dict(variables["params"])
        if self.config.loss.uncertainty_weighting:
            # learnable per-task log-variances ride in the param tree under a
            # reserved key (popped before model.apply in _loss_fn)
            params["__task_uncertainty__"] = {
                t: jnp.zeros((), jnp.float32) for t in ("seg", "flow", "disp")
            }
        ema = None
        if self.config.optim.ema_decay > 0.0:
            # real copies — aliasing params' buffers breaks the donated
            # train step (same buffer donated twice)
            ema = jax.tree.map(jnp.copy, params)
        state = TrainState.create(
            apply_fn=self.model.apply, params=params, tx=self.tx, ema_params=ema
        )
        # replicate over the mesh
        return jax.device_put(state, replicated_sharding(self.mesh))

    def _make_ckpt_mgr(self):
        ckpt_dir = self.config.train.ckpt_dir
        if not ckpt_dir:
            return None
        import orbax.checkpoint as ocp

        return ocp.CheckpointManager(
            os.path.abspath(ckpt_dir),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=self.config.train.keep_checkpoints, create=True
            ),
        )

    def _maybe_restore(self):
        """Restore the latest checkpoint if one exists; returns its step
        (None if nothing was restored)."""
        step = self._ckpt_mgr.latest_step()
        if step is None:
            return None
        import orbax.checkpoint as ocp

        restored = self._ckpt_mgr.restore(
            step, args=ocp.args.StandardRestore(jax.tree.map(np.asarray, self.state))
        )
        self.state = jax.device_put(restored, replicated_sharding(self.mesh))
        print(f"[trainer] restored checkpoint at step {int(self.state.step)}")
        return step

    # -- steps --------------------------------------------------------------

    def _loss_fn(self, params, batch):
        log_vars = None
        if "__task_uncertainty__" in params:
            params = dict(params)
            log_vars = params.pop("__task_uncertainty__")
        outputs = self.forward({"params": params}, batch)
        cfg = self.config.loss
        total, comps = losses_lib.joint_loss(
            outputs,
            batch,
            weights=cfg.weights,
            focal_gamma=cfg.focal_gamma,
            robust_q=cfg.robust_q,
            photometric_weight=cfg.photometric_weight,
            smoothness_weight=cfg.smoothness_weight,
            rmi_weight=cfg.rmi_weight,
            seq_gamma=cfg.seq_gamma,
        )
        if log_vars is not None:
            total = losses_lib.uncertainty_weighted_total(comps, log_vars)
            comps = dict(comps)
            comps["total"] = total
        return total, comps

    def _make_train_step(self):
        remat = self.config.train.remat
        ema_decay = self.config.optim.ema_decay
        grads_dtype = self.config.optim.grads_dtype
        if grads_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"optim.grads_dtype must be 'float32' or 'bfloat16', "
                f"got {grads_dtype!r}")

        def step(state, batch):
            loss_fn = self._loss_fn
            if remat:
                loss_fn = jax.checkpoint(loss_fn)
            if grads_dtype == "bfloat16":
                # Mixed-precision gradients (round-5 train-frontier lever):
                # differentiate w.r.t. a bf16 cast of the params, so every
                # backward tensor — incl. the materialized gradient tree —
                # is bf16 (half the backward copy bytes the r3 train
                # profile charges to the small-channel encoder backward).
                # Master weights and the optimizer stay f32; grads are
                # upcast at the boundary. Convergence (not equality) is
                # the gate: configs/cerberus_evidence_bf16g.json.
                p16 = jax.tree.map(
                    lambda v: v.astype(jnp.bfloat16)
                    if v.dtype == jnp.float32 else v,
                    state.params,
                )
                (_, comps), g16 = jax.value_and_grad(
                    loss_fn, has_aux=True)(p16, batch)
                grads = jax.tree.map(
                    lambda g, p: g.astype(p.dtype), g16, state.params
                )
            else:
                (_, comps), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, batch)
            new_state = state.apply_gradients(grads=grads)
            if ema_decay > 0.0:
                new_state = new_state.replace(
                    ema_params=optax.incremental_update(
                        new_state.params, state.ema_params, 1.0 - ema_decay
                    )
                )
            return new_state, comps

        return jax.jit(step, donate_argnums=(0,))

    def _eval_params(self, state):
        return state.ema_params if state.ema_params is not None else state.params

    def _make_eval_step(self):
        def step(state, metrics, batch):
            outputs = self.forward({"params": self._eval_params(state)}, batch)
            return metrics.update(outputs, batch)

        return jax.jit(step, donate_argnums=(1,))

    # -- public API ---------------------------------------------------------

    def train_step(self, batch):
        n = len(batch["left"])
        ndata = self.mesh.shape["data"]
        if n % ndata:
            raise ValueError(
                f"batch size {n} is not divisible by the data-parallel mesh "
                f"axis ({ndata} devices); adjust data.batch_size"
            )
        batch = shard_batch(batch, self.mesh)
        if self.augment_config.enabled:
            self._aug_rng, k = jax.random.split(self._aug_rng)
            batch = augment_batch(batch, k, self.augment_config)
        batch = self.preprocess(batch)
        self.state, comps = self._train_step(self.state, batch)
        return comps

    def _eval_loader(self, loader: Optional[DataLoader]) -> DataLoader:
        if loader is not None:
            return loader
        ds = self.eval_dataset or self.dataset
        # drop_last=False + pad-and-mask: every val sample counts, including
        # the final partial batch (VERDICT r1 W5).
        return DataLoader(
            ds,
            batch_size=self.config.data.batch_size,
            num_workers=self.config.data.num_workers,
            drop_last=False,
        )

    def _prep_eval_batch(self, batch):
        """Pad a partial batch to the compile shape, preprocess on device,
        and attach the (B,) sample mask metrics use to ignore padding."""
        from cerberusnet_tpu.data.loader import pad_batch

        batch, mask = pad_batch(batch, self.config.data.batch_size)
        prep = self.preprocess(shard_batch(batch, self.mesh))
        prep["_sample_mask"] = shard_batch({"m": mask}, self.mesh)["m"]
        return prep

    def evaluate(self, loader: Optional[DataLoader] = None):
        loader = self._eval_loader(loader)
        metrics = MetricState.zeros(self.config.model.num_classes)
        for batch in loader:
            batch = self._prep_eval_batch(batch)
            metrics = self._eval_step(self.state, metrics, batch)
        return metrics.compute()

    def predict_to_dir(self, out_dir: str, loader: Optional[DataLoader] = None):
        """Run inference over the eval split and write benchmark-format
        prediction files (eval/submission.py: KITTI 16-bit flow/disparity
        PNGs, Cityscapes labelId semantics). Uses the EMA weights when
        present, like evaluate(). Returns the list of files written."""
        from cerberusnet_tpu.eval.submission import write_predictions

        loader = self._eval_loader(loader)
        fwd = jax.jit(self.forward)
        params = {"params": self._eval_params(self.state)}
        made = []
        idx = 0
        for batch in loader:
            n = len(next(iter(batch.values())))  # true rows before padding
            # submissions are graded at the dataset-native resolution
            native_hw = tuple(batch["left"].shape[1:3])
            prep = self._prep_eval_batch(batch)
            prep.pop("_sample_mask", None)
            out = fwd(params, prep)
            out = {k: v[:n] for k, v in out.items() if hasattr(v, "ndim")}
            names = [f"{idx + i:06d}_10" for i in range(n)]
            idx += n
            made += write_predictions(out, out_dir, names,
                                      native_hw=native_hw)
        return made

    def import_torch_weights(self, path: str):
        """Load a saved PyTorch checkpoint (the reference-user migration
        path) into this trainer's params.

        ``path`` is a torch.save file holding either a TorchCerberus
        state_dict or a dict wrapping one under 'state_dict'/'model'. The
        weights are loaded into the architecture-equivalent torch mirror at
        this config's widths and transferred leaf-by-leaf
        (tools/parity.import_cerberus — exact permutes/flips, no
        arithmetic; round-trip tested). Joint 'cerberus' variant only."""
        if self.config.model.variant != "cerberus":
            raise ValueError(
                "torch import maps the joint CerberusNet mirror; got "
                f"variant {self.config.model.variant!r}"
            )
        if self.config.model.seg_head != "fpn":
            raise ValueError(
                "torch import maps the FPN seg head (the mirror's); got "
                f"seg_head {self.config.model.seg_head!r}"
            )
        import torch

        from tools.parity import import_cerberus
        from tools.torch_baseline import TorchCerberus

        cfg = self.config.model
        tmodel = TorchCerberus(
            enc=tuple(cfg.encoder_channels),
            est=tuple(cfg.est_channels),
            ctx=tuple(cfg.ctx_channels),
            fpn=cfg.fpn_channels,
            num_classes=cfg.num_classes,
            max_disp_full=cfg.max_disp_full,
        )
        sd = torch.load(path, map_location="cpu", weights_only=True)
        for key in ("state_dict", "model"):
            if isinstance(sd, dict) and key in sd and not hasattr(
                sd[key], "shape"
            ):
                sd = sd[key]
        tmodel.load_state_dict(sd)
        new = import_cerberus(tmodel, {"params": self.state.params})
        self.state = self.state.replace(params=new["params"])
        if self.state.ema_params is not None:
            self.state = self.state.replace(ema_params=new["params"])
        print(f"[trainer] imported torch weights from {path}")
        if self._qat_ema is not None:
            # construction-time QAT calibration saw the random-init weights;
            # the imported weights have different activation magnitudes
            self._qat_ema = self._calibrate_qat_ranges()

    def predict_images(self, paths: dict, out_dir: str, name: str = "sample"):
        """Single-sample inference on raw image FILES.

        ``paths`` maps the variant's input keys (``self.example_keys``, e.g.
        left/right/temporal) to image paths; images are resized to the
        configured working resolution. Writes raw arrays (``<name>.npz``),
        benchmark-encoded PNGs (eval/submission.py layout) and a colorized
        panel (``<name>_panel.png``); returns the list of files written."""
        from cerberusnet_tpu.data import io as data_io
        from cerberusnet_tpu.eval.submission import write_predictions
        from cerberusnet_tpu.utils import visualization as vis

        missing = [k for k in self.example_keys if k not in paths]
        if missing:
            raise ValueError(
                f"variant {self.config.model.variant!r} needs images for "
                f"{missing} (got {sorted(paths)})"
            )
        batch = {
            k: np.asarray(data_io.read_image_u8(paths[k]))[None]
            for k in self.example_keys
        }
        prep = self.preprocess(batch)
        # cache the jitted forward across calls — per-call jax.jit wrappers
        # retrace/recompile every image (compiles are seconds-to-minutes
        # here, CLAUDE.md rule 4)
        if getattr(self, "_predict_fwd", None) is None:
            self._predict_fwd = jax.jit(self.forward)
        out = self._predict_fwd(
            {"params": self._eval_params(self.state)}, prep
        )
        out = {
            k: np.asarray(v) for k, v in out.items() if hasattr(v, "ndim")
        }
        os.makedirs(out_dir, exist_ok=True)
        npz_path = os.path.join(out_dir, f"{name}.npz")
        np.savez(npz_path, **{k: v[0] for k, v in out.items()})
        made = [npz_path] + write_predictions(out, out_dir, [name])
        img = batch["left"][0]
        h, w = self.config.data.hw
        if img.shape[:2] != (h, w):  # panel tiles must share the model res
            img = (
                np.asarray(
                    jax.image.resize(
                        jnp.asarray(img, jnp.float32), (h, w, 3), "bilinear"
                    )
                )
                .clip(0, 255)
                .astype(np.uint8)
            )
        panel_inputs = {"image": img}
        if "seg_logits" in out:
            panel_inputs["seg"] = out["seg_logits"][0].argmax(-1)
        if "flow" in out:
            panel_inputs["flow"] = out["flow"][0]
        if "disp" in out:
            # One repo-wide disp contract: (B, H, W, 1) (VERDICT r4 item 6)
            panel_inputs["disp"] = np.asarray(out["disp"][0, ..., 0])
        panel_path = os.path.join(out_dir, f"{name}_panel.png")
        data_io.write_image_u8(panel_path, vis.summary_panel(panel_inputs))
        return made + [panel_path]

    def evaluate_tta(
        self,
        scales=(0.75, 1.0, 1.25),
        flip: bool = True,
        loader: Optional[DataLoader] = None,
        per_class: bool = False,
    ):
        """Multi-scale + mirror test-time-augmentation evaluation
        (cerberusnet_tpu/eval/tta.py) — the standard val-time trick for
        reported Cityscapes/KITTI numbers. per_class adds per-class IoUs."""
        from cerberusnet_tpu.eval import tta_forward

        loader = self._eval_loader(loader)
        keys = self.example_keys
        scales = tuple(scales)

        @jax.jit
        def step(state, metrics, batch):
            inputs = {k: batch[k] for k in keys}
            out = tta_forward(
                self.forward,
                {"params": self._eval_params(state)},
                inputs,
                scales=scales,
                flip=flip,
            )
            return metrics.update(out, batch)

        metrics = MetricState.zeros(self.config.model.num_classes)
        for batch in loader:
            batch = self._prep_eval_batch(batch)
            metrics = step(self.state, metrics, batch)
        return metrics.compute(per_class=per_class)

    def fit(self):
        cfg = self.config
        loader = DataLoader(
            self.dataset,
            batch_size=cfg.data.batch_size,
            shuffle=cfg.data.shuffle,
            num_workers=cfg.data.num_workers,
            seed=cfg.train.seed,
        )
        log_path = None
        tb = None
        if cfg.train.ckpt_dir:
            os.makedirs(cfg.train.ckpt_dir, exist_ok=True)
            log_path = os.path.join(cfg.train.ckpt_dir, "train_log.csv")
            if cfg.train.tensorboard:
                from cerberusnet_tpu.utils.tblogger import TBLogger

                tb = TBLogger(os.path.join(cfg.train.ckpt_dir, "tb"))
        nan_recoveries = 0
        steps_since_recovery = 0
        if (
            cfg.train.recover_on_nan
            and self._ckpt_mgr
            and self._ckpt_mgr.latest_step() is None
        ):
            # Guarantee a rollback point exists BEFORE the first step — an
            # early divergence must not silently restart from scratch
            # (ADVICE r1 / VERDICT W8).
            print("[trainer] recover_on_nan: saving initial rollback checkpoint")
            self.save_checkpoint()
        for epoch in range(cfg.train.epochs):
            t_epoch = time.time()
            comps = {}
            for i, batch in enumerate(loader):
                comps = self.train_step(batch)
                if cfg.train.recover_on_nan and not np.isfinite(
                    float(comps["total"])
                ):
                    # Failure recovery (SURVEY.md §6.3): a non-finite loss
                    # has already corrupted params/opt-state — roll back to
                    # the last checkpoint and keep training.
                    nan_recoveries += 1
                    steps_since_recovery = 0
                    if nan_recoveries > cfg.train.max_nan_recoveries:
                        raise RuntimeError(
                            f"loss non-finite after {nan_recoveries - 1} "
                            "checkpoint recoveries — aborting"
                        )
                    print(
                        f"[trainer] non-finite loss at step "
                        f"{int(self.state.step)}; restoring last checkpoint "
                        f"(recovery {nan_recoveries}/"
                        f"{cfg.train.max_nan_recoveries})"
                    )
                    self.state = self._create_state()
                    restored = (
                        self._maybe_restore() if self._ckpt_mgr else None
                    )
                    if restored is None:
                        # No rollback point (no ckpt_dir configured): recovery
                        # degrades to a fresh re-init at step 0. Be loud —
                        # all training progress is being discarded.
                        print(
                            "[trainer] WARNING: no checkpoint to restore — "
                            "NaN recovery re-initialized from scratch at "
                            "step 0 (set train.ckpt_dir for real rollback)"
                        )
                    continue
                steps_since_recovery += 1
                if (
                    nan_recoveries
                    and cfg.train.nan_recovery_reset_steps
                    and steps_since_recovery
                    >= cfg.train.nan_recovery_reset_steps
                ):
                    # Long healthy stretch: forget old transient NaNs so they
                    # don't accumulate to an abort over a long run.
                    nan_recoveries = 0
                if (i + 1) % cfg.train.log_every == 0:
                    vals = {k: float(v) for k, v in comps.items()}
                    print(f"[epoch {epoch} step {i + 1}] {vals}")
                    if tb:
                        tb.scalars(vals, int(self.state.step), prefix="loss/")
            row = {
                "epoch": epoch,
                "step": int(self.state.step),
                "epoch_seconds": round(time.time() - t_epoch, 2),
                **{f"loss_{k}": float(v) for k, v in comps.items()},
            }
            if (
                self.eval_dataset is not None
                and (epoch + 1) % cfg.train.eval_every_epochs == 0
            ):
                row.update(self.evaluate())
                if cfg.train.ckpt_dir:
                    self.dump_visualization(
                        os.path.join(
                            cfg.train.ckpt_dir, f"predictions_epoch{epoch}.png"
                        )
                    )
                if tb:
                    tb.image("eval/panel", self.render_panel(), int(self.state.step))
            if tb:
                tb.scalars(row, int(self.state.step))
                tb.flush()
            self.history.append(row)
            print(f"[epoch {epoch}] {row}")
            if log_path:
                write_header = not os.path.exists(log_path)
                with open(log_path, "a", newline="") as f:
                    writer = csv.DictWriter(f, fieldnames=sorted(row))
                    if write_header:
                        writer.writeheader()
                    writer.writerow(row)
            if (
                (epoch + 1) % cfg.train.ckpt_every_epochs == 0
                or epoch + 1 == cfg.train.epochs
            ):
                self.save_checkpoint()
        return self.history

    def save_checkpoint(self):
        if not self._ckpt_mgr:
            return
        import orbax.checkpoint as ocp

        self._ckpt_mgr.save(
            int(self.state.step),
            args=ocp.args.StandardSave(jax.tree.map(np.asarray, self.state)),
        )
        self._ckpt_mgr.wait_until_finished()

    def render_panel(self) -> "np.ndarray":
        """Predictions on one sample as a (H, W, 3) uint8 panel (SURVEY.md §3
        C18 — the reference's tensorboard image panels)."""
        from cerberusnet_tpu.utils import visualization as vis

        batch = next(iter(DataLoader(self.dataset, batch_size=1, num_workers=1)))
        prep = self.preprocess(batch)
        out = jax.jit(self.forward)({"params": self._eval_params(self.state)}, prep)
        panel_inputs = {"image": np.asarray(batch["left"][0])}
        if "seg_logits" in out:
            panel_inputs["seg"] = np.asarray(out["seg_logits"][0].argmax(-1))
        if "flow" in out:
            panel_inputs["flow"] = np.asarray(out["flow"][0])
        if "disp" in out:
            panel_inputs["disp"] = np.asarray(out["disp"][0, ..., 0])
        return vis.summary_panel(panel_inputs)

    def dump_visualization(self, path: str):
        """Render predictions on one sample into a panel PNG (C18)."""
        from cerberusnet_tpu.data import io as data_io

        data_io.write_image_u8(path, self.render_panel())
        return path

    def export(self, out_dir: str, batch: int = 1, quant: Optional[str] = None,
               calib_batches: int = 2, quant_skip: tuple = (),
               stacked: bool = False):
        """AOT-export the current weights as a deployment artifact
        (SURVEY.md §4.3): StableHLO + manifest + compile options, consumable
        by jax.export and the C++ PJRT runner. Works for every variant.

        quant='int8' mirrors the reference's TensorRT int8 engine build
        (SURVEY.md §3 C16): calibrate activation ranges on ``calib_batches``
        batches from the training dataset, quantize conv weights
        per-output-channel, and bake the int8 graph into the artifact.

        stacked=True (cerberus variant only) exports the producer-stacked
        signature: ONE (3B, H, W, 3) input holding [left; right; temporal]
        instead of three separate frames. Identical math/params
        (CerberusNet.stacked_input); the point is the native serving path —
        pjrt_runner decodes the three PNGs into one contiguous host buffer,
        so the 3-frame assembly costs nothing anywhere (VERDICT r3 item 9:
        the r3 copy profile charges ~1.06 ms/frame to the separate-input
        relays, and the device-side A/B tied because XLA can only fuse the
        concat — it cannot delete the per-parameter relayout copies)."""
        from cerberusnet_tpu.export.aot import export_inference, save_exported

        h, w = self.config.data.hw
        example = tuple(
            jnp.zeros((batch, h, w, 3), self.config.model.jnp_dtype)
            for _ in self.example_keys
        )
        # deploy the EMA weights when EMA is on (the eval-quality weights)
        params = dict(self._eval_params(self.state))
        params.pop("__task_uncertainty__", None)
        variables = {"params": params}

        from contextlib import nullcontext

        make_interception = nullcontext
        q_model = None
        # under QAT self.forward is the fake-quant wrapper; export either
        # the plain float graph or (quant='int8') the real int8 graph
        forward = getattr(self, "_base_forward", None) or self.forward
        if quant == "int8":
            import dataclasses as _dc

            from cerberusnet_tpu.quant import (
                calibrate,
                quant_interception,
                quantize,
            )

            # PTQ quantizes convs by intercepting nn.Conv calls; the fused
            # estimator formulation AND the s2d/padded-stem encoder forms
            # compute their convs through raw lax ops and would be skipped.
            # The param trees are IDENTICAL either way
            # (tests/test_fused_estimator.py, tests/test_models.py), so
            # quantized export simply rebuilds the graph in the
            # interceptable form — every conv then goes through nn.Conv
            # and quantizes.
            m = self.config.model
            if (
                getattr(m, "fused", False)
                or m.s2d_levels
                or m.s2d_stem
                or m.stem_pad_channels
                or m.entry_grad == "phase"
                or m.pallas_levels
            ):
                q_model, forward, _ = build_model(
                    _dc.replace(
                        self.config.model,
                        fused=False,
                        s2d_levels=0,
                        s2d_stem=False,
                        stem_pad_channels=0,
                        entry_grad="auto",
                        pallas_levels=0,
                    )
                )
            else:
                q_model = self.model

            if self._qat_ema is not None:
                # QAT run: deploy with the ranges training adapted to, not
                # a fresh PTQ calibration.
                from cerberusnet_tpu.quant.ptq import _flatten

                scales = {
                    p[:-1]: float(v)
                    for p, v in _flatten(self._qat_ema).items()
                    if p[-1] == "in_absmax"
                }
            else:
                scales = calibrate(
                    q_model,
                    variables,
                    self._calib_batches(batch, calib_batches),
                )
            variables = quantize(variables, scales, skip=quant_skip, strip=True)
            make_interception = quant_interception
        elif quant is not None:
            raise ValueError(f"unknown quant mode {quant!r} (expected 'int8')")

        if stacked:
            import dataclasses as _dcs

            if self.config.model.variant != "cerberus":
                raise ValueError(
                    "stacked export needs the 3-frame cerberus variant, got "
                    f"{self.config.model.variant!r}")
            base_model = q_model or self.model
            s_model = _dcs.replace(base_model, stacked_input=True)
            example = (
                jnp.zeros((3 * batch, h, w, 3), self.config.model.jnp_dtype),
            )

            def infer(stacked_imgs):
                with make_interception():
                    out = s_model.apply(variables, stacked_imgs)
                return tuple(
                    out[k] for k in ("seg_logits", "flow", "disp") if k in out
                )

        else:
            def infer(*imgs):
                batch_d = dict(zip(self.example_keys, imgs))
                with make_interception():
                    out = forward(variables, batch_d)
                # deployment surface: full-res outputs only, fixed order
                return tuple(
                    out[k] for k in ("seg_logits", "flow", "disp") if k in out
                )

        exported = export_inference(infer, example)
        return save_exported(exported, out_dir)

    def profile(self, log_dir: str, steps: int = 5):
        """Capture an XProf/Perfetto trace of a few train steps (§6.1)."""
        loader = DataLoader(
            self.dataset, batch_size=self.config.data.batch_size, num_workers=2
        )
        it = iter(loader)
        batch = next(it)
        self.train_step(batch)  # compile outside the trace
        with jax.profiler.trace(log_dir):
            for _ in range(steps):
                comps = self.train_step(batch)
            jax.block_until_ready(comps)
        return log_dir
