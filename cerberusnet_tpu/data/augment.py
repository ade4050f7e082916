"""Device-side training augmentations (SURVEY.md §4.4: all geometric/
numeric work inside the jitted graph).

Jitted, batched, RNG-explicit transforms over the standard sample dict:

  * random crop — valid for every task; GT crops along (flow/disparity
    values are translation-invariant, only positions move).
  * horizontal flip — applied to segmentation/flow training (flow u negates);
    automatically SKIPPED when disparity GT is present: a rectified stereo
    pair is not LR-flip invariant without right-anchored GT (the standard
    stereo-training convention).
  * color jitter — brightness/contrast on images only, per-sample.

All ops are shape-static (crop offsets are traced values into
lax.dynamic_slice) so one compiled train step serves the whole epoch.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

IMAGE_KEYS = ("left", "right", "temporal")


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    crop_hw: tuple | None = None  # (H, W) random crop; None = off
    flip_lr_prob: float = 0.0
    brightness: float = 0.0  # max +- additive in [0,1] image units
    contrast: float = 0.0  # max +- multiplicative deviation
    # Random spatial scaling (the flow-recipe staple — PAPERS.md 'Models
    # Matter, So Does Training'): per batch, pick one zoom factor from this
    # DISCRETE set, crop a crop_hw/s region and resize it to crop_hw with
    # GT value rescaling (flow*(sx,sy), disp*sx). Discrete so every branch
    # is a static-shape XLA subgraph under lax.switch — one compiled train
    # step serves all scales. Requires crop_hw; () = off.
    scales: tuple = ()

    @property
    def enabled(self):
        return (
            self.crop_hw is not None
            or self.flip_lr_prob > 0
            or self.brightness > 0
            or self.contrast > 0
        )


def _crop(x, y0, x0, ch, cw):
    if x.ndim == 3:  # (B, H, W)
        return jax.vmap(
            lambda img, yy, xx: jax.lax.dynamic_slice(img, (yy, xx), (ch, cw))
        )(x, y0, x0)
    return jax.vmap(
        lambda img, yy, xx: jax.lax.dynamic_slice(
            img, (yy, xx, 0), (ch, cw, img.shape[-1])
        )
    )(x, y0, x0)


def _crop_resize_branch(out, k_crop, ch, cw, sh, sw):
    """Random (sh, sw) crop of every spatial key, resized to (ch, cw) with
    GT value scaling — one static-shape branch of the scale switch."""
    from cerberusnet_tpu.data import encodings

    b = out["left"].shape[0]
    h, w = out["left"].shape[1:3]
    y0 = jax.random.randint(k_crop, (b,), 0, max(h - sh, 0) + 1)
    x0 = jax.random.randint(jax.random.fold_in(k_crop, 1), (b,), 0,
                            max(w - sw, 0) + 1)
    res = dict(out)
    for k in IMAGE_KEYS:
        if k in res:
            img = _crop(res[k], y0, x0, sh, sw).astype(jnp.float32)
            if (sh, sw) != (ch, cw):
                img = jax.image.resize(img, (b, ch, cw, img.shape[-1]),
                                       "bilinear")
            hi = 255.0 if out[k].dtype == jnp.uint8 else None
            if hi is not None:
                img = jnp.clip(jnp.round(img), 0, hi)
            res[k] = img.astype(out[k].dtype)
    if "seg_labels" in res:
        lab = _crop(res["seg_labels"], y0, x0, sh, sw)
        res["seg_labels"] = encodings.resize_labels(lab, (ch, cw))
    if "flow_gt" in res:
        valid = res.get(
            "flow_valid", jnp.ones(res["flow_gt"].shape[:3], jnp.float32)
        )
        res["flow_gt"], res["flow_valid"] = encodings.resize_flow(
            _crop(res["flow_gt"], y0, x0, sh, sw),
            _crop(valid, y0, x0, sh, sw),
            (ch, cw),
        )
    if "disp_gt" in res:
        valid = res.get(
            "disp_valid", (res["disp_gt"] > 0).astype(jnp.float32)
        )
        res["disp_gt"], res["disp_valid"] = encodings.resize_disparity(
            _crop(res["disp_gt"], y0, x0, sh, sw),
            _crop(valid, y0, x0, sh, sw),
            (ch, cw),
        )
    return res


@functools.partial(jax.jit, static_argnames=("config",))
def augment_batch(batch, key, config: AugmentConfig):
    """Apply configured augmentations to a device batch dict."""
    out = dict(batch)
    b = out["left"].shape[0]
    k_crop, k_flip, k_bright, k_contrast = jax.random.split(key, 4)

    if config.scales and config.crop_hw is not None:
        # Random zoom: one discrete scale per batch; each scale is a static
        # crop-size branch (crop crop_hw/s then resize to crop_hw).
        h, w = out["left"].shape[1:3]
        ch, cw = config.crop_hw

        def make_branch(s):
            sh = min(max(int(round(ch / s)), 1), h)
            sw = min(max(int(round(cw / s)), 1), w)
            return lambda o: _crop_resize_branch(o, k_crop, ch, cw, sh, sw)

        branches = [make_branch(s) for s in config.scales]
        idx = jax.random.randint(
            jax.random.fold_in(k_crop, 2), (), 0, len(branches)
        )
        out = jax.lax.switch(idx, branches, out)
    elif config.crop_hw is not None:
        h, w = out["left"].shape[1:3]
        ch, cw = config.crop_hw
        y0 = jax.random.randint(k_crop, (b,), 0, max(h - ch, 0) + 1)
        x0 = jax.random.randint(jax.random.fold_in(k_crop, 1), (b,), 0,
                                max(w - cw, 0) + 1)
        for k in list(out):
            if k in IMAGE_KEYS or k in (
                "seg_labels", "flow_gt", "flow_valid", "disp_gt", "disp_valid"
            ):
                out[k] = _crop(out[k], y0, x0, ch, cw)

    stereo = "disp_gt" in out
    if config.flip_lr_prob > 0 and not stereo:
        do = jax.random.bernoulli(k_flip, config.flip_lr_prob, (b,))

        def maybe_flip(x, axis=2):
            flipped = jnp.flip(x, axis=axis)
            shape = (b,) + (1,) * (x.ndim - 1)
            return jnp.where(do.reshape(shape), flipped, x)

        for k in IMAGE_KEYS:
            if k in out:
                out[k] = maybe_flip(out[k])
        if "seg_labels" in out:
            out["seg_labels"] = maybe_flip(out["seg_labels"])
        if "flow_gt" in out:
            f = maybe_flip(out["flow_gt"])
            u = jnp.where(do.reshape(b, 1, 1), -f[..., 0], f[..., 0])
            out["flow_gt"] = jnp.stack([u, f[..., 1]], axis=-1)
        if "flow_valid" in out:
            out["flow_valid"] = maybe_flip(out["flow_valid"])

    if config.brightness > 0 or config.contrast > 0:
        for i, k in enumerate(IMAGE_KEYS):
            if k not in out:
                continue
            img = out[k].astype(jnp.float32)
            scale = 255.0 if batch[k].dtype == jnp.uint8 else 1.0
            if config.contrast > 0:
                c = 1.0 + jax.random.uniform(
                    jax.random.fold_in(k_contrast, i), (b, 1, 1, 1),
                    minval=-config.contrast, maxval=config.contrast,
                )
                mean = img.mean(axis=(1, 2, 3), keepdims=True)
                img = (img - mean) * c + mean
            if config.brightness > 0:
                db = jax.random.uniform(
                    jax.random.fold_in(k_bright, i), (b, 1, 1, 1),
                    minval=-config.brightness, maxval=config.brightness,
                ) * scale
                img = img + db
            out[k] = jnp.clip(img, 0, scale).astype(batch[k].dtype)
    return out
