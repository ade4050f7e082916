"""Synthetic stereo/temporal dataset (SURVEY.md §7 step 7: 'synthetic-data
generators for tests and benchmarks — real Cityscapes/KITTI likely absent
offline; ship loaders + synthetic fallback').

Generates geometrically consistent triplets: a smooth 'scene' image, a right
view produced by horizontally shifting with a smooth disparity field, a
previous frame produced by warping with a smooth flow field, blocky
segmentation labels, and sparse-or-dense GT. Also writes KITTI-format
16-bit PNG fixtures so the directory loaders and encodings are testable
offline.
"""

from __future__ import annotations

import os

import numpy as np

from cerberusnet_tpu.data import encodings


def _smooth_field(rng, h, w, channels, scale, smoothness=8):
    """Low-frequency random field via nearest-upsampled coarse noise + box blur."""
    ch, cw = max(h // smoothness, 1), max(w // smoothness, 1)
    coarse = rng.randn(ch, cw, channels).astype(np.float32) * scale
    ys = np.linspace(0, ch - 1, h)
    xs = np.linspace(0, cw - 1, w)
    y0 = np.clip(ys.astype(int), 0, ch - 1)
    x0 = np.clip(xs.astype(int), 0, cw - 1)
    field = coarse[y0][:, x0]
    k = 5
    pad = np.pad(field, ((k, k), (k, k), (0, 0)), mode="edge")
    out = np.zeros_like(field)
    for dy in (-k, 0, k):
        for dx in (-k, 0, k):
            out += pad[k + dy : k + dy + h, k + dx : k + dx + w]
    return out / 9.0


class SyntheticPerceptionDataset:
    """In-memory dataset with the same sample dict schema as the real loaders:
    {left, right, temporal (H,W,3 uint8), seg_labels (H,W uint8), flow_gt
    (H,W,2 f32), flow_valid, disp_gt (H,W f32), disp_valid}."""

    def __init__(
        self,
        length: int = 16,
        hw=(256, 512),
        num_classes: int = 19,
        max_disp: float = 48.0,
        max_flow: float = 10.0,
        sparse: bool = False,
        seed: int = 0,
    ):
        self.length = length
        self.hw = hw
        self.num_classes = num_classes
        self.max_disp = max_disp
        self.max_flow = max_flow
        self.sparse = sparse
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int):
        if not 0 <= idx < self.length:
            raise IndexError(idx)
        rng = np.random.RandomState(self.seed * 100003 + idx)
        h, w = self.hw

        base = _smooth_field(rng, h, w, 3, 1.0, smoothness=4)
        base = (base - base.min()) / (np.ptp(base) + 1e-6)
        left = (base * 255).astype(np.uint8)

        disp = np.abs(_smooth_field(rng, h, w, 1, self.max_disp / 3))[..., 0]
        disp = np.clip(disp, 0.0, self.max_disp).astype(np.float32)
        flow = _smooth_field(rng, h, w, 2, self.max_flow / 3).astype(np.float32)

        xs = np.arange(w)[None, :].repeat(h, 0).astype(np.float32)
        ys = np.arange(h)[:, None].repeat(w, 1).astype(np.float32)

        def sample(img, sx, sy):
            ix = np.clip(sx, 0, w - 1).astype(int)
            iy = np.clip(sy, 0, h - 1).astype(int)
            return img[iy, ix]

        # Rectified stereo: a scene point at x_L in the left view sits at
        # x_L - d in the right view, so right(x) == left(x + d).
        right = sample(left, xs + disp, ys).astype(np.uint8)
        # Flow anchored at left: left(x) appears at x + flow(x) in the
        # temporal frame, i.e. temporal(x + flow(x)) == left(x); synthesize by
        # inverse sampling temporal(y) = left(y - flow(y)) (exact to first
        # order for smooth fields — fine for overfit/loss tests).
        temporal = sample(
            left, xs - flow[..., 0], ys - flow[..., 1]
        ).astype(np.uint8)

        # Segmentation labels are a FIXED function of scene appearance
        # (quantized luminance + red/blue contrast), not an independent
        # random field: a model that learns the mapping generalizes to
        # held-out scenes, which makes val-split metrics meaningful
        # (VERDICT r1 item 7 — the round-1 independent-field labels made
        # val mIoU chance-level by construction).
        lum = base @ np.array([0.299, 0.587, 0.114], np.float32)
        contrast = (base[..., 0] - base[..., 2]) * 0.5 + 0.5
        score = np.clip(0.75 * lum + 0.25 * contrast, 0.0, 1.0)
        seg = np.minimum(
            (score * self.num_classes).astype(np.int64), self.num_classes - 1
        ).astype(np.uint8)

        if self.sparse:
            mask = (rng.rand(h, w) < 0.3).astype(np.float32)
        else:
            mask = np.ones((h, w), np.float32)

        return {
            "left": left,
            "right": right,
            "temporal": temporal,
            "seg_labels": seg,
            "flow_gt": flow * mask[..., None],
            "flow_valid": mask,
            "disp_gt": disp * mask,
            "disp_valid": mask,
        }

    # -- fixture writer -----------------------------------------------------

    def write_kitti_fixture(self, root: str, n: int = 2):
        """Write KITTI-2015-layout PNG fixtures (16-bit GT) under root.

        KITTI convention: flow/disparity GT anchor at frame _10; flow maps
        _10 -> _11. Our 'left' plays the _10 role and 'temporal' the _11
        role (flow is left -> temporal, SURVEY.md §9.5)."""
        from cerberusnet_tpu.data import io as data_io

        for sub in ("image_2", "image_3", "flow_occ", "disp_occ_0"):
            os.makedirs(os.path.join(root, sub), exist_ok=True)
        for i in range(n):
            s = self[i]
            name = f"{i:06d}_10.png"
            name11 = f"{i:06d}_11.png"
            data_io.write_image_u8(os.path.join(root, "image_2", name), s["left"])
            data_io.write_image_u8(
                os.path.join(root, "image_2", name11), s["temporal"]
            )
            data_io.write_image_u8(os.path.join(root, "image_3", name), s["right"])
            data_io.write_png16(
                os.path.join(root, "flow_occ", name),
                encodings.encode_kitti_flow(s["flow_gt"], s["flow_valid"]),
            )
            data_io.write_png16(
                os.path.join(root, "disp_occ_0", name),
                encodings.encode_kitti_disparity(s["disp_gt"], s["disp_valid"]),
            )
