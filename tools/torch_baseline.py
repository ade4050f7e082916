"""PyTorch-CPU reference baseline + parity mirror.

[BASELINE:L5] sets the rebuild target as ">=5x PyTorch-CPU-reference
full-3-head forward throughput per v5e chip". The reference code itself is
unrecoverable (SURVEY.md §0), so this module implements an architecture-
EQUIVALENT PyTorch model — same pyramid encoder widths, decoder heads,
correlation windows and DenseNet estimator shapes as cerberusnet_tpu, built
from the same SURVEY.md §9 specs — and measures its CPU forward FPS at the
[BASELINE:L10] configuration. bench.py reports vs_baseline = tpu_fps / this.

Equivalence is NOT asserted by construction alone: tools/parity.py can
transfer flax weights into this model and tests/test_torch_parity.py proves
the two frameworks produce numerically identical outputs (<=1e-3) — so the
throughput comparison is apples-to-apples. To keep that exact:
  * stride-2 convs pad asymmetrically (0,1,0,1) like XLA 'SAME'
  * x4 upsampling is two x2 bilinear steps (matches upsample2x twice)
  * warping uses align_corners=True grids (pixel coordinates)

This is an idiomatic torch implementation (vectorized shifts for
correlation, grid_sample for warping, channels-first conv2d), not a
strawman.
"""

from __future__ import annotations

import json
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

ENC = (16, 32, 64, 96, 128, 196)
EST = (128, 128, 96, 64, 32)
CTX = (128, 128, 128, 96, 64, 32)
CTX_DIL = (1, 2, 4, 8, 16, 1)


def lrelu(x):
    return F.leaky_relu(x, 0.1)


def corr2d(f1, f2, d=4):
    b, c, h, w = f1.shape
    f2p = F.pad(f2, (d, d, d, d))
    outs = []
    for dy in range(2 * d + 1):
        for dx in range(2 * d + 1):
            outs.append((f1 * f2p[:, :, dy : dy + h, dx : dx + w]).mean(1))
    return torch.stack(outs, 1)


def corr1d(f1, f2, dmax):
    b, c, h, w = f1.shape
    f2p = F.pad(f2, (dmax, 0, 0, 0))
    outs = []
    for k in range(dmax + 1):
        outs.append((f1 * f2p[:, :, :, dmax - k : dmax - k + w]).mean(1))
    return torch.stack(outs, 1)


def warp(f, flow):
    b, c, h, w = f.shape
    ys, xs = torch.meshgrid(
        torch.arange(h, dtype=torch.float32),
        torch.arange(w, dtype=torch.float32),
        indexing="ij",
    )
    gx = (xs[None] + flow[:, 0]) / max(w - 1, 1) * 2 - 1
    gy = (ys[None] + flow[:, 1]) / max(h - 1, 1) * 2 - 1
    grid = torch.stack([gx, gy], -1)
    return F.grid_sample(f, grid, mode="bilinear", padding_mode="zeros",
                         align_corners=True)


def up2(x):
    return F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)


def up4(x):
    # two x2 steps — bit-matches cerberusnet_tpu's upsample2x(upsample2x(.))
    return up2(up2(x))


def strided_conv(cin, ch):
    """Stride-2 3x3 conv with XLA-'SAME' asymmetric padding (0,1,0,1)."""
    return nn.Sequential(nn.ZeroPad2d((0, 1, 0, 1)), nn.Conv2d(cin, ch, 3, 2, 0))


class Encoder(nn.Module):
    def __init__(self, channels=ENC):
        super().__init__()
        self.stages = nn.ModuleList()
        cin = 3
        for ch in channels:
            self.stages.append(
                nn.Sequential(
                    strided_conv(cin, ch), nn.LeakyReLU(0.1),
                    nn.Conv2d(ch, ch, 3, 1, 1), nn.LeakyReLU(0.1),
                    nn.Conv2d(ch, ch, 3, 1, 1), nn.LeakyReLU(0.1),
                )
            )
            cin = ch
        self.out_channels = channels

    def forward(self, x):
        feats = []
        for stage in self.stages:
            x = stage(x)
            feats.append(x)
        return feats


class Estimator(nn.Module):
    def __init__(self, cin, out_ch, est=EST):
        super().__init__()
        self.convs = nn.ModuleList()
        c = cin
        for ch in est:
            self.convs.append(nn.Conv2d(c, ch, 3, 1, 1))
            c += ch
        self.pred = nn.Conv2d(c, out_ch, 3, 1, 1)
        self.feat_channels = c

    def forward(self, x):
        for conv in self.convs:
            x = torch.cat([x, lrelu(conv(x))], 1)
        return x, self.pred(x)


class Context(nn.Module):
    def __init__(self, cin, out_ch, ctx=CTX, dil=CTX_DIL):
        super().__init__()
        layers = []
        c = cin
        for ch, d in zip(ctx, dil):
            layers += [nn.Conv2d(c, ch, 3, 1, d, dilation=d), nn.LeakyReLU(0.1)]
            c = ch
        layers.append(nn.Conv2d(c, out_ch, 3, 1, 1))
        self.net = nn.Sequential(*layers)

    def forward(self, x):
        return self.net(x)


class FlowHead(nn.Module):
    def __init__(self, enc_channels=ENC, d=4, est=EST, ctx=CTX):
        super().__init__()
        self.d = d
        nk = (2 * d + 1) ** 2
        self.est = nn.ModuleDict()
        self.upfeat = nn.ModuleDict()
        for l in (6, 5, 4, 3, 2):
            extra = 0 if l == 6 else 2 + 2
            e = Estimator(nk + enc_channels[l - 1] + extra, 2, est)
            self.est[str(l)] = e
            if l != 2:
                self.upfeat[str(l)] = nn.ConvTranspose2d(e.feat_channels, 2, 4, 2, 1)
        self.ctx = Context(self.est["2"].feat_channels, 2, ctx,
                           CTX_DIL[: len(ctx)])

    def forward(self, f1s, f2s):
        flow, up_feat = None, None
        for l in (6, 5, 4, 3, 2):
            f1, f2 = f1s[l - 1], f2s[l - 1]
            if flow is None:
                cv = lrelu(corr2d(f1, f2, self.d))
                x = torch.cat([cv, f1], 1)
            else:
                up_flow = 2.0 * up2(flow)
                f2w = warp(f2, up_flow)
                cv = lrelu(corr2d(f1, f2w, self.d))
                x = torch.cat([cv, f1, up_flow, up_feat], 1)
            feat, flow_new = self.est[str(l)](x)
            flow = flow_new if flow is None else flow_new + up_flow
            if l == 2:
                flow = flow + self.ctx(feat)
            else:
                up_feat = lrelu(self.upfeat[str(l)](feat))
        return 4.0 * up4(flow)


class DispHead(nn.Module):
    def __init__(self, enc_channels=ENC, max_disp_full=96, est=EST, ctx=CTX):
        super().__init__()
        self.max_disp_full = max_disp_full
        self.est = nn.ModuleDict()
        self.upfeat = nn.ModuleDict()
        for l in (6, 5, 4, 3, 2):
            nk = max(max_disp_full // (2**l), 4) + 1
            extra = 0 if l == 6 else 1 + 2
            e = Estimator(nk + enc_channels[l - 1] + extra, 1, est)
            self.est[str(l)] = e
            if l != 2:
                self.upfeat[str(l)] = nn.ConvTranspose2d(e.feat_channels, 2, 4, 2, 1)
        self.ctx = Context(self.est["2"].feat_channels, 1, ctx,
                           CTX_DIL[: len(ctx)])

    def forward(self, fls, frs):
        disp, up_feat = None, None
        for l in (6, 5, 4, 3, 2):
            f1, f2 = fls[l - 1], frs[l - 1]
            dmax = max(self.max_disp_full // (2**l), 4)
            if disp is None:
                cv = lrelu(corr1d(f1, f2, dmax))
                x = torch.cat([cv, f1], 1)
            else:
                up_disp = 2.0 * up2(disp)
                flow = torch.cat([-up_disp, torch.zeros_like(up_disp)], 1)
                f2w = warp(f2, flow)
                cv = lrelu(corr1d(f1, f2w, dmax))
                x = torch.cat([cv, f1, up_disp, up_feat], 1)
            feat, disp_new = self.est[str(l)](x)
            disp = disp_new if disp is None else disp_new + up_disp
            if l == 2:
                disp = disp + self.ctx(feat)
            else:
                up_feat = lrelu(self.upfeat[str(l)](feat))
        return 4.0 * up4(disp)


class SegHead(nn.Module):
    def __init__(self, enc_channels=ENC, num_classes=19, fpn=96):
        super().__init__()
        self.lat = nn.ModuleDict(
            {str(l): nn.Conv2d(enc_channels[l - 1], fpn, 1) for l in (6, 5, 4, 3, 2)}
        )
        self.smooth = nn.ModuleDict(
            {str(l): nn.Conv2d(fpn, fpn, 3, 1, 1) for l in (5, 4, 3, 2)}
        )
        self.final = nn.Conv2d(fpn, fpn, 3, 1, 1)
        self.cls = nn.Conv2d(fpn, num_classes, 3, 1, 1)

    def forward(self, feats, out_hw):
        x = lrelu(self.lat["6"](feats[5]))
        for l in (5, 4, 3, 2):
            lat = lrelu(self.lat[str(l)](feats[l - 1]))
            x = F.interpolate(x, size=lat.shape[2:], mode="bilinear",
                              align_corners=False) + lat
            x = lrelu(self.smooth[str(l)](x))
        x = lrelu(self.final(x))
        return F.interpolate(self.cls(x), size=out_hw, mode="bilinear",
                             align_corners=False)


class TorchCerberus(nn.Module):
    def __init__(self, enc=ENC, est=EST, ctx=CTX, fpn=96, num_classes=19,
                 max_disp_full=96):
        super().__init__()
        self.enc = Encoder(enc)
        self.flow = FlowHead(enc, 4, est, ctx)
        self.disp = DispHead(enc, max_disp_full, est, ctx)
        self.seg = SegHead(enc, num_classes, fpn)

    def forward(self, left, right, temporal):
        fl = self.enc(left)
        fr = self.enc(right)
        ft = self.enc(temporal)
        return {
            "disp": self.disp(fl, fr),
            "flow": self.flow(fl, ft),
            "seg_logits": self.seg(fl, left.shape[2:]),
        }


def measure_cpu_fps(h=512, w=1024, iters=3, cache_path=None):
    """Frames/sec of the full 3-head forward, batch 1, fp32, CPU."""
    if cache_path and os.path.exists(cache_path):
        with open(cache_path) as f:
            cached = json.load(f)
        if cached.get("hw") == [h, w]:
            return cached["fps"]
    torch.manual_seed(0)
    model = TorchCerberus().eval()
    x = [torch.randn(1, 3, h, w) for _ in range(3)]
    with torch.no_grad():
        model(*x)  # warmup
        t0 = time.time()
        for _ in range(iters):
            model(*x)
        dt = (time.time() - t0) / iters
    fps = 1.0 / dt
    if cache_path:
        with open(cache_path, "w") as f:
            json.dump({"hw": [h, w], "fps": fps, "seconds_per_frame": dt}, f)
    return fps


if __name__ == "__main__":
    fps = measure_cpu_fps(cache_path=".torch_cpu_baseline.json")
    print(json.dumps({"torch_cpu_fps": fps}))
