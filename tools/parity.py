"""Flax -> torch weight transfer for the parity mirror (tools/torch_baseline).

Proves the two implementations are the SAME architecture numerically
(tests/test_torch_parity.py): transfer trained/random flax CerberusNet
weights into TorchCerberus and compare full-forward outputs. This
underwrites the bench.py vs_baseline comparison and doubles as the
fidelity demonstration available without the (empty) reference tree
(SURVEY.md §7 'fidelity is demonstrated as ... equivalence').

Layout facts (verified empirically):
  * flax Conv kernel HWIO  -> torch OIHW permute (3,2,0,1)
  * flax ConvTranspose kernel (kh,kw,cin,cout) -> torch (cin,cout,kh,kw)
    of the SPATIALLY FLIPPED kernel
  * flax 'SAME' stride-2 k3 == torch pad (left 0, right 1, top 0, bottom 1)
"""

from __future__ import annotations

import numpy as np
import torch


def _t(a):
    return torch.tensor(np.asarray(a, np.float32))


def copy_conv(conv: torch.nn.Conv2d, p):
    conv.weight.data = _t(p["kernel"]).permute(3, 2, 0, 1).contiguous()
    conv.bias.data = _t(p["bias"])


def copy_convT(convT: torch.nn.ConvTranspose2d, p):
    k = np.asarray(p["kernel"], np.float32)[::-1, ::-1].copy()
    convT.weight.data = _t(k).permute(2, 3, 0, 1).contiguous()
    convT.bias.data = _t(p["bias"])


def _cb(p):
    """Unwrap a flax ConvBlock param subtree -> its Conv params."""
    return p["Conv_0"]


def transfer_encoder(enc_params, torch_enc):
    for i, stage in enumerate(torch_enc.stages):
        copy_conv(stage[0][1], _cb(enc_params[f"ConvBlock_{3 * i}"]))
        copy_conv(stage[2], _cb(enc_params[f"ConvBlock_{3 * i + 1}"]))
        copy_conv(stage[4], _cb(enc_params[f"ConvBlock_{3 * i + 2}"]))


def transfer_decoder(dec_params, torch_head):
    """Flow or disparity decoder: DenseEstimator_k/Conv_k/ConvTranspose_k per
    level (coarse->fine creation order), ContextNetwork_0 at the finest."""
    levels = ["6", "5", "4", "3", "2"]
    for k, lvl in enumerate(levels):
        est = torch_head.est[lvl]
        de = dec_params[f"DenseEstimator_{k}"]
        for j, conv in enumerate(est.convs):
            copy_conv(conv, _cb(de[f"ConvBlock_{j}"]))
        copy_conv(est.pred, dec_params[f"Conv_{k}"])
        if lvl != "2":
            copy_convT(torch_head.upfeat[lvl], dec_params[f"ConvTranspose_{k}"])
    ctx = dec_params["ContextNetwork_0"]
    torch_convs = [m for m in torch_head.ctx.net if isinstance(m, torch.nn.Conv2d)]
    for j, conv in enumerate(torch_convs[:-1]):
        copy_conv(conv, _cb(ctx[f"ConvBlock_{j}"]))
    copy_conv(torch_convs[-1], ctx["Conv_0"])


def transfer_seg(seg_params, torch_seg):
    for idx, lvl in enumerate(["6", "5", "4", "3", "2"]):
        copy_conv(torch_seg.lat[lvl], seg_params[f"Conv_{idx}"])
    for idx, lvl in enumerate(["5", "4", "3", "2"]):
        copy_conv(torch_seg.smooth[lvl], _cb(seg_params[f"ConvBlock_{idx}"]))
    copy_conv(torch_seg.final, _cb(seg_params["ConvBlock_4"]))
    copy_conv(torch_seg.cls, seg_params["Conv_5"])


def transfer_cerberus(flax_variables, torch_model):
    """Full CerberusNet flax params -> TorchCerberus (in place)."""
    params = flax_variables["params"]
    transfer_encoder(params["PyramidEncoder_0"], torch_model.enc)
    transfer_decoder(params["FlowDecoder_0"], torch_model.flow)
    transfer_decoder(params["DisparityDecoder_0"], torch_model.disp)
    transfer_seg(params["SegmentationHead_0"], torch_model.seg)
    return torch_model


# ---------------------------------------------------------------------------
# Torch -> flax import (the migration path for users bringing torch weights)
# ---------------------------------------------------------------------------


def _j(t):
    return np.asarray(t.detach().cpu().numpy(), np.float32)


def read_conv(conv: torch.nn.Conv2d):
    """torch Conv2d -> flax {'kernel' HWIO, 'bias'}."""
    return {
        "kernel": _j(conv.weight).transpose(2, 3, 1, 0),
        "bias": _j(conv.bias),
    }


def read_convT(convT: torch.nn.ConvTranspose2d):
    """torch ConvTranspose2d (cin,cout,kh,kw) -> flax kernel (kh,kw,cin,cout)
    of the spatially flipped weights (inverse of copy_convT)."""
    k = _j(convT.weight).transpose(2, 3, 0, 1)  # (kh,kw,cin,cout)
    return {"kernel": k[::-1, ::-1].copy(), "bias": _j(convT.bias)}


def _cb_set(p, conv_params):
    p["Conv_0"] = conv_params


def import_encoder(torch_enc, enc_params):
    for i, stage in enumerate(torch_enc.stages):
        _cb_set(enc_params[f"ConvBlock_{3 * i}"], read_conv(stage[0][1]))
        _cb_set(enc_params[f"ConvBlock_{3 * i + 1}"], read_conv(stage[2]))
        _cb_set(enc_params[f"ConvBlock_{3 * i + 2}"], read_conv(stage[4]))


def import_decoder(torch_head, dec_params):
    levels = ["6", "5", "4", "3", "2"]
    for k, lvl in enumerate(levels):
        est = torch_head.est[lvl]
        de = dec_params[f"DenseEstimator_{k}"]
        for j, conv in enumerate(est.convs):
            _cb_set(de[f"ConvBlock_{j}"], read_conv(conv))
        dec_params[f"Conv_{k}"] = read_conv(est.pred)
        if lvl != "2":
            dec_params[f"ConvTranspose_{k}"] = read_convT(torch_head.upfeat[lvl])
    ctx = dec_params["ContextNetwork_0"]
    torch_convs = [m for m in torch_head.ctx.net if isinstance(m, torch.nn.Conv2d)]
    for j, conv in enumerate(torch_convs[:-1]):
        _cb_set(ctx[f"ConvBlock_{j}"], read_conv(conv))
    ctx["Conv_0"] = read_conv(torch_convs[-1])


def import_seg(torch_seg, seg_params):
    for idx, lvl in enumerate(["6", "5", "4", "3", "2"]):
        seg_params[f"Conv_{idx}"] = read_conv(torch_seg.lat[lvl])
    for idx, lvl in enumerate(["5", "4", "3", "2"]):
        _cb_set(seg_params[f"ConvBlock_{idx}"], read_conv(torch_seg.smooth[lvl]))
    _cb_set(seg_params["ConvBlock_4"], read_conv(torch_seg.final))
    seg_params["Conv_5"] = read_conv(torch_seg.cls)


def import_cerberus(torch_model, flax_variables):
    """TorchCerberus weights -> a NEW flax variables dict with the same tree
    as ``flax_variables`` (taken as the structure template; typically
    model.init output). The inverse of transfer_cerberus — round-trips
    exactly (same permutes/flips, no arithmetic)."""
    import jax

    new = jax.tree.map(lambda x: x, flax_variables)  # shallow-copy leaves
    # jax.tree.map returns a new container structure; leaves are shared but
    # we replace whole subtrees below, never mutate leaves.
    params = new["params"]
    import_encoder(torch_model.enc, params["PyramidEncoder_0"])
    import_decoder(torch_model.flow, params["FlowDecoder_0"])
    import_decoder(torch_model.disp, params["DisparityDecoder_0"])
    import_seg(torch_model.seg, params["SegmentationHead_0"])
    return new
