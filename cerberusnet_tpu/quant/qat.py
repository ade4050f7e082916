"""Quantization-aware training (QAT) — int8 fake-quant with straight-through
estimators.

The reference's int8 deployment (TensorRT on Xavier, SURVEY.md §3 C16/§4.3)
is calibration-only PTQ; TRT practice when PTQ accuracy drops is QAT —
train with quantization in the graph so the weights adapt to the rounding.
This module adds that capability on the SAME flax-interception machinery as
quant/ptq.py, with zero model changes:

  * weights — per-output-channel symmetric fake-quant, scale recomputed from
    the live kernel each step (stop-gradient through the scale), gradients
    pass straight through the round (STE);
  * activations — per-tensor symmetric fake-quant against an EMA absmax
    carried as a ``quant_ema`` collection inside ``variables`` (seeded from
    :func:`cerberusnet_tpu.quant.ptq.calibrate`); every forward also sows
    the observed absmax so the trainer can tick the EMA outside the grad;
  * the ptq module's conv support rules apply verbatim (only plain
    ``nn.Conv``; ConvTranspose / exotic attrs stay float).

Typical loop::

    scales = ptq.calibrate(model, variables, batches)
    variables = qat.init_ema(variables, scales)
    for batch in data:
        (loss, observed), grads = value_and_grad(qat_loss, has_aux=True)(...)
        variables = qat.update_ema(variables, observed)
        ... optimizer update on variables["params"] ...
    qvars = qat.finalize(model_variables_with_ema)     # -> ptq 'quant'
    out = ptq.quantized_apply(model, qvars, *inputs)   # real int8 MXU path

``finalize`` emits the standard PTQ ``quant`` collection, so the existing
int8 export path (export/aot.py + the C++ PJRT runner) ships QAT'd weights
unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from cerberusnet_tpu.quant import ptq
from cerberusnet_tpu.quant.ptq import (
    CALIB_COLLECTION,
    _QMAX,
    _canon2,
    _get_nested,
    _set_nested,
    _unsupported_conv_attrs,
)

EMA_COLLECTION = "quant_ema"


def _ste_round_clip(x, scale):
    """Symmetric fake-quant with a straight-through gradient."""
    q = jnp.clip(jnp.round(x / scale), -_QMAX, _QMAX) * scale
    return x + jax.lax.stop_gradient(q - x)


def _fake_quant_conv(mod: nn.Conv, x):
    """nn.Conv forward with fake-quantized input + kernel (conv+bias only,
    mirroring nn.Conv.__call__ / ptq._int8_conv)."""
    kernel = mod.variables["params"]["kernel"].astype(jnp.float32)
    kmax = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12)
    )
    kq = _ste_round_clip(kernel, kmax / _QMAX)

    xf = x.astype(jnp.float32)
    ema = mod.variables.get(EMA_COLLECTION)
    if ema is not None and "in_absmax" in ema:
        absmax = jnp.maximum(ema["in_absmax"].astype(jnp.float32), 1e-12)
    else:  # no seed for this conv: live absmax (stop-grad), still trains
        absmax = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12)
        )
    xq = _ste_round_clip(xf, absmax / _QMAX)

    out = jax.lax.conv_general_dilated(
        xq,
        kq,
        window_strides=_canon2(mod.strides),
        padding=mod.padding,
        rhs_dilation=_canon2(mod.kernel_dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=mod.feature_group_count,
    )
    if mod.use_bias:
        out = out + mod.variables["params"]["bias"].astype(jnp.float32)
    return out.astype(mod.dtype or x.dtype)


def _qat_interceptor(next_fun, args, kwargs, context):
    mod = context.module
    if (
        isinstance(mod, nn.Conv)
        and context.method_name == "__call__"
        and not _unsupported_conv_attrs(mod)
        and mod.variables["params"]["kernel"].ndim == 4
    ):
        mod.sow(
            CALIB_COLLECTION,
            "in_absmax",
            jnp.max(jnp.abs(args[0].astype(jnp.float32))),
            init_fn=lambda: jnp.zeros((), jnp.float32),
            reduce_fn=jnp.maximum,
        )
        return _fake_quant_conv(mod, args[0])
    return next_fun(*args, **kwargs)


def qat_interception():
    """Context manager: any flax apply inside runs convs fake-quantized.

    Apply with ``mutable=[CALIB_COLLECTION]`` to receive the observed
    activation absmaxes for :func:`update_ema`."""
    return nn.intercept_methods(_qat_interceptor)


def qat_apply(model, variables, *inputs, **kwargs):
    """``model.apply`` with fake-quant convs. Returns ``(out, observed)``
    where ``observed`` is the sown absmax collection (feed to
    :func:`update_ema`). Differentiable; jit/grad as usual."""
    with qat_interception():
        out, col = model.apply(
            variables, *inputs, mutable=[CALIB_COLLECTION], **kwargs
        )
    return out, col[CALIB_COLLECTION]


def init_ema(variables, scales: dict):
    """Seed the ``quant_ema`` collection from a ptq.calibrate result."""
    ema: dict = {}
    for path, absmax in scales.items():
        _set_nested(ema, path, {"in_absmax": jnp.asarray(absmax, jnp.float32)})
    out = dict(variables)
    out[EMA_COLLECTION] = ema
    return out


def update_ema(variables, observed, momentum: float = 0.99):
    """Tick the EMA absmaxes with one step's observed values.

    ``observed`` is the sown collection from :func:`qat_apply` — leaves are
    ``(absmax,)`` tuples (flax sow convention). Convs without an existing
    EMA entry are adopted at their observed value. Pure jnp; safe inside or
    outside jit."""
    def _copy(node):
        return {
            k: _copy(v) if isinstance(v, dict) else v for k, v in node.items()
        }

    def _merge(ema_node, obs_node, out):
        for k, v in obs_node.items():
            if isinstance(v, dict):
                out.setdefault(k, {})
                _merge(ema_node.get(k, {}) if ema_node else {}, v, out[k])
            else:  # k == "in_absmax", v is the sown value (maybe a tuple)
                obs = v[0] if isinstance(v, (tuple, list)) else v
                obs = jnp.asarray(obs, jnp.float32)
                prev = ema_node.get(k) if ema_node else None
                out[k] = (
                    momentum * prev + (1.0 - momentum) * obs
                    if prev is not None
                    else obs
                )

    # start from a copy so entries NOT observed this step survive (a conv
    # behind a cond/branch must not lose its trained range)
    new_ema = _copy(variables.get(EMA_COLLECTION, {}))
    _merge(variables.get(EMA_COLLECTION, {}), observed, new_ema)
    out = dict(variables)
    out[EMA_COLLECTION] = new_ema
    return out


def finalize(variables, *, skip=(), strip: bool = False):
    """QAT -> deployable int8: convert the trained params + EMA ranges into
    the standard ptq ``quant`` collection (same artifact ptq.quantize
    produces, so quantized_apply / int8 export work unchanged)."""
    ema = variables.get(EMA_COLLECTION)
    if not ema:
        raise ValueError("variables carry no quant_ema collection "
                         "(run init_ema/update_ema during training)")
    scales = {
        path[:-1]: float(val)
        for path, val in ptq._flatten(ema).items()
        if path[-1] == "in_absmax"
    }
    base = {k: v for k, v in variables.items() if k != EMA_COLLECTION}
    return ptq.quantize(base, scales, skip=skip, strip=strip)
