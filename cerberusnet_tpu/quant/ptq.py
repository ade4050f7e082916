"""Post-training int8 quantization (PTQ).

The reference deploys through TensorRT with fp16 **and int8** engine builds
on Jetson Xavier (SURVEY.md §3 C16, §4.3). This module is the TPU-native
equivalent: calibration-based symmetric int8 quantization whose convolutions
execute as int8 x int8 -> int32 on the MXU (2x bf16 peak throughput on
v5e), with dequant + bias + activation staying in XLA's fused epilogue.

Scheme (mirrors TRT's default):
  * weights  — per-output-channel symmetric int8, computed from the trained
    f32 kernels at quantization time (no calibration needed);
  * activations — per-tensor symmetric int8, scale = absmax/127 where the
    absmax is gathered by running calibration batches through the model;
  * only ``nn.Conv`` layers quantize; ``nn.ConvTranspose`` upsampling paths,
    correlation/warp ops, resizes and heads' f32 epilogues stay in the
    compute dtype — exactly like TRT engines keeping custom plugins fp16.

Everything is built on flax method interception, so NO model changes are
needed — the same ``CerberusNet``/``DCV*`` module defs serve f32, bf16 and
int8. One interaction to know: the fused estimator formulation
(models/common.py FusedDenseEstimator) computes its convs through raw lax
ops, which interception cannot see — quantize with ``fused=False`` models
(the param trees are identical, so the same weights drop straight in;
``Trainer.export(quant='int8')`` handles this automatically). The three
phases:

  1. ``calibrate(model, variables, batches)`` -> ``{path: absmax}`` —
     runs batches through the unmodified model under an interceptor that
     ``sow``s the absmax of every conv input (jit-compatible; one compile).
  2. ``quantize(model_variables, scales)`` -> new variables dict with a
     ``quant`` collection holding int8 kernels + scales next to ``params``
     (optionally stripping the f32 kernels to reclaim HBM).
  3. ``quantized_apply(model, qvariables, *inputs)`` — applies the model
     with quantized convs. jit/AOT-export this like any other forward; the
     int8 graph serializes through export/aot.py to the C++ PJRT runner
     unchanged.

Reference parity note: the reference tree was empty (SURVEY.md §0); the
capability surface here follows [BASELINE:L5] "TensorRT/Xavier export path"
and standard TRT int8 PTQ practice.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

CALIB_COLLECTION = "quant_calib"
QUANT_COLLECTION = "quant"
_QMAX = 127.0


# ---------------------------------------------------------------------------
# phase 1: calibration
# ---------------------------------------------------------------------------

def _calib_interceptor(next_fun, args, kwargs, context):
    mod = context.module
    if isinstance(mod, nn.Conv) and context.method_name == "__call__":
        absmax = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
        mod.sow(
            CALIB_COLLECTION,
            "in_absmax",
            absmax,
            init_fn=lambda: jnp.zeros((), jnp.float32),
            reduce_fn=jnp.maximum,
        )
    return next_fun(*args, **kwargs)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def calibrate(model, variables, batches: Iterable[tuple], method_kwargs=None):
    """Run calibration batches; return ``{conv_path: activation_absmax}``.

    ``batches``: iterable of input tuples, each passed as
    ``model.apply(variables, *batch)``. Scales max-reduce across batches.
    One jit compile total (shapes must match across batches).
    """
    method_kwargs = method_kwargs or {}

    @jax.jit
    def one(vars_, *inputs):
        with nn.intercept_methods(_calib_interceptor):
            _, col = model.apply(
                vars_, *inputs, mutable=[CALIB_COLLECTION], **method_kwargs
            )
        return col[CALIB_COLLECTION]

    merged: dict[tuple, float] = {}
    for batch in batches:
        col = jax.device_get(one(variables, *batch))
        for path, val in _flatten(col).items():
            assert path[-1] == "in_absmax"
            key = path[:-1]
            merged[key] = max(merged.get(key, 0.0), float(val))
    if not merged:
        raise ValueError("calibration saw no nn.Conv calls")
    return merged


# ---------------------------------------------------------------------------
# phase 2: weight quantization
# ---------------------------------------------------------------------------

def _get_nested(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set_nested(tree, path, value):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def quantize(
    variables,
    scales: dict,
    *,
    skip: Sequence[str] = (),
    strip: bool = False,
):
    """Build the ``quant`` collection from trained f32 params.

    scales: calibration result from :func:`calibrate`.
    skip:   substrings matched against the "/".join(path) of each conv —
            matching convs stay unquantized (e.g. sensitive prediction
            layers).
    strip:  replace quantized f32 kernels in ``params`` with empty
            placeholders, reclaiming HBM (the quantized apply never reads
            them). The returned variables then only work through
            :func:`quantized_apply`.
    """
    params = jax.tree.map(lambda x: x, variables["params"])  # shallow-ish copy
    targets = []
    for path, absmax in sorted(scales.items()):
        name = "/".join(path)
        if any(s in name for s in skip):
            continue
        if _get_nested(params, path)["kernel"].ndim != 4:
            continue  # only spatial convs
        targets.append((path, absmax))
    if not targets:
        raise ValueError("no convs quantized (all skipped?)")

    # One jitted program for the whole tree — eager per-conv dispatch costs
    # seconds apiece on the remote backend (CLAUDE.md env rule 4).
    @jax.jit
    def _quantize_all(p):
        col: dict = {}
        for path, absmax in targets:
            kernel = jnp.asarray(_get_nested(p, path)["kernel"], jnp.float32)
            kmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
            scale_w = jnp.maximum(kmax, 1e-12) / _QMAX
            kq = jnp.clip(jnp.round(kernel / scale_w), -_QMAX, _QMAX).astype(jnp.int8)
            in_scale = jnp.asarray(max(absmax, 1e-12) / _QMAX, jnp.float32)
            _set_nested(
                col,
                path,
                {"kernel_q": kq, "scale_w": scale_w, "in_scale": in_scale},
            )
        return col

    quant_col = _quantize_all(params)
    if strip:
        for path, _ in targets:
            _get_nested(params, path)["kernel"] = jnp.zeros((0,), jnp.float32)
    out = dict(variables)
    out["params"] = params
    out[QUANT_COLLECTION] = quant_col
    return out


# ---------------------------------------------------------------------------
# phase 3: quantized inference
# ---------------------------------------------------------------------------

def _canon2(v):
    if v is None:
        return (1, 1)
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def _unsupported_conv_attrs(mod: nn.Conv):
    """nn.Conv features _int8_conv does NOT forward to conv_general_dilated.

    Executing such a conv quantized would silently change semantics
    (ADVICE r1), so the interceptor falls through to the float path for
    these instead.
    """
    reasons = []
    if _canon2(mod.input_dilation) != (1, 1):
        reasons.append(f"input_dilation={mod.input_dilation}")
    if mod.mask is not None:
        reasons.append("mask")
    if not isinstance(mod.padding, str) and mod.padding is not None:
        # explicit ((lo, hi), ...) padding is representable, but keep the
        # guard conservative: only the string modes are golden-tested.
        reasons.append(f"padding={mod.padding!r}")
    return reasons


def _int8_conv(mod: nn.Conv, x, q, simulate: bool):
    """Execute a flax Conv as int8 x int8 -> int32 with f32 epilogue.

    simulate=True runs the quant-dequant in f32 instead (identical numerics
    up to accumulation order) — for isolating quantization error from
    backend int8 support.
    """
    s_x = q["in_scale"]
    s_w = q["scale_w"]
    xf = x.astype(jnp.float32)
    xq = jnp.clip(jnp.round(xf / s_x), -_QMAX, _QMAX)
    dn = ("NHWC", "HWIO", "NHWC")
    common = dict(
        window_strides=_canon2(mod.strides),
        padding=mod.padding,
        rhs_dilation=_canon2(mod.kernel_dilation),
        dimension_numbers=dn,
        feature_group_count=mod.feature_group_count,
    )
    if simulate:
        acc = jax.lax.conv_general_dilated(
            xq, q["kernel_q"].astype(jnp.float32), **common
        )
    else:
        acc = jax.lax.conv_general_dilated(
            xq.astype(jnp.int8),
            q["kernel_q"],
            preferred_element_type=jnp.int32,
            **common,
        ).astype(jnp.float32)
    out = acc * (s_x * s_w)
    if mod.use_bias:
        out = out + mod.variables["params"]["bias"].astype(jnp.float32)
    return out.astype(mod.dtype or x.dtype)


def _make_quant_interceptor(simulate: bool):
    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if isinstance(mod, nn.Conv) and context.method_name == "__call__":
            qvars = mod.variables.get(QUANT_COLLECTION)
            if qvars and "kernel_q" in qvars:
                if _unsupported_conv_attrs(mod):
                    return next_fun(*args, **kwargs)  # float fallback
                return _int8_conv(mod, args[0], qvars, simulate)
        return next_fun(*args, **kwargs)

    return interceptor


def quant_interception(simulate: bool = False):
    """Context manager under which ANY flax apply runs calibrated convs as
    int8 (variables must carry the ``quant`` collection from
    :func:`quantize`). Lets callers with their own apply-adapters (e.g. the
    trainer's variant-normalizing ``forward``) opt into quantization."""
    return nn.intercept_methods(_make_quant_interceptor(simulate))


def quantized_apply(model, qvariables, *inputs, simulate: bool = False, **kwargs):
    """``model.apply`` with calibrated convs running int8 (MXU s8 path).

    Convs without a ``quant`` entry (skipped at quantize time, or
    ConvTranspose) run their normal compute-dtype path. jit / export the
    returned closure like any other forward.
    """
    with quant_interception(simulate):
        return model.apply(qvariables, *inputs, **kwargs)


# ---------------------------------------------------------------------------
# diagnostics
# ---------------------------------------------------------------------------

def quantization_error(
    model,
    variables,
    qvariables,
    batch: tuple,
    *,
    simulate: bool = False,
    reduce_fn: Callable | None = None,
):
    """Per-output relative L2 error of the quantized model on one batch."""
    ref = jax.jit(model.apply)(variables, *batch)
    qout = jax.jit(
        lambda v, *b: quantized_apply(model, v, *b, simulate=simulate)
    )(qvariables, *batch)

    def rel(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.linalg.norm(a.ravel()) + 1e-12
        return float(np.linalg.norm((a - b).ravel()) / denom)

    flat_r = _flatten(ref) if isinstance(ref, dict) else {("out",): ref}
    flat_q = _flatten(qout) if isinstance(qout, dict) else {("out",): qout}
    errs = {"/".join(map(str, k)): rel(flat_r[k], flat_q[k]) for k in flat_r}
    if reduce_fn:
        return reduce_fn(errs)
    return errs
