"""AOT export for deployment (SURVEY.md §3 C15/C16, §4.3).

The reference's ONNX -> TensorRT path becomes: jax.export of the jitted
bf16 inference function to serialized StableHLO (weights baked in as
constants, exactly like a TRT engine freezes weights), plus a JSON manifest
of input/output signatures. Consumers:

  * Python: `load_exported(path).call(*args)` — jax.export roundtrip.
  * C++:   native/pjrt_runner loads the same artifact through the PJRT C
           API (the deployment-runtime analogue of the reference's C++
           TensorRT runner; SURVEY.md §7 step 8). The Pallas correlation
           kernels ride inside the StableHLO program as tpu custom calls —
           the capability the reference needed TRT plugins (C17) for is
           free here: one program, no plugin registry.

Artifact layout: <dir>/model.stablehlo (bytecode), <dir>/manifest.json.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def export_inference(fn, example_args, platforms=None):
    """jax.export a jitted callable closed over its weights.

    fn: callable taking only array args (weights already bound).
    example_args: tuple of arrays/ShapeDtypeStructs defining the signature.
    platforms: e.g. ['tpu'] or ['cpu'] — defaults to the current backend.
    """
    from jax import export as jax_export

    if platforms is None:
        platforms = [jax.default_backend()]
    exported = jax_export.export(jax.jit(fn), platforms=platforms)(*example_args)
    return exported


def save_exported(exported, out_dir: str) -> str:
    """Write <dir>/model.stablehlo (jax.export blob, Python consumer),
    <dir>/model.mlir (raw StableHLO text for the C++ PJRT runner, which
    feeds it straight to PJRT_Client_Compile), and manifest.json."""
    os.makedirs(out_dir, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(out_dir, "model.stablehlo"), "wb") as f:
        f.write(blob)
    with open(os.path.join(out_dir, "model.mlir"), "w") as f:
        f.write(exported.mlir_module())
    # Serialized xla.CompileOptionsProto (num_replicas=1) for the C++ PJRT
    # runner — PJRT_Client_Compile with empty options defaults to 0 replicas
    # and fails.
    try:
        from jax._src.lib import xla_client

        with open(os.path.join(out_dir, "compile_options.pb"), "wb") as f:
            f.write(xla_client.CompileOptions().SerializeAsString())
    except Exception:
        pass  # runner can still be given options out-of-band
    manifest = {
        "platforms": list(exported.platforms),
        "inputs": [
            {"shape": list(a.shape), "dtype": str(a.dtype)}
            for a in exported.in_avals
        ],
        "outputs": [
            {"shape": list(a.shape), "dtype": str(a.dtype)}
            for a in exported.out_avals
        ],
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir


def load_exported(path_or_dir: str):
    """Deserialize an exported artifact; returns the jax.export.Exported
    (call via `.call(*args)`)."""
    from jax import export as jax_export

    path = path_or_dir
    if os.path.isdir(path):
        path = os.path.join(path, "model.stablehlo")
    with open(path, "rb") as f:
        blob = f.read()
    return jax_export.deserialize(blob)


def export_cerberus(variables, model, hw=(512, 1024), batch: int = 1,
                    dtype=jnp.bfloat16, out_dir: str = "export_artifact"):
    """Convenience: export the full 3-head inference graph with weights
    baked in ([BASELINE:L10] configuration)."""
    h, w = hw
    example = tuple(
        jax.ShapeDtypeStruct((batch, h, w, 3), dtype) for _ in range(3)
    )

    def infer(left, right, temporal):
        out = model.apply(variables, left, right, temporal)
        # deployment surface: the three full-res outputs only
        return out["seg_logits"], out["flow"], out["disp"]

    exported = export_inference(infer, example)
    return save_exported(exported, out_dir)
