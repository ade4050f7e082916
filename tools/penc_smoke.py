"""Hardware smoke test for the fused Pallas encoder levels (round 4).

Run BEFORE racing `ab_forward --set penc`: the kernel's CPU-interpret
equality is pinned in tests/test_pallas_encoder.py, but the Mosaic TPU
lowering (strided outer slices, lane-concats, sublane-offset stores) must be
verified numerically on the real chip once. Compiles small, then checks the
full CerberusNet forward at the bench shape.

Exits nonzero on any mismatch. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/penc_smoke.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-bench")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    from cerberusnet_tpu.ops.pallas.encoder_level import (
        encoder_level,
        encoder_level_xla,
    )

    failures = 0

    # --- 1. raw kernel, small shapes, f32 + bf16
    # Tolerance policy (VERDICT r4 item 5 + ADVICE r4): each case carries
    # the tightest tolerance its measured hardware behavior supports, so
    # rc=0 means "documented contract holds" and rc=1 means "real
    # regression" — never a permanently-red gate.
    #   * c=3 f32 cases measured 1.3e-07 / 3.4e-06 on hardware (chain
    #     r4g): tight 1e-5 keeps regression-catching power.
    #   * the 16->32 f32 case hits the documented MXU exception — Mosaic
    #     supports only bf16 operand precision, so f32 matmul operands
    #     round to bf16 (~1e-3 rel; see encoder_level._dot). Measured
    #     6.6e-04; budget 2e-3. This is the contract, not a regression.
    #   * the production bf16 path measured 7.2e-03 (accumulation-order
    #     difference vs XLA's conv at f32 accumulation): budget 3e-2.
    for (b, h, w, c, f, dt, tol) in [
        (1, 32, 64, 3, 16, jnp.float32, 1e-5),
        (2, 64, 128, 3, 16, jnp.float32, 1e-5),
        (1, 256, 512, 16, 32, jnp.float32, 2e-3),
        (1, 512, 1024, 3, 16, jnp.bfloat16, 3e-2),
    ]:
        ks = jax.random.split(jax.random.PRNGKey(b * h + w), 7)
        x = jax.random.normal(ks[0], (b, h, w, c), dt)
        kb = [
            jax.random.normal(ks[1], (3, 3, c, f), jnp.float32) * 0.2,
            jax.random.normal(ks[2], (f,), jnp.float32) * 0.1,
            jax.random.normal(ks[3], (3, 3, f, f), jnp.float32) * 0.2,
            jax.random.normal(ks[4], (f,), jnp.float32) * 0.1,
            jax.random.normal(ks[5], (3, 3, f, f), jnp.float32) * 0.2,
            jax.random.normal(ks[6], (f,), jnp.float32) * 0.1,
        ]
        if dt == jnp.bfloat16:
            kb = [v.astype(dt) for v in kb]
        out = np.asarray(
            jax.jit(lambda x, *kb: encoder_level(x, *kb))(x, *kb),
            dtype=np.float32,
        )
        ref = np.asarray(
            jax.jit(encoder_level_xla)(x, *kb), dtype=np.float32
        )
        scale = max(1.0, float(np.abs(ref).max()))
        diff = float(np.abs(out - ref).max()) / scale
        ok = diff < tol
        failures += 0 if ok else 1
        print(
            f"[penc_smoke] level {b}x{h}x{w}x{c}->{f} {jnp.dtype(dt).name}: "
            f"max rel diff {diff:.2e} ({'OK' if ok else 'FAIL'})",
            flush=True,
        )

    # --- 2. full joint model at the bench shape, bf16
    from cerberusnet_tpu.models import CerberusNet

    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (1, 512, 1024, 3),
                          jnp.bfloat16)
        for i in range(3)
    )
    base = CerberusNet(dtype=jnp.bfloat16)
    pal = CerberusNet(dtype=jnp.bfloat16, pallas_levels=2)
    v = jax.jit(base.init)(jax.random.PRNGKey(0), *imgs)
    o0 = jax.jit(base.apply)(v, *imgs)
    o1 = jax.jit(pal.apply)(v, *imgs)
    for k in ("flow", "disp", "seg_logits"):
        a = np.asarray(o0[k], np.float32)
        bb = np.asarray(o1[k], np.float32)
        scale = max(1.0, float(np.abs(a).max()))
        diff = float(np.abs(a - bb).max()) / scale
        # Measured on hardware (chain r4g): flow 7.8e-3 / disp 9.5e-3 /
        # seg 1.4e-3 — bf16 accumulation-order scale, budget 3e-2.
        ok = diff < 0.03
        failures += 0 if ok else 1
        print(f"[penc_smoke] cerberus.{k}: max rel diff {diff:.2e} "
              f"({'OK' if ok else 'FAIL'})", flush=True)

    # --- 3. standalone level timing: pallas kernel vs the XLA conv chain
    # at the batched-encoder shapes (B=3). Standalone wins don't guarantee
    # end-to-end wins (CLAUDE.md rule 7) but a standalone LOSS predicts an
    # ab_penc failure for ~4 fewer big compiles.
    from cerberusnet_tpu.utils.benchutil import time_fn_two_point

    for (b, h, w, c, f) in [(3, 512, 1024, 3, 16), (3, 256, 512, 16, 32)]:
        ks = jax.random.split(jax.random.PRNGKey(7), 7)
        x = jax.random.normal(ks[0], (b, h, w, c), jnp.bfloat16)
        kb = [
            (jax.random.normal(ks[2 * i + 1], (3, 3, c if i == 0 else f, f),
                               jnp.float32) * 0.2).astype(jnp.bfloat16)
            for i in range(3)
        ]
        bs = [
            (jax.random.normal(ks[2 * i + 2], (f,), jnp.float32) * 0.1
             ).astype(jnp.bfloat16)
            for i in range(3)
        ]
        flat = (kb[0], bs[0], kb[1], bs[1], kb[2], bs[2])
        for label, fn in (
            ("xla", lambda xx, *a: encoder_level_xla(xx, *a)),
            ("pallas", lambda xx, *a: encoder_level(xx, *a)),
        ):
            try:
                sec = time_fn_two_point(
                    fn, (x,) + flat, iters=(2, 10),
                    reduce_out=lambda o: o.astype(jnp.float32).mean(),
                )
                print(f"[penc_smoke] timing level {h}x{w} c{c}->f{f} "
                      f"{label}: {sec * 1e3:.3f} ms/call", flush=True)
            except Exception as e:
                print(f"[penc_smoke] timing {label} failed: {e}", flush=True)

    if failures:
        print(f"[penc_smoke] {failures} FAILURES", flush=True)
        return 1
    print("[penc_smoke] all OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
