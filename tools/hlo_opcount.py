"""Optimized-HLO op-count diagnostic per model variant.

Round-2 finding (BASELINE.md timing correction): on this backend every
device op carries ~2.4 us of wall overhead the XProf trace never shows, so
total XLA op count is a first-class optimization target alongside
device-busy time. This tool compiles the headline forward (or train step)
for each perf-knob variant and reports the instruction census of the
post-optimization HLO: total ops and the categories that matter
(fusion kernels, convolutions, copies, transposes, concatenates,
dynamic-update-slices).

Usage:
  python tools/hlo_opcount.py                  # forward, current backend
  python tools/hlo_opcount.py --cpu            # force CPU (proxy ranking;
                                               # TPU fusion differs — prefer
                                               # the real backend when up)
  python tools/hlo_opcount.py --train          # train step census
  python tools/hlo_opcount.py --set upfeat     # variant set (ab_forward's)

The census counts instructions in compiled.as_text(): every line of the
form "  %name = op(...)" or "  name = op(...)" inside computations. Fused
elementwise chains appear as ONE fusion instruction — exactly how the
runtime dispatches them, which is what the per-op overhead multiplies.
"""

from __future__ import annotations

import argparse
import re
import sys

sys.path.insert(0, "/root/repo")

_INTERESTING = (
    "fusion",
    "convolution",
    "copy",
    "transpose",
    "concatenate",
    "dynamic-update-slice",
    "custom-call",
    "reduce",
)

_OP_RE = re.compile(r"([a-zA-Z][\w-]*)\($")


def _line_op(line: str):
    """Instruction line '  %name = TYPE op(args), meta' -> 'op' or None."""
    if " = " not in line:
        return None
    rhs = line.split(" = ", 1)[1]
    paren = rhs.find("(")
    # tuple-typed instructions start with '(f32[...], ...) op(...)': the op
    # name is the token immediately before the LAST '(' that opens the
    # argument list — find it by scanning tokens.
    best = None
    for m in re.finditer(r"([a-zA-Z][\w\-.]*)\(", rhs):
        best = m.group(1)
        break_pos = m.start()
        # first identifier '(' after the '=' is the op for non-tuple types;
        # for tuple types the type parens come first but contain no
        # identifier directly before '(' (they start with 'f32['…)
        if not rhs[:break_pos].rstrip().endswith(","):
            break
    return best


def census(hlo_text: str) -> dict:
    """Instruction census of the ENTRY computation only — fusion bodies are
    dispatched as one kernel, so only entry-level instructions carry the
    per-op overhead."""
    counts: dict = {"total": 0}
    in_entry = False
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            break
        if not in_entry:
            continue
        op = _line_op(line)
        if op is None:
            continue
        op = op.split(".")[0].replace("_", "-")
        if op in ("parameter", "constant", "tuple", "get-tuple-element"):
            continue
        counts["total"] += 1
        if op in _INTERESTING:
            counts[op] = counts.get(op, 0) + 1
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--flatten", action="store_true",
                    help="train census with optax.flatten(adamw)")
    ap.add_argument("--set", default="opcount", dest="variant_set")
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cerberusnet_tpu.models import CerberusNet
    from tools.ab_forward import variant_sets  # shared knob definitions

    variants = variant_sets()[args.variant_set]
    h, w = args.hw
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (args.batch, h, w, 3), jnp.bfloat16)
        for i in range(3)
    )
    print(
        f"# backend={jax.devices()[0].platform} hw={h}x{w} b{args.batch} "
        f"{'train' if args.train else 'forward'} set={args.variant_set}"
    )
    variables = None
    for name, kw in variants.items():
        model = CerberusNet(dtype=jnp.bfloat16, **kw)
        if variables is None:
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)
        if args.train:
            import optax

            tx = optax.adamw(1e-4)
            if args.flatten:
                tx = optax.flatten(tx)
            opt_state = tx.init(variables["params"])

            def step(v, os_, a, b, c, model=model, tx=tx):
                def loss(v):
                    out = model.apply(v, a, b, c)
                    return (
                        out["flow"].astype(jnp.float32).mean()
                        + out["disp"].astype(jnp.float32).mean()
                        + (out["seg_logits"].astype(jnp.float32) ** 2).mean()
                    )

                g = jax.grad(loss)(v)
                up, os2 = tx.update(g["params"], os_, v["params"])
                return (
                    {"params": optax.apply_updates(v["params"], up)},
                    os2,
                )

            lowered = jax.jit(step).lower(variables, opt_state, *imgs)
        else:
            lowered = jax.jit(model.apply).lower(variables, *imgs)
        compiled = lowered.compile()
        c = census(compiled.as_text())
        cats = " ".join(
            f"{k}={c[k]}" for k in _INTERESTING if c.get(k)
        )
        print(f"{name:>20}: total={c['total']:5d}  {cats}", flush=True)


if __name__ == "__main__":
    main()
