"""Interleaved A/B of CerberusNet perf variants in ONE process.

Run-to-run variance on the axon backend is ~±0.5 ms, so separate-process
comparisons lie (CLAUDE.md rule 7); this tool compiles every variant up
front, then measures them round-robin for --rounds rounds and reports
per-variant best and median ms/frame. All variants are bit-identical math
(same param tree, same outputs) — only the XLA program structure differs.

Round-3 rewrite (VERDICT r2 W1): the round-2 version reduced only
out["flow"], so XLA dead-code-eliminated the disparity decoder, the seg
head, and the right-image encoder pass — every raced program had ~100 of
the full model's 212 convolutions (tools/dce_check.py reproduces this).
Now every raced program (a) reduces over ALL outputs exactly like
bench.py, (b) perturbs ALL inputs between unrolled iterations so no
encoder pass is loop-invariant-CSE'd, and (c) is timed with the
floor-CANCELLING two-point slope (benchutil.time_fn_two_point's method)
instead of subtracting a drifting floor — the absolutes printed here are
now the same quantity bench.py reports. --census additionally compiles a
conv-count check per variant so a DCE regression fails loudly.

Usage:
  python tools/ab_forward.py                 # headline forward variants
  python tools/ab_forward.py --set upfeat --census
  python tools/ab_forward.py --set opcount --train
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

# Remote compiles dominate this tool's runtime; persist them like bench.py.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-bench")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from cerberusnet_tpu.utils.benchutil import _fetch, _perturb  # noqa: E402


def reduce_all(out):
    """Consume every head — identical to bench.py's reduction, so nothing
    can be dead-code-eliminated (VERDICT r2 W1)."""
    return (
        out["flow"].astype(jnp.float32).mean()
        + out["disp"].astype(jnp.float32).mean()
        + out["seg_logits"].astype(jnp.float32).mean()
    )


def forward_builder(model, variables):
    """build(n) -> jitted n-iteration unroll of the FULL forward (all
    outputs consumed, all inputs perturbed per iteration)."""

    def build(n):
        def run(*imgs0):
            acc = jnp.float32(0)
            cur = imgs0
            for _ in range(n):
                out = model.apply(variables, *cur)
                acc = acc + reduce_all(out)
                cur = _perturb(imgs0, acc)
            return acc

        return jax.jit(run)

    return build


def train_builder(model, variables, imgs, grads_bf16=False):
    """build(n) -> jitted n full train steps (fwd + joint loss + backward +
    adamw). The joint loss consumes all heads, and params change every
    iteration, so nothing is DCE'd or cross-iteration CSE'd.

    grads_bf16: differentiate w.r.t. bf16-cast params (the optim.
    grads_dtype="bfloat16" trainer policy — bf16 backward tensors and
    gradient tree, f32 master weights/optimizer)."""
    import optax

    from cerberusnet_tpu.train import losses

    b, h, w = imgs[0].shape[:3]
    bd = {
        "left": imgs[0], "right": imgs[1], "temporal": imgs[2],
        "seg_labels": jnp.zeros((b, h, w), jnp.int32),
        "flow_gt": jnp.zeros((b, h, w, 2), jnp.float32),
        "flow_valid": jnp.ones((b, h, w), jnp.float32),
        "disp_gt": jnp.ones((b, h, w), jnp.float32),
        "disp_valid": jnp.ones((b, h, w), jnp.float32),
    }
    tx = optax.adamw(1e-4)
    opt_state0 = jax.jit(tx.init)(variables["params"])

    def loss_fn(params, left):
        out = model.apply({"params": params}, left, bd["right"], bd["temporal"])
        total, _ = losses.joint_loss(out, dict(bd, left=left))
        return total

    def grad_fn(params, x):
        if grads_bf16:
            p16 = jax.tree.map(
                lambda v: v.astype(jnp.bfloat16)
                if v.dtype == jnp.float32 else v, params)
            g16 = jax.grad(loss_fn)(p16, x)
            return jax.tree.map(lambda g, p: g.astype(p.dtype), g16, params)
        return jax.grad(loss_fn)(params, x)

    def build(n):
        @jax.jit
        def run(left, right, temporal):
            params, opt_state = variables["params"], opt_state0
            x = left
            for _ in range(n):
                grads = grad_fn(params, x)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                x = left + jax.tree.leaves(params)[0].astype(
                    jnp.float32).mean().astype(left.dtype) * 1e-20
            return jax.tree.leaves(params)[0].astype(jnp.float32).mean()

        return run

    return build


def census_convs(model, variables, imgs, builder, n):
    """Optimized-HLO convolution count of the raced n-unroll vs n x the
    single full apply — the DCE tripwire (tests/test_ab_harness.py pins
    this equality in CI)."""
    from tools.hlo_opcount import census

    single = jax.jit(
        lambda *xs: reduce_all(model.apply(variables, *xs))
    ).lower(*imgs).compile()
    raced = builder(n).lower(*imgs).compile()
    c1 = census(single.as_text()).get("convolution", 0)
    cn = census(raced.as_text()).get("convolution", 0)
    return c1, cn


def variant_sets():
    """Named perf-knob variant sets shared by the A/B racer and the
    HLO op-count census (tools/hlo_opcount.py)."""
    return {
        "stack": {
            "r1 (minor, no-dist)": dict(corr_stack="minor", distribute_outputs=False),
            "corr-major only": dict(corr_stack="major", distribute_outputs=False),
            "dist-outputs only": dict(corr_stack="minor", distribute_outputs=True),
            "r2 (major, dist)": dict(corr_stack="major", distribute_outputs=True),
        },
        # corr formulations (purev is pure up to ~1e-7 reduction-order
        # rounding; pallas_wl is a custom kernel — rank, don't diff bits)
        "corr": {
            "pure (r2 base)": dict(),
            "purev": dict(corr_impl="purev"),
            "pallas_wl": dict(corr_impl="pallas_wl"),
        },
        # op-count / relayout reduction candidates (round 2)
        "opcount": {
            "base": dict(),
            "purev": dict(corr_impl="purev"),
            "s2d": dict(s2d_stem=True),
            "purev+s2d": dict(corr_impl="purev", s2d_stem=True),
        },
        # one-variant set for absolute measurements / censuses
        "single": {
            "base": dict(),
        },
        # up-feat ConvTranspose formulations (VERDICT r1 item 2: suspected
        # source of the layout copies; subpixel = stride-1 conv + d2s).
        # SUBPIXEL IS THE DEFAULT since the r3 promotion, so base==subpixel
        # and the rollback arm must name convt explicitly (the r4i
        # confirmation run raced base vs itself — 10.31 vs 10.45 ms, pure
        # same-program noise — before this was caught).
        "upfeat": {
            "subpixel (base)": dict(),
            "convt": dict(upfeat_impl="convt"),
        },
        # bilinear-2x lowering (round 3): jax.image.resize lowers the spatial
        # interpolation as per-dim dense matmuls that need the spatial dim
        # contracted (transposes/relayouts); the phase-split form is pure
        # slices + weighted adds + an interleave reshape (models/common.py
        # upsample2x_phase — same math, pinned by tests).
        "upsample": {
            "resize (base)": dict(),
            "phase": dict(upsample_impl="phase"),
        },
        # encoder batching: the round-2 "batched loses 1.2-1.4 ms" verdict
        # came from the DCE'd harness (1-2 of the 3 encoder passes pruned);
        # the honest r3 re-race had batched WINNING 10.8 vs 12.0 ms/frame
        # median and it is now the default — this set races the rollback.
        "enc": {
            "batched (base)": dict(),
            "separate": dict(batched_encoder=False),
        },
        # stem input-layout candidates (round 3): the raw 3-channel images
        # cost 664 us/step of relayout copies (profile 'copy' by shape);
        # s2d folds 2x2 space into 12 channels at half res, pad keeps the
        # stride-2 conv but zero-pads the channel axis to a lane-friendlier
        # width. All identical math (tests/test_models.py pins equality).
        "stem": {
            "base": dict(),
            "s2d": dict(s2d_stem=True),
            "pad8": dict(stem_pad_channels=8),
            "pad16": dict(stem_pad_channels=16),
        },
        # estimator input assembly (round 3): "split" (base) consumes the
        # cost volume as its own component; "concat" feeds one explicit
        # concatenate — the r3 forward profile shows 1.31 ms/step of copies
        # around the estimator convs, and an explicit concatenate may be
        # cheaper than the layout copies of the odd-width (81/25-ch) cost
        # volumes. Identical math either way.
        # RACED 2026-08-20 (chain r3i): concat WON, 10.25 vs 10.68 ms/frame
        # median — promoted to default. Variants updated to stay meaningful
        # post-promotion (base is now concat).
        "estin": {
            "concat (base)": dict(),
            "split": dict(est_input="split"),
        },
        # producer-stacked input (round 3): the device-side 3-way input
        # concat + relayouts cost ~1.06 ms/frame in the r3 copy profile;
        # stacked_input moves the stacking to the producer (free host-side
        # buffer arrangement) so the program starts from one (3B,H,W,3)
        # tensor. _stack_inputs is harness metadata: the racer feeds this
        # variant the pre-concatenated tensor (perturbed per iteration like
        # every other input). Identical math + param tree.
        "stackin": {
            "base": dict(),
            "stacked": dict(stacked_input=True, _stack_inputs=True),
        },
        # stride-2 encoder input-gradient (round 3, TRAIN-mode race — the
        # forward is op-identical): "phase" computes the level-entry convs'
        # dx as one dense stride-1 conv + depth-to-space instead of XLA's
        # lhs-dilated convolution (common.py conv_s2_phase; the r3 train
        # profile flags the backward's relayout copies, and the same
        # decomposition won the forward upfeat race). Identical math,
        # gradient equality pinned in tests/test_models.py.
        "gradimpl": {
            "base": dict(),
            "phase": dict(entry_grad="phase"),
        },
        # input-layout control (round 4): compile the SAME program with
        # XLA-chosen (AUTO) input layouts and feed arrays device_put into
        # exactly those layouts. The r3 forward profile charges 664 us/step
        # to relayout copies of the three raw bf16[512,8,132,3] image
        # parameters (the largest single copy shape); with AUTO layouts the
        # relayout moves into the (untimed, host-side) device_put, which is
        # where it belongs for a serving path that can produce the tensor
        # in any layout for free. Same program, same math.
        "layout": {
            "base": dict(),
            "auto-layout": dict(_auto_layout=True),
        },
        # estimator fusion re-race (round 4): fused won +20% in round 1 but
        # that was the floor-method + CSE-leaky harness; every other round-2
        # verdict measured that way flipped or shrank under the honest
        # harness, and the r3 profile still charges 1.31 ms/step of copies
        # to the fused per-component convs (common.py:163). Math/params
        # identical (tests/test_fused_estimator.py).
        "fusedest": {
            "fused (base)": dict(),
            "naive": dict(fused=False),
        },
        # fused Pallas encoder levels (round 4): the first N levels each run
        # as ONE Pallas program (entry s2 conv + two s1 convs + leakys, all
        # intermediates in VMEM, W-folded lane-aligned layout) — the direct
        # attack on the 1.78 ms/step of small-channel layout copies that
        # survived every XLA-level reformulation (r3 verdict item 2).
        # Identical math/params (tests/test_pallas_encoder.py); run
        # tools/penc_smoke.py on hardware BEFORE this race to verify the
        # Mosaic lowering numerically.
        # (lv1 omitted: each variant costs two ~20-min remote compiles on a
        # bad tunnel day; lv2/lv3 bracket the interesting range)
        "penc": {
            "base": dict(),
            "pallas_lv2": dict(pallas_levels=2),
            "pallas_lv3": dict(pallas_levels=3),
        },
        # fused-Pallas-level TRAIN race (round 4): the reverse-sweep kernel
        # (grad=pallas: dx+dw+db in one program, leaky masks recomputed in
        # VMEM) vs the fused-forward-only form (grad=xla) vs base. The r3
        # train profile charges 23.3 ms/step (b2) to copies concentrated in
        # the small-channel encoder backward. Gradients pinned equal in
        # tests/test_pallas_encoder.py.
        # (fwd-only variant omitted — its forward effect is measured by the
        # penc set; train compiles are the most expensive programs we race)
        "pencgrad": {
            "base": dict(),
            "penc_bwd": dict(pallas_levels=2, pallas_grad="pallas"),
            "penc3_bwd": dict(pallas_levels=3, pallas_grad="pallas"),
        },
        # combined round-4 winners (race only AFTER penc and layout have
        # individually won their honest races): the headline-promotion
        # candidate must beat base as a COMBINATION — fusion boundaries and
        # layout choices interact, so independent wins don't guarantee an
        # additive one (CLAUDE.md rule 7).
        "best": {
            "base": dict(),
            "penc2+layout": dict(pallas_levels=2, _auto_layout=True),
            "penc3+layout": dict(pallas_levels=3, _auto_layout=True),
        },
        # lane-aligned wide encoder (round 5, VERDICT r4 item 2): the
        # round-4 irreducibility analysis pins the residual 1.77 ms/step
        # forward copy bucket (and the dominant train-step backward copy
        # pool) to C=16/32 channels on 128-lane hardware; this is the
        # ARCHITECTURE lever it points at — first-level widths 32/64.
        # NOT math-identical (different param tree -> _own_init; needs its
        # own held-out evidence, configs/wide_evidence.json).
        "wide": {
            "base": dict(),
            "wide32/64": dict(
                encoder_channels=(32, 64, 64, 96, 128, 196),
                _own_init=True),
        },
        # bf16-gradient mixed policy (round 5, VERDICT r4 item 3): grads
        # w.r.t. bf16-cast params — bf16 backward tensors + gradient tree,
        # f32 master weights/optimizer (optim.grads_dtype). TRAIN-mode
        # race; convergence gated by the bf16g evidence run, not equality.
        "gradsdtype": {
            "base": dict(),
            "bf16_grads": dict(_grads_bf16=True),
            # the combination both round-5 train levers point at
            "wide+bf16": dict(
                encoder_channels=(32, 64, 64, 96, 128, 196),
                _own_init=True, _grads_bf16=True),
        },
        # whole-level space-to-depth (round 3): all convs of the first N
        # encoder levels at 4x channels / half resolution (zero-structured
        # kernels, math-identical) — the systemic candidate against the
        # level-1/2 layout-copy thrash (encoder.py _s2d_conv).
        "s2dlv": {
            "base": dict(),
            "s2d_levels=1": dict(s2d_levels=1),
            "s2d_levels=2": dict(s2d_levels=2),
            "s2d_levels=3": dict(s2d_levels=3),
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, nargs=2, default=None,
                    metavar=("N1", "N2"),
                    help="two-point unroll counts; slope over N2-N1 frames. "
                    "Defaults: (2,10) forward, (1,4) train — a 10-step "
                    "train unroll is the largest program family we ever "
                    "send the remote compiler (CLAUDE.md rule 8), and the "
                    "slope over 3 full train steps (~180 ms) is already "
                    ">>300x the +-0.5 ms backend noise")
    ap.add_argument("--rounds", type=int, default=5,
                    help="interleaved measurement rounds (compile time "
                    "dominates the tool's cost, so extra rounds are nearly "
                    "free; >=5 required to quote a <10%% promotion — "
                    "VERDICT r3 item 7)")
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--set", default="stack", dest="variant_set",
                    choices=sorted(variant_sets()),
                    help="which variant set to race")
    ap.add_argument("--train", action="store_true",
                    help="race full train steps instead of forwards")
    ap.add_argument("--census", action="store_true",
                    help="verify per-variant conv counts (no DCE) before racing")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend (harness smoke tests only — "
                    "numbers are meaningless; keeps the TPU tunnel untouched)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cerberusnet_tpu.models import CerberusNet

    variants = variant_sets()[args.variant_set]
    h, w = args.hw
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (args.batch, h, w, 3), jnp.bfloat16)
        for i in range(3)
    )

    if args.iters is None:
        args.iters = (1, 4) if args.train else (2, 10)
    n1, n2 = args.iters
    assert n2 > n1 > 0
    runners = {}
    variables = None
    for name, kw in variants.items():
        kw = dict(kw)
        stack_in = kw.pop("_stack_inputs", False)
        auto_layout = kw.pop("_auto_layout", False)
        own_init = kw.pop("_own_init", False)
        grads_bf16 = kw.pop("_grads_bf16", False)
        if grads_bf16 and not args.train:
            raise SystemExit(
                f"variant {name!r} races the gradient dtype policy — "
                "forward programs have no gradients; use --train")
        if stack_in and args.train:
            # train_builder feeds (left, right, temporal) and a batch dict
            # keyed on the separate frames; the stacked variant takes one
            # (3B,H,W,3) tensor (ADVICE r3: fail loudly, don't TypeError
            # deep inside the unroll).
            raise SystemExit(
                f"variant {name!r} uses stacked inputs, which the --train "
                "builder does not support — race it in forward mode")
        model = CerberusNet(dtype=jnp.bfloat16, **kw)
        if variables is None:
            # first variant must be un-stacked; math-identical variants
            # share the identical param tree so one init serves them all
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)
        # architecture variants (different param tree) init their own
        # weights — fine for a timing race, and required for compile
        v_vars = (jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)
                  if own_init else variables)
        v_imgs = (jnp.concatenate(imgs, axis=0),) if stack_in else imgs
        builder = (train_builder(model, v_vars, imgs,
                                 grads_bf16=grads_bf16) if args.train
                   else forward_builder(model, v_vars))
        if args.census and not args.train:
            c1, cn = census_convs(model, v_vars, v_imgs, builder, n1)
            if c1 == 0:
                # The axon remote executable's as_text() carries no countable
                # convolution ops — the tripwire is vacuous on this backend.
                # The CPU-backend equality is pinned in tests/test_ab_harness.py.
                print(f"[census] {name}: backend HLO text has no countable "
                      "convs — tripwire skipped (CPU test pins it)", flush=True)
            else:
                ok = "OK" if cn == n1 * c1 else "DCE!"
                print(f"[census] {name}: single={c1} convs, "
                      f"unroll{n1}={cn} (expect {n1 * c1}) {ok}", flush=True)
                if cn != n1 * c1:
                    raise SystemExit(f"DCE detected in variant {name}")
        pair = (builder(n1), builder(n2))
        if auto_layout:
            from jax.experimental.layout import Format, Layout

            bound = []
            for r in pair:
                comp = (
                    jax.jit(r, in_shardings=Format(Layout.AUTO))
                    .lower(*v_imgs)
                    .compile()
                )
                fmts = comp.input_formats[0]
                put = tuple(
                    jax.device_put(x, f) for x, f in zip(v_imgs, fmts)
                )
                bound.append(lambda c=comp, a=put: c(*a))
            pair = tuple(bound)
        else:
            pair = tuple(
                (lambda r=r, a=v_imgs: r(*a)) for r in pair
            )
        for r in pair:
            _fetch(r())  # compile + warmup
        runners[name] = pair
        print(f"[compiled] {name}", flush=True)

    slopes = {name: [] for name in runners}
    for r in range(args.rounds):
        for name, (run1, run2) in runners.items():
            # n1/n2 back-to-back so both ride the same backend conditions;
            # the slope cancels every per-call constant (drifting floor).
            t0 = time.time()
            _fetch(run1())
            t1 = time.time()
            _fetch(run2())
            t2 = time.time()
            dt = ((t2 - t1) - (t1 - t0)) / (n2 - n1) / args.batch
            slopes[name].append(dt)
            print(f"  round {r}: {name}: {dt * 1e3:.3f} ms/frame", flush=True)

    print(f"\ntwo-point slope (n1={n1}, n2={n2}), batch={args.batch}, {h}x{w}"
          f"{', train' if args.train else ''}, rounds={args.rounds}")
    meds = {}
    for name, ts in slopes.items():
        best, med = min(ts), statistics.median(ts)
        meds[name] = med
        spread = max(ts) - min(ts)
        print(f"{name:24s} best {best * 1e3:7.3f}  median {med * 1e3:7.3f} "
              f"+-{spread * 1e3 / 2:.3f} [{min(ts) * 1e3:.3f}..{max(ts) * 1e3:.3f}] "
              f"ms/frame  ({1.0 / med:6.1f} fps med)")

    # Variance gate (VERDICT r3 item 7): an effect is only promotable when
    # it exceeds the same-arm spread the measurement itself showed. Base =
    # the first variant in the set.
    base_name = next(iter(slopes))
    base_med = meds[base_name]
    base_spread = max(slopes[base_name]) - min(slopes[base_name])
    for name, ts in slopes.items():
        if name == base_name:
            continue
        effect = base_med - meds[name]  # >0: variant faster
        spread = max(max(ts) - min(ts), base_spread)
        # direction-aware: a significant LOSS must not print PROMOTABLE
        # (the r4i upfeat run labelled a 21% regression that way)
        if abs(effect) <= spread:
            verdict = "within variance"
        elif effect > 0:
            verdict = "PROMOTABLE (faster)"
        else:
            verdict = "SIGNIFICANT LOSS (slower)"
        print(f"[gate] {name}: effect {effect * 1e3:+.3f} ms/frame "
              f"({effect / base_med * 100:+.1f}%) vs max same-arm spread "
              f"{spread * 1e3:.3f} ms -> {verdict}")


if __name__ == "__main__":
    main()
