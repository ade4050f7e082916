"""Op-level TPU profile reports from jax.profiler traces (SURVEY.md §6.1).

`Trainer.profile()` / `jax.profiler.trace()` write a Perfetto trace; this
tool digests it into the tables that actually drive optimization work:

  * per-category device time (fusion=compute vs copy/concatenate=formatting)
  * top single ops with their HLO metadata
  * per-source-line attribution (which model line produced the op)

This is the analysis that located the 3.8 ms/step of layout copies and the
concatenate overhead in the joint model (see STATUS.md perf notes).

Usage:
  python tools/profile_report.py <trace_dir_or_json.gz> [--steps N] [--top K]

<trace_dir> is the directory passed to jax.profiler.trace(); the newest
plugins/profile/*/[host].trace.json.gz inside it is used.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    cands = sorted(
        glob.glob(os.path.join(path, "plugins", "profile", "*", "*.trace.json.gz"))
    )
    if not cands:
        raise FileNotFoundError(f"no *.trace.json.gz under {path}")
    return cands[-1]


def load_device_events(trace_path: str):
    with gzip.open(trace_path, "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = [
        e
        for e in events
        if e.get("ph") == "X"
        and "dur" in e
        and pids.get(e["pid"], "").startswith("/device:")
    ]
    return dev


def report(trace_path: str, steps: int = 1, top: int = 20, out=sys.stdout):
    dev = load_device_events(trace_path)

    def w(line=""):
        print(line, file=out)

    # ---- per-category ----
    cat = collections.defaultdict(float)
    cnt = collections.defaultdict(int)
    by_name = collections.defaultdict(float)
    meta = {}
    total = 0.0
    for e in dev:
        name = e["name"]
        if name.startswith("jit_"):  # the enclosing program event
            continue
        key = re.sub(r"[.\d]+$", "", name)
        cat[key] += e["dur"]
        cnt[key] += 1
        by_name[name] += e["dur"]
        if name not in meta:
            meta[name] = e.get("args", {})
        total += e["dur"]

    w(f"== device op time by category (us / step, {steps} step(s) captured) ==")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:15]:
        w(f"{v / steps:10.1f} us  {cnt[k] // steps:5d} ops  {k}")
    w(f"{total / steps:10.1f} us  TOTAL")

    # ---- top ops ----
    w()
    w(f"== top {top} ops ==")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        m = meta.get(name, {})
        shape = m.get("shape_with_layout", "")
        src = m.get("source", "")
        w(f"{dur / steps:9.1f} us  {name:<28s} {shape[:44]:<44s} {src}")

    # ---- timeline: device span vs busy (where wall time actually goes) ----
    # Sum-of-durations says what the device did; the SPAN (last end - first
    # start) says how long the program took. The difference is idle gaps —
    # invisible to the per-category table, but real wall time (round-2: the
    # two-point bench said 10.5 ms/frame while busy time said 5.7 ms).
    w()
    w("== timeline (per device track) ==")
    by_track = collections.defaultdict(list)
    for e in dev:
        if e["name"].startswith("jit_"):
            continue
        by_track[(e["pid"], e.get("tid"))].append(e)
    for (pid, tid), evs in sorted(by_track.items()):
        evs.sort(key=lambda e: e["ts"])
        span = (evs[-1]["ts"] + evs[-1]["dur"]) - evs[0]["ts"]
        busy = sum(e["dur"] for e in evs)
        # merge overlapping intervals to get true occupancy + gap list
        gaps = []
        cur_end = evs[0]["ts"]
        occ = 0.0
        for e in evs:
            s, d = e["ts"], e["dur"]
            if s > cur_end:
                gaps.append((cur_end, s - cur_end, e["name"]))
            new_end = max(cur_end, s + d)
            occ += new_end - max(cur_end, s)
            cur_end = new_end
        w(
            f"track pid={pid} tid={tid}: span {span / steps:9.1f} us/step, "
            f"occupied {occ / steps:9.1f} us/step "
            f"({100 * occ / max(span, 1):.0f}%), busy-sum {busy / steps:9.1f}, "
            f"{len(evs) // steps} events/step"
        )
        gaps.sort(key=lambda g: -g[1])
        for ts, dur, nxt in gaps[:8]:
            w(f"    gap {dur:9.1f} us before {nxt[:60]}")

    # ---- per-source attribution ----
    w()
    w("== device time by source line ==")
    src_t = collections.defaultdict(float)
    src_n = collections.defaultdict(int)
    for name, dur in by_name.items():
        s = meta.get(name, {}).get("source", "?")
        src_t[s] += dur
        src_n[s] += 1
    for s, v in sorted(src_t.items(), key=lambda kv: -kv[1])[:15]:
        w(f"{v / steps:10.1f} us  {src_n[s]:5d} ops  {s}")

    return {"total_us_per_step": total / steps}


def category_report(trace_path: str, category: str, steps: int = 1,
                    top: int = 20, out=sys.stdout):
    """Per-source and per-shape totals for one op category (name prefix)."""
    dev = load_device_events(trace_path)

    def w(line=""):
        print(line, file=out)

    src_t = collections.defaultdict(float)
    src_n = collections.defaultdict(int)
    shape_t = collections.defaultdict(float)
    shape_n = collections.defaultdict(int)
    combo_t = collections.defaultdict(float)
    combo_n = collections.defaultdict(int)
    total = 0.0
    for e in dev:
        name = e["name"]
        if name.startswith("jit_"):
            continue
        if re.sub(r"[.\d]+$", "", name) != category:
            continue
        m = e.get("args", {})
        src = m.get("source", "?")
        src_t[src] += e["dur"]
        src_n[src] += 1
        sh = m.get("shape_with_layout", "?")
        shape_t[sh] += e["dur"]
        shape_n[sh] += 1
        combo_t[(src, sh)] += e["dur"]
        combo_n[(src, sh)] += 1
        total += e["dur"]

    w()
    w(f"== '{category}' by source ({total / steps:.1f} us/step total) ==")
    for s, v in sorted(src_t.items(), key=lambda kv: -kv[1])[:top]:
        w(f"{v / steps:10.1f} us  {src_n[s] // steps:5d} ops  {s}")
    w()
    w(f"== '{category}' by shape ==")
    for s, v in sorted(shape_t.items(), key=lambda kv: -kv[1])[:top]:
        w(f"{v / steps:10.1f} us  {shape_n[s] // steps:5d} ops  {s[:80]}")
    w()
    w(f"== '{category}' by (source, shape) ==")
    for (src, sh), v in sorted(combo_t.items(), key=lambda kv: -kv[1])[:top]:
        w(f"{v / steps:10.1f} us  {combo_n[(src, sh)] // steps:5d} ops  "
          f"{sh[:60]:<60s} {src}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", help="trace dir (from jax.profiler.trace) or .json.gz")
    ap.add_argument("--steps", type=int, default=1,
                    help="steps captured inside the trace (divides times)")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--category", default=None,
                    help="also print a per-source / per-shape breakdown of "
                    "ONE op category (e.g. 'copy')")
    args = ap.parse_args(argv)
    report(find_trace(args.trace), steps=args.steps, top=args.top)
    if args.category:
        category_report(find_trace(args.trace), args.category, steps=args.steps,
                        top=args.top)
    return 0


if __name__ == "__main__":
    sys.exit(main())
