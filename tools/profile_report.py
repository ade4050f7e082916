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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", help="trace dir (from jax.profiler.trace) or .json.gz")
    ap.add_argument("--steps", type=int, default=1,
                    help="steps captured inside the trace (divides times)")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args(argv)
    report(find_trace(args.trace), steps=args.steps, top=args.top)
    return 0


if __name__ == "__main__":
    sys.exit(main())
