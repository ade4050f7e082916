"""Serial TPU experiment chain with a DURABLE, committed ledger.

Round 2 lost three hardware items to silent chain death in /tmp (VERDICT
r2 W5/item 8): shell chains logged only to /tmp, timed out without trace,
and the committed state silently reflected none of it. This runner:

  * executes steps strictly serially (TPU experiments must never overlap —
    CLAUDE.md rule 9), waiting for the tunnel before each step and
    yielding to bench.py's sentinel between steps;
  * appends every step outcome (name, cmd, rc, duration, log path, log
    tail) to ``runs/queue_ledger.json`` IMMEDIATELY after the step ends,
    so a killed chain still leaves a complete record of what ran;
  * exits nonzero if ANY step had rc != 0 — a failed chain can't be
    mistaken for a finished one.

The ledger path is git-tracked (``!runs/queue_ledger.json`` in
.gitignore); commit it with the results it describes.

Usage:
  python tools/chain_run.py CHAIN_NAME --steps steps.json
  python tools/chain_run.py CHAIN_NAME --step name1 'cmd1' --step name2 'cmd2'

steps.json: [{"name": ..., "cmd": ..., "timeout": seconds}, ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "runs", "queue_ledger.json")
BENCH_SENTINEL = "/tmp/cerberus_bench_request"
# Pid-stamped marker present while a step is mid-flight: bench.py waits for
# it so a benchmark never overlaps an already-running step (the bench
# sentinel alone only makes chains yield BETWEEN steps).
CHAIN_BUSY = "/tmp/cerberus_chain_busy"


def _load_ledger() -> dict:
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            return json.load(f)
    return {"chains": []}


def _save_ledger(ledger: dict) -> None:
    os.makedirs(os.path.dirname(LEDGER), exist_ok=True)
    tmp = LEDGER + ".tmp"
    with open(tmp, "w") as f:
        json.dump(ledger, f, indent=2)
    os.replace(tmp, LEDGER)


def wait_for_tunnel(budget_s: float = 10800, probe_timeout: int = 60) -> bool:
    """Probe jax.devices() in short-lived subprocesses (a wedged tunnel
    hangs a client forever in the claim loop — CLAUDE.md rule 9)."""
    deadline = time.time() + budget_s
    while time.time() < deadline:
        try:
            rc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True, cwd=REPO,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return True
        time.sleep(120)
    return False


def yield_to_bench() -> None:
    while os.path.exists(BENCH_SENTINEL):
        try:
            with open(BENCH_SENTINEL) as f:
                pid = int(f.read().strip() or 0)
        except (OSError, ValueError):
            pid = 0
        if pid:
            try:
                os.kill(pid, 0)
            except OSError:
                os.remove(BENCH_SENTINEL)  # stale
                return
        time.sleep(60)


def run_chain(name: str, steps: list[dict], tunnel_budget: float) -> int:
    ledger = _load_ledger()
    chain = {
        "chain": name,
        "started": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "steps": [],
        "done": False,
    }
    ledger["chains"].append(chain)
    _save_ledger(ledger)

    any_fail = False
    for i, step in enumerate(steps):
        sname = step["name"]
        cmd = step["cmd"]
        tmo = float(step.get("timeout", 3600))
        log_path = f"/tmp/chain_{name}_{i:02d}_{sname}.log"
        # Pre-register with rc="started": a step killed mid-flight leaves an
        # EXPLICIT marker instead of a record with no rc (VERDICT r3 W2 /
        # item 8 — the r3h bench_all provenance hole). Completion overwrites
        # it with the real integer rc below.
        rec = {"name": sname, "cmd": cmd, "timeout": tmo, "log": log_path,
               "rc": "started",
               "started": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
        chain["steps"].append(rec)
        _save_ledger(ledger)

        if not wait_for_tunnel(tunnel_budget):
            rec["rc"] = "tunnel-timeout"
            any_fail = True
            _save_ledger(ledger)
            print(f"[chain {name}] step {sname}: tunnel never came up",
                  flush=True)
            continue
        yield_to_bench()

        t0 = time.time()
        try:
            with open(CHAIN_BUSY, "w") as f:
                f.write(str(os.getpid()))
        except OSError:
            pass
        # Close the bench-vs-chain TOCTOU (ADVICE r3): if bench posted its
        # sentinel in the window between yield_to_bench() above and the
        # CHAIN_BUSY write, drop the marker, yield again, and re-acquire.
        while os.path.exists(BENCH_SENTINEL):
            try:
                os.remove(CHAIN_BUSY)
            except OSError:
                pass
            yield_to_bench()
            try:
                with open(CHAIN_BUSY, "w") as f:
                    f.write(str(os.getpid()))
            except OSError:
                pass
        env = dict(os.environ)
        # children (e.g. a bench.py step) recognize their own chain's busy
        # marker instead of waiting on it
        env["CERBERUS_CHAIN_PID"] = str(os.getpid())
        with open(log_path, "w") as log:
            try:
                rc = subprocess.run(
                    ["bash", "-c", cmd], stdout=log,
                    stderr=subprocess.STDOUT, timeout=tmo, cwd=REPO, env=env,
                ).returncode
            except subprocess.TimeoutExpired:
                rc = 124
            finally:
                try:
                    os.remove(CHAIN_BUSY)
                except OSError:
                    pass
        rec["rc"] = rc
        rec["duration_s"] = round(time.time() - t0, 1)
        try:
            with open(log_path) as f:
                tail = f.read()[-2000:]
            rec["log_tail"] = tail
        except OSError:
            pass
        _save_ledger(ledger)
        status = "OK" if rc == 0 else f"FAIL rc={rc}"
        print(f"[chain {name}] {sname}: {status} "
              f"({rec['duration_s']}s, log {log_path})", flush=True)
        if rc != 0:
            any_fail = True

    chain["done"] = True
    chain["ok"] = not any_fail
    _save_ledger(ledger)
    return 1 if any_fail else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--steps", help="JSON file with the step list")
    ap.add_argument("--step", nargs=2, action="append", default=[],
                    metavar=("NAME", "CMD"))
    ap.add_argument("--timeout", type=float, default=3600,
                    help="default per-step timeout for --step entries")
    ap.add_argument("--tunnel-budget", type=float, default=10800)
    args = ap.parse_args()

    steps: list[dict] = []
    if args.steps:
        with open(args.steps) as f:
            steps.extend(json.load(f))
    for sname, cmd in args.step:
        steps.append({"name": sname, "cmd": cmd, "timeout": args.timeout})
    if not steps:
        ap.error("no steps given")
    return run_chain(args.name, steps, args.tunnel_budget)


if __name__ == "__main__":
    raise SystemExit(main())
