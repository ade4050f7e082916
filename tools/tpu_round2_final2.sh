#!/bin/bash
# Round-2 final hardware chain, part 2: waits for tpu_round2_final.sh
# (pid in /tmp/r2final.pid), then runs the remaining VERDICT r1 hardware
# items: tiled inference beyond-one-pass resolution (item 9) and the
# hardened-timer BENCH_details regeneration (item 4).
set -u
LOG=/tmp/r2final2.log
cd /root/repo
say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
yield_to_bench() {
  while [ -f /tmp/cerberus_bench_request ]; do
    bpid=$(cat /tmp/cerberus_bench_request 2>/dev/null)
    if [ -z "$bpid" ] || ! kill -0 "$bpid" 2>/dev/null; then
      rm -f /tmp/cerberus_bench_request; break
    fi
    say "bench sentinel (pid $bpid); yielding 60s"; sleep 60
  done
}

QPID=$(cat /tmp/r2final.pid 2>/dev/null || true)
if [ -n "$QPID" ]; then
  say "waiting for chain 1 (pid $QPID)"
  while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
fi

say "=== 1. tiled inference on hardware (2048x1024) ==="
yield_to_bench
timeout 2400 python -u tools/tiled_bench.py > /tmp/q_tiled.log 2>&1
say "tiled rc=$?"

say "=== 2. regenerate BENCH_details.json (hardened timer) ==="
yield_to_bench
timeout 3600 python bench.py --all > /tmp/q_bench_all.log 2>&1
say "bench --all rc=$?"

say "=== done ==="
