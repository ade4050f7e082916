#!/bin/bash
# Round-2 TPU queue, part 5: optimized-HLO op-count census on the REAL
# backend (CPU census showed purev cutting entry ops 2082 -> 951; confirm
# the ratio and the copy/transpose categories on TPU HLO). Waits for queue 4.
set -u
LOG=/tmp/tpu_queue5.log
cd /root/repo
say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
yield_to_bench() {
  # the driver's bench.py posts this sentinel when it wants the chip;
  # TPU experiments must not overlap it (CLAUDE.md rule 9). The sentinel
  # holds the bench PID — ignore (and clean up) a stale one left by a
  # SIGKILLed bench so a dead benchmark can't deadlock the queue.
  while [ -f /tmp/cerberus_bench_request ]; do
    bpid=$(cat /tmp/cerberus_bench_request 2>/dev/null)
    if [ -z "$bpid" ] || ! kill -0 "$bpid" 2>/dev/null; then
      say "stale bench sentinel (pid ${bpid:-?} dead); removing"
      rm -f /tmp/cerberus_bench_request
      break
    fi
    say "bench sentinel present (pid $bpid); yielding 60s"
    sleep 60
  done
}

QPID="${1:-}"
if [ -n "$QPID" ]; then
  say "=== waiting for queue4 (pid $QPID) ==="
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi

say "=== waiting for TPU tunnel ==="
while true; do
  if timeout 60 python -u -c "import jax; jax.devices()" >/dev/null 2>&1; then
    say "TPU is up"; break
  fi
  sleep 120
done

say "=== TPU HLO census: opcount set ==="
yield_to_bench
timeout 3600 python -u tools/hlo_opcount.py --set opcount \
  > /tmp/q5_census_opcount.log 2>&1
say "census opcount rc=$?"

say "=== TPU HLO census: upfeat set ==="
yield_to_bench
timeout 3600 python -u tools/hlo_opcount.py --set upfeat \
  > /tmp/q5_census_upfeat.log 2>&1
say "census upfeat rc=$?"

say "=== queue5 complete ==="
