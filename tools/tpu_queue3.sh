#!/bin/bash
# Round-2 TPU queue, part 3: up-feat ConvTranspose vs subpixel A/B
# (VERDICT r1 item 2 — the suspected layout-copy source). Waits for queue 2.
set -u
LOG=/tmp/tpu_queue3.log
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
  say "=== waiting for queue2 (pid $QPID) ==="
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi

say "=== waiting for TPU tunnel ==="
while true; do
  if timeout 60 python -u -c "import jax; jax.devices()" >/dev/null 2>&1; then
    say "TPU is up"; break
  fi
  sleep 120
done

say "=== upfeat A/B: forward ==="
yield_to_bench
timeout 3600 python -u tools/ab_forward.py --set upfeat --rounds 3 \
  > /tmp/q3_upfeat_fwd.log 2>&1
say "upfeat fwd rc=$?"

say "=== upfeat A/B: train step ==="
yield_to_bench
timeout 3600 python -u tools/ab_forward.py --set upfeat --train --iters 3 \
  --rounds 3 > /tmp/q3_upfeat_train.log 2>&1
say "upfeat train rc=$?"

say "=== queue3 complete ==="
