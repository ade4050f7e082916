#!/bin/bash
# Round-2 TPU queue, part 2: waits for tpu_queue.sh (pid passed as $1, or
# discovers none and just waits for the tunnel) to finish, then runs the
# remaining VERDICT items that need hardware:
#   - item 7: held-out (val-split) convergence evidence run
#   - item 4: regenerate BENCH_details.json with the hardened timer
# Serial, like queue 1 (TPU experiments must not overlap — CLAUDE.md).
set -u
LOG=/tmp/tpu_queue2.log
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
  say "=== waiting for queue1 (pid $QPID) ==="
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
  say "queue1 done"
fi

say "=== waiting for TPU tunnel ==="
while true; do
  if timeout 60 python -u -c "import jax; jax.devices()" >/dev/null 2>&1; then
    say "TPU is up"
    break
  fi
  sleep 120
done

say "=== A. held-out convergence evidence (configs/cerberus_evidence.json) ==="
rm -rf runs/cerberus_evidence
yield_to_bench
timeout 7200 python -u -m cerberusnet_tpu.cli \
  --config configs/cerberus_evidence.json > /tmp/q2_evidence.log 2>&1
say "evidence rc=$? (see /tmp/q2_evidence.log)"

say "=== B. train-step batch scaling (per-step op overhead amortizes?) ==="
yield_to_bench
timeout 3600 python -u - > /tmp/q2_train_scale.log 2>&1 <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from bench import bench_train_step
for b, it in ((2, 5), (4, 4), (8, 3)):
    fps = bench_train_step(batch=b, iters=it, flatten=True)
    print(f"train_step b{b} flatten: {fps:.2f} frames/sec/chip", flush=True)
EOF
say "train scale rc=$?"

say "=== C. regenerate BENCH_details.json (bench.py --all, hardened timer) ==="
yield_to_bench
timeout 7200 python -u bench.py --all > /tmp/q2_bench_all.log 2>&1
say "bench --all rc=$?"

say "=== queue2 complete ==="
