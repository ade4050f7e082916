#!/bin/bash
# Round-2 TPU experiment queue: waits for the axon tunnel to come back,
# then runs the measurement sequence serially (TPU experiments must not
# overlap — CLAUDE.md). Logs to /tmp/tpu_queue.log; each step also keeps
# its own log. Safe to re-run; steps are independent.
set -u
LOG=/tmp/tpu_queue.log
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

say "=== waiting for TPU tunnel ==="
while true; do
  if timeout 60 python -u -c "import jax; jax.devices()" >/dev/null 2>&1; then
    say "TPU is back"
    break
  fi
  sleep 120
done

say "=== 1. overhead diagnostic ==="
yield_to_bench
timeout 1800 python -u tools/overhead_diag.py > /tmp/q_overhead.log 2>&1
say "overhead rc=$? (see /tmp/q_overhead.log)"

say "=== 2. forward A/B: opcount set (base/purev/s2d/purev+s2d) ==="
yield_to_bench
timeout 3600 python -u tools/ab_forward.py --set opcount --rounds 3 \
  > /tmp/q_ab_opcount.log 2>&1
say "ab opcount rc=$?"

say "=== 3. train-step A/B: opcount set ==="
yield_to_bench
timeout 3600 python -u tools/ab_forward.py --set opcount --train --iters 3 \
  --rounds 3 > /tmp/q_ab_train.log 2>&1
say "ab train rc=$?"

say "=== 4. train-step flatten A/B ==="
yield_to_bench
timeout 2400 python -u - > /tmp/q_flatten.log 2>&1 <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from bench import bench_train_step
for fl in (False, True):
    fps = bench_train_step(batch=2, iters=5, flatten=fl)
    print(f"train_step flatten={fl}: {fps:.2f} frames/sec/chip", flush=True)
EOF
say "flatten rc=$?"

say "=== 5. headline bench + batch scaling ==="
yield_to_bench
timeout 2400 python bench.py > /tmp/q_bench_b1.log 2>&1
say "bench b1 rc=$?"
yield_to_bench
timeout 2400 python bench.py --batch 2 --iters 6 > /tmp/q_bench_b2.log 2>&1
say "bench b2 rc=$?"
yield_to_bench
timeout 2400 python bench.py --batch 4 --iters 4 > /tmp/q_bench_b4.log 2>&1
say "bench b4 rc=$?"

say "=== 6. tiled inference on hardware ==="
yield_to_bench
timeout 2400 python -u tools/tiled_bench.py > /tmp/q_tiled.log 2>&1
say "tiled rc=$?"

say "=== 7. train-step profile ==="
yield_to_bench
timeout 2400 python -u tools/profile_forward.py --train --batch 2 --iters 4 \
  --trace-dir /tmp/train_trace > /tmp/q_train_profile.log 2>&1
say "train profile rc=$?"

say "=== queue done ==="
