#!/bin/bash
# Round-2 final hardware chain (tunnel back up 2026-08-19): the prioritized
# remainder of queues 1/3 — forward + train A/Bs that decide the default
# knobs, then the hardened-timer BENCH_details regeneration (VERDICT r1
# items 2/3/4). Serial; logs under /tmp.
set -u
LOG=/tmp/r2final.log
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

say "=== 1. forward A/B: opcount set (base/purev/s2d/purev+s2d) ==="
yield_to_bench
timeout 2400 python -u tools/ab_forward.py --set opcount --rounds 3 \
  > /tmp/q_ab_opcount.log 2>&1
say "fwd opcount rc=$?"

say "=== 2. train-step A/B: opcount set ==="
yield_to_bench
timeout 2400 python -u tools/ab_forward.py --set opcount --train --iters 3 \
  --rounds 3 > /tmp/q_ab_train.log 2>&1
say "train opcount rc=$?"

say "=== 3. forward A/B: upfeat set ==="
yield_to_bench
timeout 2400 python -u tools/ab_forward.py --set upfeat --rounds 3 \
  > /tmp/q_ab_upfeat.log 2>&1
say "upfeat rc=$?"

say "=== 4. train-step flatten A/B ==="
yield_to_bench
timeout 1800 python -u - > /tmp/q_flatten.log 2>&1 <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from bench import bench_train_step
for fl in (False, True):
    fps = bench_train_step(batch=2, iters=5, flatten=fl)
    print(f"train_step flatten={fl}: {fps:.2f} frames/sec/chip", flush=True)
EOF
say "flatten rc=$?"

say "=== done ==="
