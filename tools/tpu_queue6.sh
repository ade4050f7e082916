#!/bin/bash
# Round-2 TPU queue, part 6: RAFT-family measurements (models/raft.py).
#   1. bench_raft at the working resolution (scan iterations, bf16).
#   2. scan-vs-unroll A/B of the 12 refinement iterations (CLAUDE.md rule 7:
#      only interleaved end-to-end wins count; 3 rounds for the +-0.5 ms
#      run-to-run variance).
# Waits for queue 5.
set -u
LOG=/tmp/tpu_queue6.log
cd /root/repo
say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
yield_to_bench() {
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
  say "=== waiting for queue5 (pid $QPID) ==="
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi

say "=== waiting for TPU tunnel ==="
while true; do
  if timeout 60 python -u -c "import jax; jax.devices()" >/dev/null 2>&1; then
    say "TPU is up"; break
  fi
  sleep 120
done

say "=== RAFT bench (scan, b1) ==="
yield_to_bench
timeout 3600 python -u -c "
import bench
fps = bench.bench_raft(batch=1)
print('raft_scan_b1_fps', fps)
" > /tmp/q6_raft_scan.log 2>&1
say "raft scan rc=$?"

say "=== RAFT scan-vs-unroll interleaved A/B (3 rounds) ==="
yield_to_bench
timeout 5400 python -u -c "
import jax, jax.numpy as jnp
from cerberusnet_tpu.models import RAFTFlowNet
from cerberusnet_tpu.utils.benchutil import time_fn_two_point

imgs = tuple(jax.random.normal(jax.random.PRNGKey(i), (1, 512, 1024, 3), jnp.bfloat16) for i in range(2))
ms = RAFTFlowNet(dtype=jnp.bfloat16)
mu = RAFTFlowNet(dtype=jnp.bfloat16, unroll_iters=True)
v = jax.jit(ms.init)(jax.random.PRNGKey(0), *imgs)
red = lambda out: out['flow'].mean().astype(jnp.float32)
for rnd in range(3):
    for name, m in (('scan', ms), ('unroll', mu)):
        fwd = lambda a, b, m=m: m.apply(v, a, b)
        sec = time_fn_two_point(fwd, imgs, iters=(2, 8), reduce_out=red)
        print(f'round {rnd} {name}: {sec*1e3:.3f} ms/frame', flush=True)
" > /tmp/q6_raft_ab.log 2>&1
say "raft ab rc=$?"

say "=== queue6 complete ==="
