#!/bin/bash
# Round-2 TPU queue, part 7: RAFT-Stereo measurement (models/raft.py
# RAFTStereoNet — the 1-D epipolar iterative model). Waits for queue 6.
set -u
LOG=/tmp/tpu_queue7.log
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
  say "=== waiting for queue6 (pid $QPID) ==="
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi

say "=== waiting for TPU tunnel ==="
while true; do
  if timeout 60 python -u -c "import jax; jax.devices()" >/dev/null 2>&1; then
    say "TPU is up"; break
  fi
  sleep 120
done

say "=== RAFT-Stereo bench (scan, b1) ==="
yield_to_bench
timeout 3600 python -u -c "
import jax, jax.numpy as jnp
from cerberusnet_tpu.models import RAFTStereoNet
from cerberusnet_tpu.utils.benchutil import time_fn_two_point

imgs = tuple(jax.random.normal(jax.random.PRNGKey(i), (1, 512, 1024, 3), jnp.bfloat16) for i in range(2))
m = RAFTStereoNet(dtype=jnp.bfloat16)
v = jax.jit(m.init)(jax.random.PRNGKey(0), *imgs)
fwd = lambda a, b: m.apply(v, a, b)
red = lambda out: out['disp'].mean().astype(jnp.float32)
sec = time_fn_two_point(fwd, imgs, iters=(2, 8), reduce_out=red)
print(f'raft_stereo_scan_b1: {sec*1e3:.3f} ms/frame = {1.0/sec:.1f} fps')
" > /tmp/q7_raft_stereo.log 2>&1
say "raft-stereo rc=$?"

say "=== queue7 complete ==="
