#!/bin/bash
# Round-2 TPU queue, part 8: verify the pjrt_runner --serve daemon
# (native/pjrt_runner) against the jax.export reference on the real
# backend — warm multi-request serving, raw tensors + server-side PNG
# decode. Reuses queue4's exported artifact (/tmp/q4_artifact) if present,
# else exports one. Waits for queue 7.
set -u
LOG=/tmp/tpu_queue8.log
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
  say "=== waiting for queue7 (pid $QPID) ==="
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi

say "=== waiting for TPU tunnel ==="
while true; do
  if timeout 60 python -u -c "import jax; jax.devices()" >/dev/null 2>&1; then
    say "TPU is up"; break
  fi
  sleep 120
done

if [ ! -f /tmp/q4_artifact/manifest.json ]; then
  say "=== export small artifact ==="
  yield_to_bench
  timeout 2400 python -u - > /tmp/q8_export.log 2>&1 <<'EOF'
import jax, jax.numpy as jnp
from cerberusnet_tpu.models import CerberusNet
from cerberusnet_tpu.export.aot import export_cerberus
model = CerberusNet(dtype=jnp.bfloat16)
imgs = tuple(jax.random.normal(jax.random.PRNGKey(i), (1, 128, 256, 3), jnp.bfloat16) for i in range(3))
variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)
print(export_cerberus(variables, model, hw=(128, 256), out_dir="/tmp/q4_artifact"))
EOF
  say "export rc=$?"
fi

say "=== make runner ==="
make -C native/pjrt_runner >> "$LOG" 2>&1
say "make rc=$?"

say "=== serve-verify (raw tensors, 3 requests, one warm process) ==="
yield_to_bench
timeout 2400 python -u tools/runner_io.py verify /tmp/q4_artifact --serve \
  > /tmp/q8_serve.log 2>&1
say "serve-verify rc=$?"

say "=== queue8 complete ==="
