#!/bin/bash
# Round-2 TPU queue, part 4: native-serving verification (pjrt_runner --pngs:
# C++ PNG decode + normalize + bf16 cast + PJRT execute vs the Python path),
# plus a re-verify of the raw-tensor and executable-cache paths after the
# runner rebuild. Waits for queue 3.
set -u
LOG=/tmp/tpu_queue4.log
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
  say "=== waiting for queue3 (pid $QPID) ==="
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi

say "=== waiting for TPU tunnel ==="
while true; do
  if timeout 60 python -u -c "import jax; jax.devices()" >/dev/null 2>&1; then
    say "TPU is up"; break
  fi
  sleep 120
done

say "=== rebuild native binaries ==="
make -C native/dataload >> "$LOG" 2>&1
make -C native/pjrt_runner >> "$LOG" 2>&1
say "build rc=$?"

say "=== export small artifact for verification ==="
yield_to_bench
timeout 2400 python -u - > /tmp/q4_export.log 2>&1 <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from cerberusnet_tpu.models import CerberusNet
from cerberusnet_tpu.export.aot import export_cerberus

model = CerberusNet(dtype=jnp.bfloat16)
imgs = tuple(jax.random.normal(jax.random.PRNGKey(i), (1, 128, 256, 3), jnp.bfloat16) for i in range(3))
variables = jax.jit(model.init)(jax.random.PRNGKey(0), *imgs)
print(export_cerberus(variables, model, hw=(128, 256), out_dir="/tmp/q4_artifact"))
EOF
say "export rc=$?"

say "=== native raw-tensor + cache verify ==="
yield_to_bench
timeout 2400 python -u tools/runner_io.py verify /tmp/q4_artifact \
  --check-cache > /tmp/q4_verify_raw.log 2>&1
say "raw verify rc=$?"

say "=== native PNG serving verify (--pngs) ==="
yield_to_bench
timeout 2400 python -u tools/runner_io.py verify /tmp/q4_artifact \
  --pngs > /tmp/q4_verify_png.log 2>&1
say "png verify rc=$?"

say "=== queue4 complete ==="
