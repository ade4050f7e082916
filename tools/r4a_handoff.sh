#!/bin/bash
# One-shot round-4 scheduler: today's tunnel compiles ~20 min/program, so
# letting chain r4a run all eight steps would consume the whole round before
# the round's fps/train levers (penc/pencgrad/layout) ever race. This
# watcher waits for the in-flight ab_gradimpl_train step to record its rc,
# then stops the r4a chain BETWEEN steps (killing mid-compile would leave
# the remote helper grinding a dead compile) and launches the merged r4c
# chain (runs/chain_r4c_steps.json), which interleaves the remaining r3j
# deliverables with the round-4 levers in coverage order.
set -u
CHAIN_PID=$(cat /tmp/chain_r4a.pid)
while kill -0 "$CHAIN_PID" 2>/dev/null; do
  rc=$(python - <<'EOF'
import json
try:
    led = json.load(open('/root/repo/runs/queue_ledger.json'))
    ch = [c for c in led['chains'] if c['chain'] == 'r4a'][-1]
    steps = {s['name']: s.get('rc') for s in ch['steps']}
    rc = steps.get('ab_gradimpl_train')
    print('' if rc in (None, 'started') else rc)
except Exception:
    print('')
EOF
)
  if [ -n "$rc" ]; then
    echo "$(date -u) gradimpl rc=$rc -> stopping r4a chain $CHAIN_PID"
    for c in $(pgrep -P "$CHAIN_PID"); do
      for gc in $(pgrep -P "$c"); do kill "$gc" 2>/dev/null; done
      kill "$c" 2>/dev/null
    done
    kill "$CHAIN_PID" 2>/dev/null
    sleep 3
    rm -f /tmp/cerberus_chain_busy
    break
  fi
  sleep 20
done
echo "$(date -u) launching chain r4c"
cd /root/repo
PYTHONPATH=/root/repo:/root/.axon_site nohup python tools/chain_run.py r4c \
  --steps runs/chain_r4c_steps.json > /tmp/chain_r4c_driver.log 2>&1 &
echo $! > /tmp/chain_r4c.pid
echo "$(date -u) r4c pid $(cat /tmp/chain_r4c.pid)"
