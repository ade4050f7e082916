#!/bin/bash
# Round-4 session-2 scheduler: chain r4d was launched before the penc_smoke
# scatter-lowering fix landed, so its ab_penc step would race an unsmoked
# kernel. This watcher waits for the in-flight ab_gradimpl_train step to
# record its rc, then stops r4d BETWEEN steps (killing mid-compile leaves
# the remote helper grinding a dead compile) and launches chain r4e
# (runs/chain_r4e_steps.json): smoke gate first, then the remaining r3j
# deliverables and round-4 levers in verdict-coverage order.
set -u
CHAIN_PID=$(cat /tmp/chain_r4d.pid)
while kill -0 "$CHAIN_PID" 2>/dev/null; do
  rc=$(python - <<'EOF'
import json
try:
    led = json.load(open('/root/repo/runs/queue_ledger.json'))
    ch = [c for c in led['chains'] if c['chain'] == 'r4d'][-1]
    steps = {s['name']: s.get('rc') for s in ch['steps']}
    rc = steps.get('ab_gradimpl_train')
    print('' if rc in (None, 'started') else rc)
except Exception:
    print('')
EOF
)
  if [ -n "$rc" ]; then
    echo "$(date -u) gradimpl rc=$rc -> stopping r4d chain $CHAIN_PID"
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
cd /root/repo
nohup python tools/chain_run.py r4e --steps runs/chain_r4e_steps.json \
  > /tmp/chain_r4e.out 2>&1 &
echo $! > /tmp/chain_r4e.pid
echo "$(date -u) launched chain r4e pid $(cat /tmp/chain_r4e.pid)"
