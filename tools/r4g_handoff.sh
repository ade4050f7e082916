#!/bin/bash
# Round-4 session-2 scheduler, stage 4 (endgame): after r4g's raft_evidence
# records its rc (~1h of round left), the remaining r4g steps are
# ab_pencgrad_train (expected tie — the penc forward race tied and the
# level-1 reverse sweep falls back to XLA anyway), then profile/dcv that
# would never be reached. Preempt: stop r4g BETWEEN steps and launch r4i
# (dcv_evidence first — the recommended fast model's accuracy table — then
# the fresh forward profile and the two promotion confirmations).
set -u
CHAIN_PID=$(cat /tmp/chain_r4g.pid)
while kill -0 "$CHAIN_PID" 2>/dev/null; do
  rc=$(python - <<'EOF'
import json
try:
    led = json.load(open('/root/repo/runs/queue_ledger.json'))
    ch = [c for c in led['chains'] if c['chain'] == 'r4g'][-1]
    steps = {s['name']: s.get('rc') for s in ch['steps']}
    rc = steps.get('raft_evidence')
    print('' if rc in (None, 'started') else rc)
except Exception:
    print('')
EOF
)
  if [ -n "$rc" ]; then
    echo "$(date -u) raft_evidence rc=$rc -> stopping r4g chain $CHAIN_PID"
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
nohup python tools/chain_run.py r4i --steps runs/chain_r4i_steps.json \
  > /tmp/chain_r4i.out 2>&1 &
echo $! > /tmp/chain_r4i.pid
echo "$(date -u) launched chain r4i pid $(cat /tmp/chain_r4i.pid)"
