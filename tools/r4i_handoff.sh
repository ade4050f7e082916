#!/bin/bash
# Round-4 session-2 scheduler, stage 5: when r4i's ab_upfeat_confirm
# records its rc, launch chain r4j — the raft_evidence rerun (its panel
# crash on the RAFT (B,H,W) disp shape is fixed + regression-pinned), then
# the estimator-fusion re-race and the reverse-sweep train race with
# whatever chip time remains.
set -u
CHAIN_PID=$(cat /tmp/chain_r4i.pid)
while kill -0 "$CHAIN_PID" 2>/dev/null; do
  rc=$(python - <<'EOF'
import json
try:
    led = json.load(open('/root/repo/runs/queue_ledger.json'))
    ch = [c for c in led['chains'] if c['chain'] == 'r4i'][-1]
    steps = {s['name']: s.get('rc') for s in ch['steps']}
    rc = steps.get('ab_upfeat_confirm')
    print('' if rc in (None, 'started') else rc)
except Exception:
    print('')
EOF
)
  if [ -n "$rc" ]; then
    echo "$(date -u) ab_upfeat_confirm rc=$rc -> r4i finished its races"
    break
  fi
  sleep 20
done
# r4i has no further steps after ab_upfeat_confirm; wait for the process
# to exit on its own (no mid-step kill needed), then start r4j.
while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 10; done
cd /root/repo
nohup python tools/chain_run.py r4j --steps runs/chain_r4j_steps.json \
  > /tmp/chain_r4j.out 2>&1 &
echo $! > /tmp/chain_r4j.pid
echo "$(date -u) launched chain r4j pid $(cat /tmp/chain_r4j.pid)"
