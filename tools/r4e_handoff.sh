#!/bin/bash
# Round-4 session-2 scheduler, stage 2: chain r4e's early steps ran before
# the Mosaic stride-slice fix and the tiled tree_map fix landed, so its
# penc_smoke/tiled_bench results are stale and its gradimpl re-race is
# missing. Wait for r4e's ab_layout step to record an rc (by then raft,
# penc and layout data are all in), stop r4e BETWEEN steps, and launch
# chain r4f (runs/chain_r4f_steps.json): smoke gate + fixed re-runs +
# right-sized gradimpl + the remaining deliverables.
set -u
CHAIN_PID=$(cat /tmp/chain_r4e.pid)
while kill -0 "$CHAIN_PID" 2>/dev/null; do
  rc=$(python - <<'EOF'
import json
try:
    led = json.load(open('/root/repo/runs/queue_ledger.json'))
    ch = [c for c in led['chains'] if c['chain'] == 'r4e'][-1]
    steps = {s['name']: s.get('rc') for s in ch['steps']}
    rc = steps.get('ab_layout')
    print('' if rc in (None, 'started') else rc)
except Exception:
    print('')
EOF
)
  if [ -n "$rc" ]; then
    echo "$(date -u) ab_layout rc=$rc -> stopping r4e chain $CHAIN_PID"
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
nohup python tools/chain_run.py r4f --steps runs/chain_r4f_steps.json \
  > /tmp/chain_r4f.out 2>&1 &
echo $! > /tmp/chain_r4f.pid
echo "$(date -u) launched chain r4f pid $(cat /tmp/chain_r4f.pid)"
