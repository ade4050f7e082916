#!/bin/bash
# Round-4 session-2 scheduler, stage 3: chain r4f's penc_smoke ran before
# the strips/tile-cap rework landed (its numerics PASSED on hardware at the
# small shapes; the level-2 case OOM'd under the old T=32 tiling), and the
# penc/layout forward races are missing from r4f (they failed in r4e: the
# old kernel + a tunnel hiccup). Wait for r4f's raft_lookup_onehot step to
# record an rc, stop r4f BETWEEN steps, and launch chain r4g: smoke gate on
# the reworked kernel, the two forward races, then the remaining
# deliverables in verdict order.
set -u
CHAIN_PID=$(cat /tmp/chain_r4f.pid)
while kill -0 "$CHAIN_PID" 2>/dev/null; do
  rc=$(python - <<'EOF'
import json
try:
    led = json.load(open('/root/repo/runs/queue_ledger.json'))
    ch = [c for c in led['chains'] if c['chain'] == 'r4f'][-1]
    steps = {s['name']: s.get('rc') for s in ch['steps']}
    rc = steps.get('raft_lookup_onehot')
    print('' if rc in (None, 'started') else rc)
except Exception:
    print('')
EOF
)
  if [ -n "$rc" ]; then
    echo "$(date -u) raft_lookup_onehot rc=$rc -> stopping r4f chain $CHAIN_PID"
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
nohup python tools/chain_run.py r4g --steps runs/chain_r4g_steps.json \
  > /tmp/chain_r4g.out 2>&1 &
echo $! > /tmp/chain_r4g.pid
echo "$(date -u) launched chain r4g pid $(cat /tmp/chain_r4g.pid)"
