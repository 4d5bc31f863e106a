#!/bin/bash
# Waits for the oracle arm (the arms-script process) to land, then reruns
# the SLIM arm with mine_proposal_union at identical settings. Copies
# artifacts into docs/artifacts as soon as they exist.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
ARMS_PID=$(cat /tmp/arms_r5.pid 2>/dev/null || echo 0)
for i in $(seq 1 90); do
  [ -f /tmp/ql_oracle_r5/result_oracle.json ] && break
  kill -0 "$ARMS_PID" 2>/dev/null || break
  sleep 60
done
sleep 10
cp -f /tmp/ql_oracle_r5/result_oracle.json \
  docs/artifacts/quality_loop_oracle_r5.json 2>/dev/null
timeout 9000 python -u benchmarks/quality_loop_slim.py --flow slim \
  --rounds 6 --steps-per-round 350 --drop-every 1 --slim-steps 1600 \
  --out /tmp/ql_slim_r5u > /tmp/ql_slim_r5u.log 2>&1
cp -f /tmp/ql_slim_r5u/result_slim.json \
  docs/artifacts/quality_loop_slim_r5.json 2>/dev/null
echo SLIM_UNION_DONE
