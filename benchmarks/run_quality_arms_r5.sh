#!/bin/bash
# Round-5 quality-loop arms: SLIM-predicted flow vs oracle flow at
# IDENTICAL settings (VERDICT r4 next #2). drop_every=1 so every mining
# boundary sees a completed OneCycle (the r4 collapse was mining with a
# net half-way through its cycle). Copies artifacts into docs/artifacts
# as soon as each arm lands.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
COMMON="--rounds 6 --steps-per-round 350 --drop-every 1"
timeout 10000 python -u benchmarks/quality_loop_slim.py --flow slim \
  $COMMON --slim-steps 1600 --out /tmp/ql_slim_r5 \
  > /tmp/ql_slim_r5.log 2>&1
cp -f /tmp/ql_slim_r5/result_slim.json \
  docs/artifacts/quality_loop_slim_r5.json 2>/dev/null
timeout 10000 python -u benchmarks/quality_loop_slim.py --flow oracle \
  $COMMON --out /tmp/ql_oracle_r5 \
  > /tmp/ql_oracle_r5.log 2>&1
cp -f /tmp/ql_oracle_r5/result_oracle.json \
  docs/artifacts/quality_loop_oracle_r5.json 2>/dev/null
echo ARMS_DONE
