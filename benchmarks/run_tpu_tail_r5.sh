#!/bin/bash
# Round-5 tail TPU measurements, run after the quality arms release the
# chip: 920^2 SLIM step bench + corrected stage roofline.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== slim_920_bench ==="
timeout 2400 python benchmarks/slim_920_bench.py 2>&1 | tail -3
echo "=== roofline ==="
timeout 2400 python benchmarks/roofline.py 2>&1 | grep -vE "I0000|WARN|oneDNN|cudart" | tail -20
echo TAIL_DONE
