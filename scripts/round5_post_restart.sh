#!/bin/bash
# Post-restart chip schedule for the final hour of round 5.
# The restart wiped ~/.cache/ppr_tpu_xla, so first re-warm the headline
# bench program (the driver's end-of-round bench.py run must hit a warm
# cache), then drain the remaining short grid params.
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:${PYTHONPATH:-}"
echo "=== bench warm-up ($(date -u +%H:%M:%S)) ==="
timeout 900 python bench.py > results/bench_r5_warm.json 2> results/bench_r5_warm.log
echo "=== bench warm-up rc=$? ($(date -u +%H:%M:%S)) ==="
cat results/bench_r5_warm.json
bash scripts/round5_grid3.sh >> results/round5_grid3.log 2>&1
echo "=== post-restart chain finished ($(date -u +%H:%M:%S)) ==="
