#!/bin/bash
# SLO v5 re-measurement: throughput-safe breach jumps + sustained-backlog
# max-rows/sec flip (the fix for the v4 rung-16 queueing trap measured in
# results/serving_latency_slo800_v4.json). One artifact per phase.
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:${PYTHONPATH:-}"
DB="${DB:-synth:65536x16}"
for slo in 800 1500; do
  if [ ! -s "results/serving_latency_slo${slo}_v5.json" ]; then
    echo "=== slo=${slo} v5 ($(date -u +%H:%M:%S)) ==="
    timeout 3600 python scripts/serving_latency.py --db "$DB" \
      --rates 0.25,0.5,0.8 --duration-s 30 --hub-split 8192 \
      --slo-ms "$slo" \
      --out "results/serving_latency_slo${slo}_v5.json" \
      > "results/sl_slo${slo}_v5.log" 2>&1
    echo "rc=$?"
  fi
done
