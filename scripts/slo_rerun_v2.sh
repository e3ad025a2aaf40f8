#!/bin/bash
# Re-measure the SLO-adaptive serving phases with the argmin best-effort
# policy (commit 515f919). Runs after the main round-3 sequence; artifacts
# are *_v2.json so the pathology records (slo800/slo1500 + the oscillating
# _fixed variant) stay on file as the measured "before" states.
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:${PYTHONPATH:-}"
DB="${DB:-synth:65536x16}"
log() { echo "=== $1 ($(date -u +%H:%M:%S)) ==="; }

for slo in 800 1500; do
  if [ ! -s "results/serving_latency_slo${slo}_v2.json" ]; then
    log "SLO ${slo} ms with argmin best-effort policy"
    timeout 3600 python scripts/serving_latency.py --db "$DB" \
      --rates 0.25,0.5,0.8 --duration-s 30 --hub-split 8192 --slo-ms "$slo" \
      --out "results/serving_latency_slo${slo}_v2.json" \
      > "results/sl_slo${slo}_v2.log" 2>&1
    echo "rc=$?"
  fi
done
log "slo rerun v2 done"
