#!/bin/bash
# Round-3 TPU measurement sequence (phases write separate artifacts so a
# worker crash or session reset loses at most one phase; highest-value
# phases run FIRST). Each phase is skipped if its artifact already exists,
# so the script is safely re-runnable.
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:${PYTHONPATH:-}"
DB="${DB:-synth:65536x16}"
log() { echo "=== $1 ($(date -u +%H:%M:%S)) ==="; }

if [ ! -s results/serving_latency_slo800.json ]; then
  log "phase B4: SLO-adaptive cap at 800 ms (VERDICT item 3)"
  timeout 3600 python scripts/serving_latency.py --db "$DB" \
    --rates 0.25,0.5,0.8 --duration-s 30 --hub-split 8192 --slo-ms 800 \
    --out results/serving_latency_slo800.json > results/sl_slo800.log 2>&1
  echo "rc=$?"
fi

if [ ! -s results/serving_latency_slo1500.json ]; then
  log "phase B5: SLO-adaptive cap at 1500 ms"
  timeout 3600 python scripts/serving_latency.py --db "$DB" \
    --rates 0.25,0.5,0.8 --duration-s 30 --hub-split 8192 --slo-ms 1500 \
    --out results/serving_latency_slo1500.json > results/sl_slo1500.log 2>&1
  echo "rc=$?"
fi

if [ ! -s results/serving_latency_r3_hub.json ]; then
  log "phase B2: serving latency, hub-split bf16 (per-sweep cost lever)"
  timeout 3600 python scripts/serving_latency.py --db "$DB" \
    --rates 0.25,0.5,0.8 --duration-s 30 --hub-split 8192 \
    --out results/serving_latency_r3_hub.json > results/sl_r3_hub.log 2>&1
  echo "rc=$?"
fi

if [ ! -s results/serving_latency_r3_early.json ]; then
  log "phase B3: early-exit certificate (expected negative; confirm on TPU)"
  timeout 3600 python scripts/serving_latency.py --db "$DB" \
    --rates 0.25 --duration-s 20 --hub-split 8192 --early-exit \
    --out results/serving_latency_r3_early.json > results/sl_r3_early.log 2>&1
  echo "rc=$?"
fi

if [ ! -s results/serving_latency_slo800_fixed.json ]; then
  log "phase B4b: SLO 800 ms re-run with the best-effort fallback fix"
  timeout 3600 python scripts/serving_latency.py --db "$DB" \
    --rates 0.25,0.5,0.8 --duration-s 30 --hub-split 8192 --slo-ms 800 \
    --out results/serving_latency_slo800_fixed.json \
    > results/sl_slo800_fixed.log 2>&1
  echo "rc=$?"
fi

if [ ! -s results/serving_latency_slo1500_fixed.json ]; then
  log "phase B5b: SLO 1500 ms re-run with the best-effort fallback fix"
  timeout 3600 python scripts/serving_latency.py --db "$DB" \
    --rates 0.25,0.5,0.8 --duration-s 30 --hub-split 8192 --slo-ms 1500 \
    --out results/serving_latency_slo1500_fixed.json \
    > results/sl_slo1500_fixed.log 2>&1
  echo "rc=$?"
fi

if [ ! -s results/got_rerun_r3.log ]; then
  log "phase E: got protocol re-run (warm prep rows land this round)"
  timeout 3600 python -m ppr_tpu.cli --db /root/reference/dataset/got \
    --query 50 --k 10 --out-dir results > results/got_rerun_r3.log 2>&1
  echo "rc=$?"
fi

if [ ! -s results/bench_r3_headline.json ]; then
  log "phase D: headline bench"
  timeout 5400 python bench.py > results/bench_r3_headline.json 2> results/bench_r3.log
  echo "rc=$?"
fi

if [ ! -s results/amazon_mesh_neo4j.log ]; then
  log "phase C: one amazon prep param through the mesh path (--mesh 1x1)"
  timeout 7200 python -m ppr_tpu.cli --db synth:amazon --out-dir /tmp/mesh_out \
    --tests 3 --budget-s 1 --algos NEO4J_METHOD --mesh 1x1 \
    > results/amazon_mesh_neo4j.log 2>&1
  echo "rc=$?"
  tail -6 /tmp/mesh_out/amazon_AlgoPerfResults.txt \
    >> results/amazon_mesh_neo4j.log 2>/dev/null
fi

if [ ! -s results/mosaic_probe_r3.log ]; then
  log "phase A: Mosaic fused-gather probe (standing item)"
  timeout 1800 python scripts/probe_mosaic_gather.py \
    > results/mosaic_probe_r3.log 2>&1
  echo "rc=$?"
fi

log "measurement sequence done"
