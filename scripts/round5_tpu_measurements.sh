#!/bin/bash
# Round-5 TPU measurement sequence (VERDICT r4 items 1, 4, 5, 6). Same
# discipline as rounds 3/4: one artifact per phase, highest-value first,
# each phase skipped when its artifact exists so a worker crash loses at
# most one phase. RUN ONLY WHEN NO OTHER DEVICE PROCESS IS ACTIVE.
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:${PYTHONPATH:-}"
export DB="${DB:-synth:65536x16}"
log() { echo "=== $1 ($(date -u +%H:%M:%S)) ==="; }

# Phase S1: SLO v4 at slo=800 — the spiral regression measurement
# (VERDICT r4 item 1). Done criterion: the 50%-load row holds p95 within
# ~2x the 25%-load row (v3's row 2 hit p95 10.9 s / 12.3 s drain).
if [ ! -s results/serving_latency_slo800_v4.json ]; then
  log "phase S1: slo=800 v4"
  timeout 3600 python scripts/serving_latency.py --db "$DB" \
    --rates 0.25,0.5,0.8 --duration-s 30 --hub-split 8192 --slo-ms 800 \
    --out results/serving_latency_slo800_v4.json \
    > results/sl_slo800_v4.log 2>&1
  echo "rc=$?"
fi

# Phase S2: the attainable point under the v4 breach-jump rule.
if [ ! -s results/serving_latency_slo1500_v4.json ]; then
  log "phase S2: slo=1500 v4"
  timeout 3600 python scripts/serving_latency.py --db "$DB" \
    --rates 0.25,0.5,0.8 --duration-s 30 --hub-split 8192 --slo-ms 1500 \
    --out results/serving_latency_slo1500_v4.json \
    > results/sl_slo1500_v4.log 2>&1
  echo "rc=$?"
fi

# Phase P1: precomputed-BASE store for the headline graph (one-time prep;
# the store under BASE_ppr_results/ resumes/reuses across phases).
if [ ! -e results/headline_base_store.done ]; then
  log "phase P1: BASE all-pair store for $DB (threshold 1e-4)"
  timeout 5400 python - > results/base_store_build.log 2>&1 <<'EOF'
from ppr_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from ppr_tpu.cli import load_dataset
from ppr_tpu.models.config import AlgoConf, AlgoType
import os, time
ds = load_dataset(os.environ.get("DB", "synth:65536x16"))
base = AlgoConf(0.15).new_algo_obj(AlgoType.BASE_WHOLE_GRAPH, ds, 10)
t0 = time.time()
base.preprocessing(1e-4, -1)
print(f"prep {time.time()-t0:.1f}s, size {base.get_prep_size()} bytes",
      flush=True)
EOF
  rc=$?
  echo "rc=$rc"
  [ "$rc" -eq 0 ] && touch results/headline_base_store.done
fi

# Phase P2: precomputed-BASE serving latency — the latency-critical
# config's answer to the round-2 p50<300ms bar (VERDICT r4 item 5). Pure
# store reads; rates are absolute since capacity is store-read bound.
if [ -e results/headline_base_store.done ] && \
   [ ! -s results/serving_latency_precomputed.json ]; then
  log "phase P2: precomputed-BASE serving latency"
  timeout 3600 python scripts/serving_latency.py --db "$DB" \
    --rates 0.25,0.5,0.8 --duration-s 30 --max-batch 256 \
    --precomputed 1e-4 \
    --out results/serving_latency_precomputed.json \
    > results/sl_precomputed.log 2>&1
  echo "rc=$?"
fi

# Phase K0: headline-graph B=2048 probe — the knee study fixed B=1024;
# more batch amortization may sit past it (cheap: no CPU baseline).
if [ ! -s results/hub_knee_b2048.json ]; then
  log "phase K0: headline B=2048 hub probe"
  timeout 3600 python scripts/hub_knee.py --db synth:65536x16 \
    --batch 2048 --hubs 4096,8192 --reps 3 \
    --out results/hub_knee_b2048.json \
    > results/hub_knee_b2048.log 2>&1
  echo "rc=$?"
fi

# Phase K1: 1M-node H x B knee sweep (VERDICT r4 item 4). Appends each
# point to the artifact immediately; a re-run skips recorded points.
if [ ! -e results/scale_1m_knee.done ]; then
  log "phase K1: 1M-node H x B knee sweep"
  timeout 10800 python scripts/scale_1m_knee.py \
    --out results/scale_1m_knee.json \
    > results/scale_1m_knee.log 2>&1
  rc=$?
  echo "rc=$rc"
  [ "$rc" -eq 0 ] && touch results/scale_1m_knee.done
fi

log "round-5 measurement sequence finished"
