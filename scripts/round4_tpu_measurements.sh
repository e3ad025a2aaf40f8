#!/bin/bash
# Round-4 TPU measurement sequence. Same discipline as round 3: one
# artifact per phase, highest-value first, each phase skipped when its
# artifact exists so a worker crash / session reset loses at most one
# phase. RUN ONLY WHEN NO OTHER DEVICE PROCESS IS ACTIVE (single chip).
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:${PYTHONPATH:-}"
DB="${DB:-synth:65536x16}"
log() { echo "=== $1 ($(date -u +%H:%M:%S)) ==="; }

# Phase S1: the SLO policy v3 (prewarm + exploration + hysteresis) at the
# unattainable operating point that refuted v2 (VERDICT r4 item 1). Done
# criterion: capacity within ~20% of the 414 qps static ceiling.
if [ ! -s results/serving_latency_slo800_v3.json ]; then
  log "phase S1: slo=800 v3"
  timeout 3600 python scripts/serving_latency.py --db "$DB" \
    --rates 0.25,0.5,0.8 --duration-s 30 --hub-split 8192 --slo-ms 800 \
    --out results/serving_latency_slo800_v3.json \
    > results/sl_slo800_v3.log 2>&1
  echo "rc=$?"
fi

# Phase S2: the attainable point, v3 policy (the v2 re-run never completed
# in round 3 — ADVICE r3 medium).
if [ ! -s results/serving_latency_slo1500_v3.json ]; then
  log "phase S2: slo=1500 v3"
  timeout 3600 python scripts/serving_latency.py --db "$DB" \
    --rates 0.25,0.5,0.8 --duration-s 30 --hub-split 8192 --slo-ms 1500 \
    --out results/serving_latency_slo1500_v3.json \
    > results/sl_slo1500_v3.log 2>&1
  echo "rc=$?"
fi

# Phase C1: per-row cohort streaming (VERDICT r4 item 4). Done criterion:
# p50 < 300 ms at 25% load at unchanged capacity, or a measured negative
# with the mechanism's cost quantified for PERF.md.
if [ ! -s results/serving_latency_r4_cohort.json ]; then
  log "phase C1: cohort streaming latency profile"
  timeout 5400 python scripts/serving_latency.py --db "$DB" \
    --rates 0.25,0.5,0.8 --duration-s 30 --hub-split 8192 --cohort \
    --out results/serving_latency_r4_cohort.json \
    > results/sl_r4_cohort.log 2>&1
  echo "rc=$?"
fi

# Phase C2: no-cohort control on the same day/backend state so the cohort
# capacity delta is not confounded by tunnel phase drift.
if [ ! -s results/serving_latency_r4_control.json ]; then
  log "phase C2: no-cohort control"
  timeout 3600 python scripts/serving_latency.py --db "$DB" \
    --rates 0.25 --duration-s 30 --hub-split 8192 \
    --out results/serving_latency_r4_control.json \
    > results/sl_r4_control.log 2>&1
  echo "rc=$?"
fi

# Phase E: clean got protocol re-run (round-3 phase E crashed rc=1; the
# truncated tail was trimmed from the results file). Warm Test-3 rows land
# here (harness.warm_preprocessing). Done-marker is a stamp written ONLY
# on rc=0 — the log itself is non-empty after a crash and would wrongly
# mark a failed phase done (the exact round-3 failure mode).
if [ ! -e results/got_rerun_r4.done ]; then
  log "phase E: got protocol re-run"
  timeout 3600 python -m ppr_tpu.cli --db /root/reference/dataset/got \
    --query 50 --k 10 --out-dir results > results/got_rerun_r4.log 2>&1
  rc=$?
  echo "rc=$rc"
  [ "$rc" -eq 0 ] && touch results/got_rerun_r4.done
fi

# Phase H: hub-count knee at the bench batch (PERF.md's stated remaining
# single-chip lever: a bigger hub matrix trades MXU time for sparse-tail
# index count; the 8192 default was the B=256 knee).
if [ ! -s results/hub_knee_r4.json ]; then
  log "phase H: hub knee probe at B=1024"
  timeout 3600 python scripts/hub_knee.py --out results/hub_knee_r4.json \
    > results/hub_knee_r4.log 2>&1
  echo "rc=$?"
fi

# Phase A: Mosaic fused-gather re-probe (standing item; round-3 re-probe
# hit a compile hang — keep the measured-negative record current).
if [ ! -e results/mosaic_probe_r4.done ]; then
  log "phase A: Mosaic gather probe"
  timeout 1800 python scripts/probe_mosaic_gather.py \
    > results/mosaic_probe_r4.log 2>&1
  rc=$?
  echo "rc=$rc"
  # a timeout/compile-hang is itself the measured outcome here — stamp on
  # any completed invocation so the (known-hangy) probe runs once per round
  touch results/mosaic_probe_r4.done
fi

# Phase D: headline bench (the driver re-runs bench.py at round end; this
# banks a mid-round artifact).
if [ ! -s results/bench_r4_headline.json ]; then
  log "phase D: headline bench"
  timeout 5400 python bench.py > results/bench_r4_headline.json \
    2> results/bench_r4.log
  echo "rc=$?"
fi

log "round-4 measurement sequence done"
