#!/bin/bash
# Round-5 grid drain, part 2: deeper Test-3 tails + the Test-1/2 tails
# (VERDICT r4 weak item 5), cheapest-first across datasets. Runs AFTER
# scripts/round5_tpu_measurements.sh. Same one-param-per-invocation
# banking as round5_grid.sh (shared stamp dir). Per-param cost estimates
# from the recorded first-param rows; anything deliberately left gets an
# estimate note in PERF.md.
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:${PYTHONPATH:-}"
STAMP="results/round5_grid_done"
mkdir -p "$STAMP"

# SLO v5 re-measurement first: the v4 run found the rung-16 queueing trap
# and the policy was fixed mid-round; the v5 artifacts are the headline
# VERDICT item and outrank further grid rows.
bash scripts/round5_slo_v5.sh >> results/round5_measurements.log 2>&1

bank() {  # bank <test#> <db> <algo:start> <timeout-s> [extra args...]
  local test="$1" db="$2" spec="$3" tmo="$4"; shift 4
  local tag="t${test}_${db}_${spec/:/_p}"
  [ "$test" = 3 ] && tag="${db}_${spec/:/_p}"   # part-1 compat namespace
  if [ -e "$STAMP/$tag" ]; then
    echo "=== $tag already banked, skipping ==="
    return
  fi
  for attempt in 1 2 3; do
    echo "=== $tag attempt $attempt ($(date -u +%H:%M:%S)) ==="
    timeout "$tmo" python -m ppr_tpu.cli --db "synth:$db" --out-dir results \
      --tests "$test" --budget-s 1 --algos "$spec" "$@" 2>&1 | tail -3
    rc=${PIPESTATUS[0]}
    echo "=== $tag attempt $attempt rc=$rc ($(date -u +%H:%M:%S)) ==="
    if [ "$rc" -eq 0 ]; then
      touch "$STAMP/$tag"
      return
    fi
    [ "$rc" -eq 124 ] && return
    sleep 75
  done
}

# ---- P5a: seconds-to-minutes each ----
bank 1 blogcatalog MC:2 1800
bank 1 blogcatalog MC:3 1800
bank 1 blogcatalog MC:4 1800
bank 1 blogcatalog BASE_WHOLE_GRAPH:2 1800
bank 1 blogcatalog BASE_WHOLE_GRAPH:3 1800
bank 1 blogcatalog BASE_WHOLE_GRAPH:4 1800
bank 1 grqc FORA_WHOLE_GRAPH:1 1800
bank 1 grqc FORA_WHOLE_GRAPH:2 1800
bank 1 grqc FORA_WHOLE_GRAPH:3 1800
bank 1 grqc FORA_WHOLE_GRAPH:4 1800
PPR_TPU_WALK_CAP_FLOOR=2097152 bank 2 amazon MC:1 2400
bank 1 grqc MC:1 1800
bank 1 grqc MC:2 1800
bank 1 flickr MC:2 1800

# ---- deferred part-1 P3 singles (mid-cost Test-3 params) ----
# flickr NEO4J prep params timed out in part 1 (store d2h dominates at
# 82k sources); their npz stores resume mid-param, so a retry completes
bank 3 flickr NEO4J_METHOD:1 3600
bank 3 flickr NEO4J_METHOD:2 3600
bank 3 grqc FORA_WHOLE_GRAPH:2 2400 --fora-completion walks
bank 3 flickr FWDPUSH:2 3600
PPR_TPU_WALK_CAP_FLOOR=2097152 bank 3 flickr MC:1 5400
bank 3 flickr FORA_WHOLE_GRAPH:1 5400 --fora-completion walks
bank 3 blogcatalog MC:1 5400

# ---- P5b: ~5-20 min each ----
bank 1 flickr MC:3 2400
bank 1 grqc MC:3 2400
bank 2 grqc MC:3 2400
bank 2 blogcatalog MC:3 2400
bank 1 flickr BASE_WHOLE_GRAPH:1 2400
bank 1 flickr BASE_WHOLE_GRAPH:2 2400
bank 1 flickr BASE_WHOLE_GRAPH:3 2400
bank 1 flickr BASE_WHOLE_GRAPH:4 2400
PPR_TPU_WALK_CAP_FLOOR=2097152 bank 2 amazon MC:2 2400
bank 1 flickr MC:4 2700

# ---- part-1 priority 4 (Test-3 deeper tails) ----
bank 3 flickr BASE_WHOLE_GRAPH:6 2400
bank 3 flickr BASE_WHOLE_GRAPH:7 2400
bank 3 flickr BASE_WHOLE_GRAPH:8 2400
bank 3 flickr BASE_WHOLE_GRAPH:9 2400
bank 3 flickr NEO4J_METHOD:3 2400
bank 3 flickr NEO4J_METHOD:4 2400
bank 3 flickr FWDPUSH:3 5400
bank 3 blogcatalog MC:2 5400

# ---- P5c: ~20-60 min each ----
bank 2 flickr MC:2 2700
bank 2 flickr BASE_WHOLE_GRAPH:1 2700
bank 2 flickr BASE_WHOLE_GRAPH:2 2700
bank 2 flickr BASE_WHOLE_GRAPH:3 2700
bank 2 flickr BASE_WHOLE_GRAPH:4 2700
PPR_TPU_WALK_CAP_FLOOR=2097152 bank 1 amazon MC:1 3600
bank 1 grqc MC:4 3600
bank 2 grqc MC:4 3600
bank 2 amazon BASE_WHOLE_GRAPH:1 3600
bank 2 amazon BASE_WHOLE_GRAPH:2 3600
bank 2 blogcatalog MC:4 5400
PPR_TPU_WALK_CAP_FLOOR=2097152 bank 2 amazon MC:3 3600
bank 2 amazon BASE_WHOLE_GRAPH:3 5400
bank 1 amazon BASE_WHOLE_GRAPH:1 5400
bank 3 grqc MC:1 5400
bank 3 blogcatalog MC:3 5400
PPR_TPU_WALK_CAP_FLOOR=2097152 bank 1 amazon MC:2 5400
echo "=== round5 grid part 2 finished ($(date -u +%H:%M:%S)) ==="
