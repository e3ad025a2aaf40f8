#!/bin/bash
# Round-5 protocol-grid drain (VERDICT r4 "Next round" item 2).
# One param per invocation via `--algos ALGO:N --budget-s 1` (the harness
# runs exactly the first un-skipped param, so every job banks one row and
# never repays a recorded one). Priority order per VERDICT: flickr 3.5 MC
# first param (the only all-empty section in the five-dataset grid), then
# cheap blogcatalog/flickr/grqc tails, then the expensive singles.
# Done-markers under results/round5_grid_done; 2 retries per job for the
# documented transient TPU-worker crashes. Reference arrays:
# Gen_Util.java:334-449.
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:${PYTHONPATH:-}"
STAMP="results/round5_grid_done"
mkdir -p "$STAMP"

bank() {  # bank <db> <algo:start> <timeout-s> [extra args...]
  local db="$1" spec="$2" tmo="$3"; shift 3
  local tag="${db}_${spec/:/_p}"
  if [ -e "$STAMP/$tag" ]; then
    echo "=== $tag already banked, skipping ==="
    return
  fi
  for attempt in 1 2 3; do
    echo "=== $tag attempt $attempt ($(date -u +%H:%M:%S)) ==="
    timeout "$tmo" python -m ppr_tpu.cli --db "synth:$db" --out-dir results \
      --tests 3 --budget-s 1 --algos "$spec" "$@" 2>&1 | tail -3
    rc=${PIPESTATUS[0]}
    echo "=== $tag attempt $attempt rc=$rc ($(date -u +%H:%M:%S)) ==="
    if [ "$rc" -eq 0 ]; then
      touch "$STAMP/$tag"
      return
    fi
    [ "$rc" -eq 124 ] && return   # timeout: don't retry, move on (store resumes)
    sleep 75
  done
}

# --- priority 1: flickr 3.5 MC (all-empty section), param 20.0 ---
PPR_TPU_WALK_CAP_FLOOR=2097152 bank flickr MC:0 9000

# --- priority 2: cheap tails (minutes each) ---
bank blogcatalog NEO4J_METHOD:3 2400
bank blogcatalog NEO4J_METHOD:4 2400
bank blogcatalog FWDPUSH:3 2400
bank blogcatalog FWDPUSH:4 2400
bank flickr BASE_WHOLE_GRAPH:2 2400
bank flickr BASE_WHOLE_GRAPH:3 2400
bank flickr BASE_WHOLE_GRAPH:4 2400
bank flickr BASE_WHOLE_GRAPH:5 2400
bank flickr NEO4J_METHOD:1 2400
bank flickr NEO4J_METHOD:2 2400
bank grqc FORA_WHOLE_GRAPH:1 2400 --fora-completion walks

# --- priority 3: mid-cost singles ---
bank flickr FORA_WHOLE_GRAPH:1 5400 --fora-completion walks
bank flickr FWDPUSH:2 3600
PPR_TPU_WALK_CAP_FLOOR=2097152 bank flickr MC:1 5400
bank blogcatalog MC:1 5400
bank grqc MC:1 3600
bank grqc FORA_WHOLE_GRAPH:2 3600 --fora-completion walks

# --- priority 4: deeper tails if the clock allows ---
bank flickr BASE_WHOLE_GRAPH:6 2400
bank flickr BASE_WHOLE_GRAPH:7 2400
bank flickr BASE_WHOLE_GRAPH:8 2400
bank flickr BASE_WHOLE_GRAPH:9 2400
bank flickr NEO4J_METHOD:3 2400
bank flickr NEO4J_METHOD:4 2400
bank flickr FWDPUSH:3 5400
bank blogcatalog MC:2 5400
echo "=== round5 grid pass finished ($(date -u +%H:%M:%S)) ==="
