#!/bin/bash
# Round-5 FINAL grid drain (post-restart). The container restart killed
# the part-2 chain at flickr NEO4J_METHOD:1; with <1h of round left only
# short jobs that finish and bank are worth chip time, so this pass runs
# the remaining Test-1/2 tails (minutes each) and skips the multi-hour
# Test-3 preps (flickr NEO4J/MC/FORA/FWDPUSH, blogcatalog MC) — those
# carry explicit per-param cost estimates in PERF.md instead.
# Same stamp dir as parts 1/2; rc=124 (timeout) moves on without retry.
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:${PYTHONPATH:-}"
STAMP="results/round5_grid_done"
mkdir -p "$STAMP"

bank() {  # bank <test#> <db> <algo:start> <timeout-s> [extra args...]
  local test="$1" db="$2" spec="$3" tmo="$4"; shift 4
  local tag="t${test}_${db}_${spec/:/_p}"
  [ "$test" = 3 ] && tag="${db}_${spec/:/_p}"
  if [ -e "$STAMP/$tag" ]; then
    echo "=== $tag already banked, skipping ==="
    return
  fi
  for attempt in 1 2; do
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
    sleep 60
  done
}

# cheapest first, from the measured part-2 per-param times
bank 1 grqc MC:3 900
bank 2 grqc MC:3 900
bank 2 blogcatalog MC:3 1200
PPR_TPU_WALK_CAP_FLOOR=2097152 bank 2 amazon MC:2 1200
bank 1 flickr MC:3 1200
bank 2 flickr MC:2 1200
bank 1 flickr BASE_WHOLE_GRAPH:1 900
bank 1 flickr BASE_WHOLE_GRAPH:2 900
bank 1 flickr BASE_WHOLE_GRAPH:3 900
bank 1 flickr BASE_WHOLE_GRAPH:4 900
PPR_TPU_WALK_CAP_FLOOR=2097152 bank 1 amazon MC:1 1200
bank 1 grqc MC:4 1200
bank 2 grqc MC:4 1200
PPR_TPU_WALK_CAP_FLOOR=2097152 bank 2 amazon MC:3 1200
bank 2 flickr BASE_WHOLE_GRAPH:1 900
bank 2 flickr BASE_WHOLE_GRAPH:2 900
bank 2 flickr BASE_WHOLE_GRAPH:3 900
bank 2 flickr BASE_WHOLE_GRAPH:4 900
bank 2 blogcatalog MC:4 1200
PPR_TPU_WALK_CAP_FLOOR=2097152 bank 1 amazon MC:2 1200
echo "=== round5 grid part 3 finished ($(date -u +%H:%M:%S)) ==="
