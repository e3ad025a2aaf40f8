#!/bin/bash
# amazon Test 3 (preprocessing, Gen_Util.java:441-448): run the FIRST param
# of every prep section to completion, one section per CLI invocation so a
# completed section (whose npz store delete_prep_dir already reclaimed) is
# never re-run by a later retry. --budget-s 1 makes each section stop after
# its first param (remaining params are skipped with an explicit note row).
# The remote TPU worker occasionally crashes (UNAVAILABLE) — retry each
# section a few times; the npz store resumes from its last completed shard.
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:${PYTHONPATH:-}"
STAMP="results/amazon_prep_done"
mkdir -p "$STAMP"
# cheapest-first so sections bank early (FORA's 262k-source walk sweep is
# the long pole; its store resumes whenever it runs)
for algo in NEO4J_METHOD MC BASE_WHOLE_GRAPH FWDPUSH FORA_WHOLE_GRAPH; do
  if [ -e "$STAMP/$algo" ]; then
    echo "=== $algo already complete, skipping ==="
    continue
  fi
  # FORA's prep rows must use the reference's walk completion: exact spmv
  # completion makes every reachable entry positive, and shipping ~dense
  # [128, 262k] compaction results through the ~22 MB/s device->host tunnel
  # dominated the sweep (measured 17 s/batch vs ~0.5 s compute) — walks
  # keep rows sparse (stop nodes only), matching the reference's stores.
  extra=()
  if [ "$algo" = FORA_WHOLE_GRAPH ]; then
    extra=(--fora-completion walks)
    # pin the walk-pool bucket above every batch's walker total: without a
    # floor each pow2 crossing mints a new XLA program and the degraded
    # remote-compile phases stall the sweep for tens of minutes per shape
    export PPR_TPU_WALK_CAP_FLOOR=2097152
  else
    unset PPR_TPU_WALK_CAP_FLOOR
  fi
  for attempt in 1 2 3 4 5; do
    echo "=== amazon prep $algo attempt $attempt ($(date -u +%H:%M:%S)) ==="
    timeout 14400 python -m ppr_tpu.cli --db synth:amazon --out-dir results \
      --tests 3 --budget-s 1 --algos "$algo" "${extra[@]}" 2>&1 | tail -6
    rc=${PIPESTATUS[0]}
    echo "=== $algo attempt $attempt rc=$rc ($(date -u +%H:%M:%S)) ==="
    if [ "$rc" -eq 0 ]; then
      touch "$STAMP/$algo"
      break
    fi
    sleep 75
  done
done
echo "=== amazon prep sweep finished ($(date -u +%H:%M:%S)) ==="
