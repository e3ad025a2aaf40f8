#!/bin/bash
# Bank the REMAINING amazon Test-3 params (VERDICT r3 weak item 6), one
# param per invocation via the --algos start-index resume ('ALGO:N' skips
# the N already-recorded params; their stores were deleted after each
# completed test, so skipping — not re-running — is the only way to bank
# the next param without repaying hours). Cheapest-first by estimated
# cost: FWDPUSH param 2 (rmax 5e-5 is LOOSER than the recorded 1e-5 —
# amazon's FWDPUSH array leads with its tightest rmax, Gen_Util.java:444),
# then MC param 2 (eps 20: ~6x the recorded eps-50 cost), then FORA
# param 2 (eps 200: ~6x eps-500). Each is stamped independently; stores
# resume mid-param across retries.
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:${PYTHONPATH:-}"
STAMP="results/amazon_prep_done"
mkdir -p "$STAMP"
bank() {  # bank <algo> <start-index> <extra args...>
  local algo="$1" start="$2"; shift 2
  if [ -e "$STAMP/${algo}_p$((start + 1))" ]; then
    echo "=== $algo param $((start + 1)) already banked, skipping ==="
    return
  fi
  for attempt in 1 2 3; do
    echo "=== amazon prep $algo:$start attempt $attempt ($(date -u +%H:%M:%S)) ==="
    timeout 14400 python -m ppr_tpu.cli --db synth:amazon --out-dir results \
      --tests 3 --budget-s 1 --algos "$algo:$start" "$@" 2>&1 | tail -4
    rc=${PIPESTATUS[0]}
    echo "=== $algo:$start attempt $attempt rc=$rc ($(date -u +%H:%M:%S)) ==="
    if [ "$rc" -eq 0 ]; then
      touch "$STAMP/${algo}_p$((start + 1))"
      return
    fi
    sleep 75
  done
}
export PPR_TPU_WALK_CAP_FLOOR=2097152
bank FWDPUSH 1
bank MC 1
bank FORA_WHOLE_GRAPH 1 --fora-completion walks
echo "=== amazon prep banking pass finished ($(date -u +%H:%M:%S)) ==="
