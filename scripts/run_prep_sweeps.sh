#!/bin/bash
# Re-run Test 3 (preprocessing) with the reference's true prep arrays for
# the datasets whose earlier round-2 runs used the whole-graph fallback or
# were cut by the runner timeout. blogcatalog is excluded: its prep arrays
# equal its whole-graph arrays, so the recorded Test 3 is already correct.
# Appends to the existing result files (the writer appends sections).
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:${PYTHONPATH:-}"
BUDGET="${BUDGET:-150}"
for name in grqc flickr amazon; do
  echo "=== prep sweep: $name ($(date -u +%H:%M:%S)) ==="
  timeout 7200 python -m ppr_tpu.cli --db "synth:$name" --out-dir results \
    --tests 3 --budget-s "$BUDGET" 2>&1 | tail -8
  rc=${PIPESTATUS[0]}
  echo "=== done: $name rc=$rc ($(date -u +%H:%M:%S)) ==="
done
