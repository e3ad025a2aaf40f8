#!/bin/bash
# Bank more Test-3 (preprocessing) params on the three small named
# testsets whose round-3 sweeps were budget-cut at 150 s/section
# (grqc 5k / blogcatalog 10k / flickr 82k nodes). One CLI invocation per
# dataset with a larger per-section budget: completed params re-run (they
# are minutes-cheap at these scales) and every additional row is a strict
# increase in the recorded protocol grid (Gen_Util.java:334-419).
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:${PYTHONPATH:-}"
BUDGET="${BUDGET:-600}"
for dsname in grqc blogcatalog flickr; do
  echo "=== $dsname test-3 sweep, budget ${BUDGET}s/section ($(date -u +%H:%M:%S)) ==="
  timeout 5400 python -m ppr_tpu.cli --db "synth:$dsname" --out-dir results \
    --tests 3 --budget-s "$BUDGET" 2>&1 | tail -4
  echo "=== $dsname rc=${PIPESTATUS[0]} ($(date -u +%H:%M:%S)) ==="
done
echo "=== small-prep banking finished ($(date -u +%H:%M:%S)) ==="
