#!/bin/bash
# Run the four non-GOT reference-protocol sweeps (VERDICT item 6) on TPU,
# sequentially (one chip), smallest dataset first, with a per-(algo, test)
# time budget so expensive tail params are skipped with a note row instead
# of hanging the round. Each dataset writes its own result file, so a crash
# mid-list keeps earlier datasets' results.
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:${PYTHONPATH:-}"
BUDGET="${BUDGET:-150}"
for name in grqc blogcatalog flickr amazon; do
  echo "=== sweep: $name ($(date -u +%H:%M:%S)) ==="
  timeout 7200 python -m ppr_tpu.cli --db "synth:$name" --out-dir results \
    --budget-s "$BUDGET" 2>&1 | tail -20
  rc=${PIPESTATUS[0]}   # the python/timeout status, not tail's
  echo "=== done: $name rc=$rc ($(date -u +%H:%M:%S)) ==="
done
