#!/bin/bash
# PID-watcher chain for round 5 (single TPU chip — never two device
# processes): wait for grid part 1 (VERDICT-named prep priorities), then
# run the measurement bundle, then un-defer and run grid part 2.
set -u
cd /root/repo
GRID_PID="${1:?usage: round5_chain.sh <grid-part1-pid>}"
while kill -0 "$GRID_PID" 2>/dev/null; do sleep 60; done
echo "=== grid part 1 done ($(date -u +%H:%M:%S)); measurements next ==="
bash scripts/round5_tpu_measurements.sh >> results/round5_measurements.log 2>&1
echo "=== measurements done ($(date -u +%H:%M:%S)); grid part 2 next ==="
# remove the deferral markers so part 2 actually runs those jobs
if [ -f results/round5_fake_markers.txt ]; then
  while read -r t; do rm -f "results/round5_grid_done/$t"; done \
    < results/round5_fake_markers.txt
  rm -f results/round5_fake_markers.txt
fi
bash scripts/round5_grid2.sh >> results/round5_grid2.log 2>&1
echo "=== chain finished ($(date -u +%H:%M:%S)) ==="
