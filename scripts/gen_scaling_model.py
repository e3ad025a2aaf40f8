"""Regenerate results/scaling_model.json (round 5).

Primary block: the historical batch-512 prediction (continuity with the
round-2..4 artifacts) + the frontier-compacted entry priced at the
MEASURED (capacity, inflation) point from the matching-batch empirical
run. Secondary block: batch 1024, where the ring comm exceeds per-sweep
compute and the frontier ring is the difference between a comm-bound and
a compute-bound overlap schedule. CPU-only (virtual mesh for the
breakdown measurement; never touches the TPU).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/gen_scaling_model.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from ppr_tpu.graph.io import synthetic_powerlaw  # noqa: E402
from ppr_tpu.parallel.comm_model import (  # noqa: E402
    measure_breakdown,
    predict_sweep,
    two_host_prediction,
)
from ppr_tpu.parallel.sharded import make_mesh  # noqa: E402


def pick_frontier(occ_path: str, graph_key: str, g, batch: int) -> dict:
    occ = json.load(open(occ_path))
    entry = occ["graphs"][graph_key]["empirical"]
    cands = []
    for f in entry["frontier"]:
        pred = predict_sweep(
            g, engine="node_sharded", s_graph=8, batch=batch,
            payload_bytes=2, capacity_frac=f["capacity_frac"],
            sweep_inflation=f["sweep_inflation"],
        )
        cands.append((pred.t_sweep_s, f))
    cands.sort(key=lambda x: x[0])
    return dict(cands[0][1], source=occ_path, measured_graph=graph_key)


def main() -> int:
    ds = synthetic_powerlaw(65536, 8, seed=3, dense_threshold=0)
    g = ds.graph

    out = two_host_prediction(
        g, batch=512,
        frontier=pick_frontier("results/ring_occupancy_b512.json",
                               "synth:65536x8", g, 512),
    )
    out["measured_breakdown"] = measure_breakdown(make_mesh(), g, batch=64)
    out["batch_1024"] = two_host_prediction(
        g, batch=1024,
        frontier=pick_frontier("results/ring_occupancy_b1024.json",
                               "synth:65536x8", g, 1024),
    )
    out["notes"] = (
        "frontier entries use MEASURED degree-sorted block sweep "
        "inflation (scripts/ring_occupancy.py, virtual 8-dev mesh, "
        "oracle-checked); at batch 512 ring comm (bf16, 0.65 ms) sits "
        "below per-sweep compute (0.78 ms) so frontier compaction is a "
        "modest serial gain; at batch 1024 comm dominates and the "
        "frontier ring moves the overlap bound from comm-bound back to "
        "compute-bound"
    )
    Path("results/scaling_model.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print("wrote results/scaling_model.json")
    for name, blk in (("b512", out), ("b1024", out["batch_1024"])):
        for k in ("node_sharded_2host", "node_sharded_2host_bf16_ring",
                  "node_sharded_2host_frontier_bf16"):
            e = blk[k]
            print(f"{name} {k}: eff {e['efficiency']:.3f} "
                  f"ov {e['efficiency_overlap']:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
