"""Single-host scale config: 1M-node / ~8.3M-edge synthetic power-law graph.

Measures, on the real TPU:
* FORA top-k serving qps (annealed propagation, auto bf16 hub split) at a
  batch sized for HBM (per-edge intermediate [m, B] f32 must fit),
* recall@10 vs the 100-iteration power oracle on a few queries,
* exact whole-graph FORA (SpMV completion) throughput + mass conservation,
* raw walk throughput.

Writes results/scale_1m_nodes.json. Usage: python scripts/scale_1m.py
(--quick for a small smoke run).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--deg", type=int, default=8)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--acc-queries", type=int, default=4)
    ap.add_argument("--wg-batch", type=int, default=16)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--phase", default="all",
                    choices=["all", "topk", "wg", "walks"],
                    help="run a single phase (fresh process per phase "
                         "isolates tunnel-worker crashes)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "results", "scale_1m_nodes.json"))
    args = ap.parse_args()
    if args.quick:
        args.n, args.deg, args.batch, args.wg_batch = 1 << 14, 8, 16, 4

    import jax
    import jax.numpy as jnp

    from ppr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ppr_tpu.graph.io import synthetic_powerlaw
    from ppr_tpu.models import AlgoConf
    from ppr_tpu.models.power_method import power_method_batch
    from ppr_tpu.ops.topk import (
        topk_ids_with_ties, topk_ids_with_ties_from_pairs,
    )
    from ppr_tpu.ops.walk import weighted_walk_counts
    from ppr_tpu.utils.metrics import precision_at_k

    import gc

    t0 = time.perf_counter()
    ds = synthetic_powerlaw(args.n, args.deg, seed=11, dense_threshold=0)
    g = ds.graph
    # settle the burst of graph-array uploads before launching programs:
    # the tunneled worker has crashed on unsynchronized multi-hundred-MB
    # upload trains followed immediately by a compile
    jax.block_until_ready(jax.tree_util.tree_leaves(g))
    print(json.dumps({"n": g.n, "m": g.m,
                      "build_s": round(time.perf_counter() - t0, 1)}),
          flush=True)
    rng = np.random.default_rng(0)
    sources = rng.integers(0, g.n, size=args.batch)

    out = {
        "config": "1M-node single-host" if not args.quick else "quick",
        "n": g.n, "m": g.m, "topk_batch": args.batch,
    }
    # merge with prior phase results (fresh process per phase)
    if not args.quick and args.phase != "all" and os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prior = json.loads(f.read())
            if prior.get("n") == g.n and prior.get("m") == g.m:
                prior.update(out)
                out = prior
        except Exception:
            pass

    def flush_partial():
        print(json.dumps(out), flush=True)
        if not args.quick:
            with open(args.out, "w") as f:
                f.write(json.dumps(out) + "\n")

    run_topk = args.phase in ("all", "topk")
    run_wg = args.phase in ("all", "wg")
    run_walks = args.phase in ("all", "walks")

    # Phases are independent; each tolerates a (tunnel-side) failure so a
    # worker restart mid-run still leaves partial results on disk.

    # --- recall oracle first (smallest device footprint) ---
    acc = sources[: args.acc_queries]
    oracle = None
    if run_topk:
        try:
            oracle = np.asarray(
                power_method_batch(g, np.asarray(acc, np.int32), 0.15, 100)
            )
        except Exception as e:  # noqa: BLE001
            print(f"oracle phase failed: {e}", file=sys.stderr, flush=True)

    # --- top-k serving ---
    conf = AlgoConf(0.15, seed=7)
    try:
      if run_topk:
        fora = conf.set_conf_fora_topk(ds, 10)
        fora.enable_hub_split("auto", dtype=jnp.bfloat16)
        hs = fora.hub_split
        out["auto_hubs"] = hs.num_hubs
        out["hub_edge_cover"] = round(1 - hs.m_tail / g.m, 3)
        print(json.dumps({"auto_hubs": hs.num_hubs, "m_tail": hs.m_tail}),
              flush=True)
        fora.compute_topk_ids_batch(sources, 10, 0.5)   # compile
        t0 = time.perf_counter()
        vals, ids = fora.compute_topk_ids_batch(sources, 10, 0.5)
        topk_s = time.perf_counter() - t0
        out["fora_topk_qps"] = round(args.batch / topk_s, 2)
        if oracle is not None:
            precs = []
            for i in range(len(acc)):
                gnd = topk_ids_with_ties(oracle[i], 10)
                algo = topk_ids_with_ties_from_pairs(vals[i], ids[i], 10)
                if algo.size == vals.shape[1] and vals[i][-1] > 0.0:
                    # tie window overflowed: exact dense recomputation
                    dense = fora.compute_topk_batch(acc[i:i + 1], 10, 0.5)
                    algo = topk_ids_with_ties(dense[0], 10)
                precs.append(precision_at_k(algo, gnd))
            out["recall_at_10"] = round(float(np.mean(precs)), 4)
        del fora, hs, vals, ids
        gc.collect()
    except Exception as e:  # noqa: BLE001
        print(f"topk phase failed: {e}", file=sys.stderr, flush=True)
    flush_partial()

    # --- exact whole-graph (dense result transfer included) ---
    try:
      if run_wg:
        wg = conf.set_conf_fora_whole_graph(ds)
        wg.enable_hub_split("auto", dtype=jnp.bfloat16)
        wg_sources = sources[: args.wg_batch]
        wg.compute_whole_graph_batch(wg_sources, 0.5)   # compile
        t0 = time.perf_counter()
        dense = wg.compute_whole_graph_batch(wg_sources, 0.5)
        wg_s = time.perf_counter() - t0
        out["fora_whole_graph_qps"] = round(args.wg_batch / wg_s, 3)
        out["mass_conservation"] = float(
            np.asarray(dense).sum(axis=1).mean()
        )
        del wg, dense
        gc.collect()
    except Exception as e:  # noqa: BLE001
        print(f"whole-graph phase failed: {e}", file=sys.stderr, flush=True)
    flush_partial()

    # --- raw walk throughput ---
    try:
      if run_walks:
        walkers = 1 << 20 if not args.quick else 1 << 16
        starts = jnp.asarray(rng.integers(0, g.n, walkers), jnp.int32)
        rows = jnp.zeros((walkers,), jnp.int32)
        w = jnp.full((walkers,), 1.0 / walkers, jnp.float32)
        counts = weighted_walk_counts(g, starts, rows, w, jax.random.key(0),
                                      0.15, num_rows=1)
        # force the VALUE to the host: after a tunnel-worker restart,
        # block_until_ready alone has returned before execution finished
        # (observed: a 1.4e9 "walks/s" artifact)
        float(counts.sum())
        t0 = time.perf_counter()
        counts = weighted_walk_counts(g, starts, rows, w, jax.random.key(1),
                                      0.15, num_rows=1)
        float(counts.sum())
        out["walks_per_sec"] = round(walkers / (time.perf_counter() - t0))
    except Exception as e:  # noqa: BLE001
        print(f"walk phase failed: {e}", file=sys.stderr, flush=True)
    flush_partial()


if __name__ == "__main__":
    main()
