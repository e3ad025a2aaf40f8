"""Scaling-efficiency sweep: query throughput at 1 -> N devices.

BASELINE.json target: >= 80% scaling efficiency to 2 hosts. The reference
has nothing to compare (single JVM); this harness measures the sharded FORA
query step (``parallel/sharded.sharded_fora_step``) at increasing mesh sizes
and reports steps/s and efficiency relative to the 1-device run. On CI this
runs against the virtual CPU mesh; on hardware the same code runs over real
chips (multi-host via standard ``jax.distributed`` initialization — no code
change, the mesh just spans hosts).
"""

from __future__ import annotations

import time

import jax

from ..graph.csr import Graph
from .sharded import make_mesh, sharded_fora_step


def main(argv=None) -> int:
    """CLI: ``python -m ppr_tpu.parallel.scaling [--n N] [--deg D] [--devices 1,2,4]``."""
    import argparse
    import json

    from ..graph.io import synthetic_powerlaw

    ap = argparse.ArgumentParser(prog="ppr_tpu.parallel.scaling")
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--deg", type=int, default=8)
    ap.add_argument("--devices", default=None,
                    help="comma list, e.g. 1,2,4,8 (default: powers of two up "
                         "to the device count)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--engine", action="store_true",
                    help="also sweep the end-to-end ShardedForaTopk engine")
    ap.add_argument("--batch", type=int, default=32,
                    help="fixed total query batch for the engine sweep")
    args = ap.parse_args(argv)

    ds = synthetic_powerlaw(args.n, args.deg, seed=3, dense_threshold=0)
    counts = (
        [int(x) for x in args.devices.split(",")] if args.devices else None
    )
    for row in scaling_sweep(ds.graph, counts, iters=args.iters):
        print(json.dumps(row))
    if args.engine:
        for row in engine_scaling_sweep(ds, counts, batch=args.batch,
                                        iters=args.iters):
            print(json.dumps(row))
    return 0


def engine_scaling_sweep(
    ds,
    device_counts: list[int] | None = None,
    *,
    alpha: float = 0.15,
    k: int = 10,
    eps: float = 0.5,
    batch: int = 32,
    iters: int = 3,
) -> list[dict]:
    """End-to-end sharded FORA top-k queries/s at 1 -> N devices.

    Fixed TOTAL batch (strong scaling): on real multi-chip hardware
    ``queries_per_sec`` should grow ~linearly with devices; on the virtual
    CPU mesh (all "devices" share the host's physical cores) total silicon
    is constant, so the honest proxy is ``overhead = t(N) / t(1)`` — how
    much the partitioning + collectives cost on fixed work. Both are
    reported; BENCH consumers must read ``proxy`` to know which applies."""
    import numpy as np

    from .sharded_fora import ShardedForaTopk

    devices = jax.devices()
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8) if d <= len(devices)]
    if device_counts != sorted(device_counts) or device_counts[0] != 1:
        # the overhead_vs_1dev / efficiency fields are defined relative to
        # the 1-device row; any other baseline would mislabel the results
        raise ValueError(
            f"device_counts must be ascending and start at 1, got "
            f"{device_counts}"
        )
    is_proxy = devices[0].platform == "cpu"

    rng = np.random.default_rng(11)
    sources = rng.integers(0, ds.graph.n, size=batch).astype(np.int32)

    results = []
    t_base = None
    for nd in device_counts:
        mesh = make_mesh(nd)
        engine = ShardedForaTopk(ds, alpha=alpha, k=k, mesh=mesh)
        engine.compute_topk_ids_batch(sources, k, eps)   # compile + warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            engine.compute_topk_ids_batch(sources, k, eps)
        dt = (time.perf_counter() - t0) / iters
        if t_base is None:
            t_base = dt
        mesh_shape = dict(zip(mesh.axis_names, mesh.devices.shape))
        results.append({
            "sweep": "engine_strong",
            "devices": nd,
            "mesh": mesh_shape,
            "batch": batch,
            "queries_per_sec": batch / dt,
            "time_per_batch_s": dt,
            "overhead_vs_1dev": dt / t_base,
            "efficiency": t_base / (dt * (1 if is_proxy else nd)),
            "proxy": is_proxy,
        })
    return results


def scaling_sweep(
    g: Graph,
    device_counts: list[int] | None = None,
    *,
    alpha: float = 0.15,
    num_sweeps: int = 4,
    walkers_per_row: int = 256,
    iters: int = 5,
) -> list[dict]:
    devices = jax.devices()
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8) if d <= len(devices)]

    results = []
    base_qps = None
    for nd in device_counts:
        mesh = make_mesh(nd)
        step, example = sharded_fora_step(
            mesh, g, alpha, num_sweeps=num_sweeps,
            walkers_per_row=walkers_per_row,
        )
        out = step(*example)           # compile + warmup
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*example)
            # synchronize each call: pipelining collective programs on the
            # host-platform mesh trips XLA:CPU rendezvous races (see
            # node_sharded.run); on real chips this only costs dispatch
            # latency, which is noise at these step sizes
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        b = example[0].shape[0]
        qps = b / dt
        if base_qps is None:
            base_qps = qps / nd  # per-device baseline at the smallest mesh
        results.append({
            "devices": nd,
            "batch": b,
            "steps_per_sec": 1.0 / dt,
            "queries_per_sec": qps,
            "efficiency": qps / (base_qps * nd),
        })
    return results


if __name__ == "__main__":
    raise SystemExit(main())
