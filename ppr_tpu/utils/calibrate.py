"""Live cost-constant calibration for FORA's push/walk/SpMV balance.

The reference bakes in 400 ns/walk measured on its JVM
(Fora_Whole_Graph.java:35). This measures the real per-walk and per-edge
SpMV costs on the active backend/graph and returns constants in the format
of ``ppr_tpu.models.fora._default_cost_constants``; algorithms pick them up
via :func:`apply`.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import Graph
from ..ops.spmv import push_out
from ..ops.walk import weighted_walk_counts


def measure(g: Graph, *, alpha: float = 0.15, walkers: int = 1 << 16,
            batch: int = 32, reps: int = 3, seed: int = 0):
    """Returns (walk_ns_per_walk, spmv_ns_per_edge, batch_amortized=True)."""
    rng = np.random.default_rng(seed)
    starts = jnp.asarray(rng.integers(0, g.n, walkers), jnp.int32)
    rows = jnp.zeros((walkers,), jnp.int32)
    weights = jnp.full((walkers,), 1.0 / walkers, jnp.float32)

    counts = weighted_walk_counts(
        g, starts, rows, weights, jax.random.key(0), alpha, num_rows=1
    )
    jax.block_until_ready(counts)
    t0 = time.perf_counter()
    for i in range(reps):
        counts = weighted_walk_counts(
            g, starts, rows, weights, jax.random.key(i + 1), alpha, num_rows=1
        )
    jax.block_until_ready(counts)
    walk_ns = (time.perf_counter() - t0) / reps / walkers * 1e9

    a = jnp.asarray(
        rng.random((batch, g.n_pad), np.float32) * np.asarray(g.node_mask)
    )
    out = push_out(g, a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = push_out(g, a)
    jax.block_until_ready(out)
    spmv_ns_per_edge = (time.perf_counter() - t0) / reps / max(g.m, 1) * 1e9

    # device->host transfer rate: sized so the sample stays ~100 ms even on
    # the ~22 MB/s tunneled link; prices the preprocessing compaction
    # transfer in the completion choice (_ForaCostModel._use_spmv).
    # Two DISTINCT device slices (jax caches a converted array's host value,
    # so re-reading the same one is free): both are materialized and any
    # slice-op compile paid BEFORE the timed read, which then measures the
    # device->host copy alone.
    h = min(batch, 8)
    warm_probe, probe = out[:h], out[h:2 * h]
    jax.block_until_ready((warm_probe, probe))
    np.asarray(warm_probe)                             # warm the path
    nbytes = probe.size * 4
    t0 = time.perf_counter()
    np.asarray(probe)
    d2h_bytes_per_s = nbytes / max(time.perf_counter() - t0, 1e-9)

    return walk_ns, spmv_ns_per_edge, True, d2h_bytes_per_s


def apply(algo, constants) -> None:
    """Install measured constants on a FORA algorithm instance.

    Accepts both the 3-tuple (walk, spmv, amortized) and the 4-tuple that
    adds the measured device->host rate."""
    (
        algo.avg_rand_walk_time_ns,
        algo.spmv_ns_per_edge,
        algo.spmv_batch_amortized,
    ) = constants[:3]
    if len(constants) > 3:
        algo.d2h_bytes_per_s = constants[3]
