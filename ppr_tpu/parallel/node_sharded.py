"""Node-sharded propagation: residue state partitioned across devices.

The 1D partition in :mod:`ppr_tpu.parallel.sharded` shards *edges* and
replicates node vectors — right for throughput, wrong once ``[B, n]`` state
outgrows one device's HBM. This module shards the *node* dimension:

* nodes are split into contiguous ranges of ``n_pad / S`` per device along
  the ``graph`` mesh axis; each device stores ``r_local [B, n_local]`` and
  owns every edge whose *destination* lies in its range (so the segment-sum
  scatter is purely local);
* one propagation iteration all-gathers the residue ring into the full
  ``[B, n_pad]`` (the only collective), gathers at the global source ids of
  the local edges, and reduces into local destinations;
* dangling mass is psum'd and returned to each row's source as usual
  (Power_Method.java:74-80 semantics).

Edge partition by destination comes from the dst-sorted edge view already in
the Graph (``edge_src_bydst``/``edge_dst_bydst``): device s takes the edge
range whose dst falls in its node range (searchsorted on the sorted dst
array), padded to the max per-device count with sentinel edges.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.csr import Graph


def partition_edges_by_dst(g: Graph, num_shards: int):
    """Host-side: per-shard (src, dst_local, coef) arrays of equal length.

    Returns (src [S, E], dst_local [S, E], coef [S, E] or None, n_local)
    where padding entries point at each shard's last local node with
    src = sentinel (inert: the sentinel never carries residue). ``coef`` is
    the per-edge normalized weight for weighted graphs."""
    if g.n_pad % num_shards:
        raise ValueError(f"n_pad {g.n_pad} not divisible by {num_shards}")
    n_local = g.n_pad // num_shards
    dst_sorted = np.asarray(g.edge_dst_bydst)
    src_sorted = np.asarray(g.edge_src_bydst)
    coef_sorted = (
        np.asarray(g.edge_coef_bydst) if g.weighted else None
    )
    bounds = np.searchsorted(
        dst_sorted, np.arange(0, g.n_pad + 1, n_local)
    )
    counts = np.diff(bounds)
    e_max = int(counts.max())
    # pad to a lane multiple for clean tiling
    e_max = max(128, ((e_max + 127) // 128) * 128)
    src_out = np.full((num_shards, e_max), g.n_pad - 1, np.int32)
    dst_out = np.zeros((num_shards, e_max), np.int32)
    coef_out = (
        np.zeros((num_shards, e_max), np.float32) if g.weighted else None
    )
    for s in range(num_shards):
        lo, hi = bounds[s], bounds[s + 1]
        cnt = hi - lo
        src_out[s, :cnt] = src_sorted[lo:hi]
        dst_out[s, :cnt] = dst_sorted[lo:hi] - s * n_local
        dst_out[s, cnt:] = n_local - 1  # in-range dummy, src is the sentinel
        if g.weighted:
            coef_out[s, :cnt] = coef_sorted[lo:hi]
    return src_out, dst_out, coef_out, n_local


def make_node_sharded_propagate(mesh: Mesh, g: Graph, alpha: float):
    """Returns (step_fn, prepare_fn, run_fn).

    ``step_fn(p_l, r_l, onehot_l)`` advances one propagation iteration with
    node-sharded state; ``run_fn(p_l, r_l, onehot_l, num_iters)`` fuses
    ``num_iters`` iterations into one dispatch (preferred — see its
    docstring). ``prepare_fn(sources) -> (p_l, r_l, onehot_l)`` places the
    initial state sharded over ('data' rows, 'graph' node ranges).
    """
    mesh_shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    s_graph = mesh_shape["graph"]
    src_sh, dst_sh, coef_sh, n_local = partition_edges_by_dst(g, s_graph)

    state_spec = NamedSharding(mesh, P("data", "graph"))
    edge_spec = NamedSharding(mesh, P("graph", None))
    rep = NamedSharding(mesh, P())

    src_d = jax.device_put(jnp.asarray(src_sh), edge_spec)
    dst_d = jax.device_put(jnp.asarray(dst_sh), edge_spec)
    coef_d = (
        jax.device_put(jnp.asarray(coef_sh), edge_spec)
        if coef_sh is not None else None
    )
    out_deg = jax.device_put(g.out_deg, rep)
    node_mask = jax.device_put(g.node_mask, rep)

    inv_deg_full = jnp.where(
        g.out_deg > 0, 1.0 / jnp.maximum(g.out_deg.astype(jnp.float32), 1.0),
        0.0,
    )
    inv_deg_full = jax.device_put(inv_deg_full, rep)
    is_dangling_full = jax.device_put(
        ((g.out_deg == 0) & (g.node_mask > 0)).astype(jnp.float32), rep
    )

    alpha_f = jnp.float32(alpha)

    def local_step(src_e, dst_e, coef_e, inv_deg, dangling, p_l, r_l,
                   onehot_l):
        # src_e/dst_e[/coef_e]: [1, E] local edge chunk; p/r: [B_l, n_local]
        p_l = p_l + alpha_f * r_l
        rem = (1.0 - alpha_f) * r_l

        # full residue ring: all-gather along the graph axis -> [B_l, n_pad]
        rem_full = jax.lax.all_gather(rem, "graph", axis=1, tiled=True)

        # dangling mass: sum of the full remainder over dangling nodes
        dang_mass = jnp.sum(
            rem_full * dangling[None, :], axis=-1, keepdims=True
        )

        if coef_e is None:
            scaled = rem_full * inv_deg[None, :]
            contrib = jnp.take(scaled, src_e[0], axis=-1)   # [B_l, E]
        else:
            # weighted: per-edge normalized coefficient replaces 1/d scaling
            contrib = jnp.take(rem_full, src_e[0], axis=-1) * coef_e
        # local dsts are sorted (dst-sorted global order restricted to the
        # shard; padding dummies sort to the end) -> sorted segment reduction
        n_local_ = r_l.shape[-1]
        r_new_t = jax.ops.segment_sum(
            jnp.moveaxis(contrib, -1, 0), dst_e[0],
            num_segments=n_local_, indices_are_sorted=True,
        )
        r_new = jnp.moveaxis(r_new_t, 0, -1) + dang_mass * onehot_l
        return p_l, r_new

    edge_specs = (P("graph", None), P("graph", None))
    if coef_d is not None:
        edge_specs = edge_specs + (P("graph", None),)
        fn = local_step
    else:
        def fn(src_e, dst_e, inv_deg, dangling, p_l, r_l, onehot_l):
            return local_step(src_e, dst_e, None, inv_deg, dangling, p_l,
                              r_l, onehot_l)

    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=edge_specs + (
            P(), P(),                                # inv_deg, dangling
            P("data", "graph"), P("data", "graph"),  # p, r
            P("data", "graph"),                      # source one-hot
        ),
        out_specs=(P("data", "graph"), P("data", "graph")),
        check_vma=False,
    )
    if coef_d is not None:
        step = jax.jit(
            lambda p_l, r_l, onehot_l: mapped(
                src_d, dst_d, coef_d, inv_deg_full, is_dangling_full,
                p_l, r_l, onehot_l,
            )
        )
    else:
        step = jax.jit(
            lambda p_l, r_l, onehot_l: mapped(
                src_d, dst_d, inv_deg_full, is_dangling_full,
                p_l, r_l, onehot_l,
            )
        )

    def run(p_l, r_l, onehot_l, num_iters: int):
        """``num_iters`` propagation iterations fused into ONE dispatch
        (lax.fori_loop inside the jitted shard_map program).

        Always prefer this over a host-side loop around ``step``: besides
        dispatch overhead, XLA:CPU's collective rendezvous is unreliable
        when many executions of the same all-gather program are in flight
        (intermittent SIGABRT on the virtual test mesh); a single fused
        dispatch sidesteps that entirely and is how the real multi-chip
        path should run anyway."""
        return _run_jit(p_l, r_l, onehot_l, jnp.int32(num_iters))

    if coef_d is not None:
        def _fused(src_e, dst_e, coef_e, inv_deg, dangling, p_l, r_l,
                   onehot_l, num_iters):
            def body(_, st):
                return local_step(src_e, dst_e, coef_e, inv_deg, dangling,
                                  st[0], st[1], onehot_l)
            return jax.lax.fori_loop(0, num_iters, body, (p_l, r_l))
    else:
        def _fused(src_e, dst_e, inv_deg, dangling, p_l, r_l, onehot_l,
                   num_iters):
            def body(_, st):
                return local_step(src_e, dst_e, None, inv_deg, dangling,
                                  st[0], st[1], onehot_l)
            return jax.lax.fori_loop(0, num_iters, body, (p_l, r_l))

    mapped_fused = jax.shard_map(
        _fused,
        mesh=mesh,
        in_specs=edge_specs + (
            P(), P(),
            P("data", "graph"), P("data", "graph"),
            P("data", "graph"),
            P(),                                     # num_iters scalar
        ),
        out_specs=(P("data", "graph"), P("data", "graph")),
        check_vma=False,
    )
    if coef_d is not None:
        _run_jit = jax.jit(
            lambda p_l, r_l, onehot_l, it: mapped_fused(
                src_d, dst_d, coef_d, inv_deg_full, is_dangling_full,
                p_l, r_l, onehot_l, it,
            )
        )
    else:
        _run_jit = jax.jit(
            lambda p_l, r_l, onehot_l, it: mapped_fused(
                src_d, dst_d, inv_deg_full, is_dangling_full,
                p_l, r_l, onehot_l, it,
            )
        )

    def prepare(sources):
        sources = jnp.asarray(sources, jnp.int32)
        onehot = jax.nn.one_hot(sources, g.n_pad, dtype=jnp.float32)
        p = jnp.zeros_like(onehot)
        return (
            jax.device_put(p, state_spec),
            jax.device_put(onehot, state_spec),
            jax.device_put(onehot, state_spec),
        )

    return step, prepare, run
