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


def partition_edges_by_dst_src(g: Graph, num_shards: int):
    """Host-side: per-(dst-shard, src-shard) edge blocks of equal length.

    Returns ``(src_local [S, S, E], dst_local [S, S, E], coef [S, S, E]|None,
    n_local)`` where block (d, s) holds the edges with dst in shard d's node
    range and src in shard s's, both endpoint ids rebased to shard-local
    (0..n_local-1). Padding entries use src = n_local-1 of the *sentinel
    shard trick*: they get ``coef``/scale 0 via a separate validity mask —
    here simply dst = n_local-1 with a zero mask column baked into ``coef``
    for weighted graphs and a src pointing at the last local node whose
    residue contribution is zeroed by an explicit mask array (returned as
    ``mask [S, S, E]``)."""
    if g.n_pad % num_shards:
        raise ValueError(f"n_pad {g.n_pad} not divisible by {num_shards}")
    n_local = g.n_pad // num_shards
    dst_sorted = np.asarray(g.edge_dst_bydst)[: g.m]
    src_sorted = np.asarray(g.edge_src_bydst)[: g.m]
    coef_sorted = (
        np.asarray(g.edge_coef_bydst)[: g.m] if g.weighted else None
    )
    d_shard = dst_sorted // n_local
    s_shard = src_sorted // n_local
    counts = np.zeros((num_shards, num_shards), np.int64)
    np.add.at(counts, (d_shard, s_shard), 1)
    e_max = int(counts.max()) if g.m else 0
    e_max = max(128, ((e_max + 127) // 128) * 128)
    src_out = np.zeros((num_shards, num_shards, e_max), np.int32)
    dst_out = np.full((num_shards, num_shards, e_max), n_local - 1, np.int32)
    mask_out = np.zeros((num_shards, num_shards, e_max), np.float32)
    coef_out = (
        np.zeros((num_shards, num_shards, e_max), np.float32)
        if g.weighted else None
    )
    # group edges by (d, s) preserving dst order within each block so every
    # block scatter is a sorted segment reduction
    key = d_shard * num_shards + s_shard
    order = np.argsort(key, kind="stable")
    sorted_key = key[order]
    starts = np.searchsorted(sorted_key, np.arange(num_shards * num_shards))
    ends = np.searchsorted(sorted_key, np.arange(num_shards * num_shards),
                           side="right")
    for d in range(num_shards):
        for s in range(num_shards):
            blk = order[starts[d * num_shards + s]:ends[d * num_shards + s]]
            cnt = len(blk)
            src_out[d, s, :cnt] = src_sorted[blk] - s * n_local
            dst_out[d, s, :cnt] = dst_sorted[blk] - d * n_local
            mask_out[d, s, :cnt] = 1.0
            if g.weighted:
                coef_out[d, s, :cnt] = coef_sorted[blk]
    return src_out, dst_out, mask_out, coef_out, n_local


def make_node_sharded_propagate_ring(mesh: Mesh, g: Graph, alpha: float,
                                     ring_dtype: str = "f32"):
    """Node-sharded propagation with a chunked ``ppermute`` RING exchange.

    ``ring_dtype="bf16"`` halves the ring's wire bytes: the circulating
    chunk is cast to bfloat16 for each hop's ``ppermute`` and widened
    back to f32 on arrival (local accumulation stays f32; hop 0 uses the
    unrounded local chunk). Max S-1 roundings per value at 2^-8 relative
    each; bounded-error-tested vs the f32 ring
    (tests/test_ring_bf16.py). See parallel/comm_model.py for pricing.

    The plain :func:`make_node_sharded_propagate` all-gathers the full
    ``[B, n_pad]`` residue onto every device each iteration — fine for
    throughput, but the transient footprint stays O(n) per device, which
    defeats the module's purpose once state outgrows one device's HBM.

    Here each device only ever holds its own ``[B, n_local]`` residue chunk
    plus ONE visiting chunk: per iteration the residue chunks circulate the
    'graph' ring (S-1 ``ppermute`` hops); at hop t device d holds shard
    (d - t) mod S's chunk and accumulates that block's edge contributions
    into its local destinations. Per-device peak transient state is
    ``[B, n_local]`` x2 + one ``[E_block, B]`` gather intermediate — all
    O(n/S), the true memory-scaling 2D partition. Dangling mass is a [B]
    psum (Power_Method.java:74-80 semantics, dangling -> source).

    Returns ``(prepare_fn, run_fn)`` like the all-gather variant:
    ``prepare(sources) -> (p_l, r_l, onehot_l)`` sharded (data, graph);
    ``run(p_l, r_l, onehot_l, num_iters)`` fuses iterations in one dispatch.
    """
    mesh_shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    s_graph = mesh_shape["graph"]
    src_b, dst_b, mask_b, coef_b, n_local = partition_edges_by_dst_src(
        g, s_graph
    )

    state_spec = NamedSharding(mesh, P("data", "graph"))
    # block arrays: device d holds row d -> [1, S, E] locally
    block_spec = NamedSharding(mesh, P("graph", None, None))
    node_spec = NamedSharding(mesh, P("graph"))

    src_d = jax.device_put(jnp.asarray(src_b), block_spec)
    dst_d = jax.device_put(jnp.asarray(dst_b), block_spec)
    mask_d = jax.device_put(jnp.asarray(mask_b), block_spec)
    coef_d = (
        jax.device_put(jnp.asarray(coef_b), block_spec)
        if coef_b is not None else None
    )
    inv_deg_full = jnp.where(
        g.out_deg > 0, 1.0 / jnp.maximum(g.out_deg.astype(jnp.float32), 1.0),
        0.0,
    )
    inv_deg_d = jax.device_put(inv_deg_full, node_spec)       # [n_local]/dev
    dangling_d = jax.device_put(
        ((g.out_deg == 0) & (g.node_mask > 0)).astype(jnp.float32), node_spec
    )

    alpha_f = jnp.float32(alpha)
    perm = [(i, (i + 1) % s_graph) for i in range(s_graph)]
    if ring_dtype not in ("f32", "bf16"):
        raise ValueError(f"ring_dtype must be 'f32' or 'bf16', got "
                         f"{ring_dtype!r}")

    def _rot_payload(c):
        if ring_dtype == "bf16":
            return jax.lax.ppermute(
                c.astype(jnp.bfloat16), "graph", perm
            ).astype(jnp.float32)
        return jax.lax.ppermute(c, "graph", perm)

    def _iteration(blocks, inv_deg_l, dangling_l, my, p_l, r_l, onehot_l):
        src_e, dst_e, mask_e, coef_e = blocks
        p_l = p_l + alpha_f * r_l
        rem = (1.0 - alpha_f) * r_l
        # dangling mass: local partial + psum -> full scalar per row
        dang_local = jnp.sum(rem * dangling_l[None, :], axis=-1,
                             keepdims=True)
        dang_mass = jax.lax.psum(dang_local, "graph")
        # the circulating chunk: residue scaled at the source side
        if coef_e is None:
            chunk = rem * inv_deg_l[None, :]                 # [B_l, n_local]
        else:
            chunk = rem

        def hop(t, carry):
            chunk_, acc = carry
            # at hop t this device holds shard (my - t) mod S's chunk
            s = jax.lax.rem(my - t + s_graph, s_graph)
            src_t = jax.lax.dynamic_index_in_dim(src_e[0], s, 0,
                                                 keepdims=False)
            dst_t = jax.lax.dynamic_index_in_dim(dst_e[0], s, 0,
                                                 keepdims=False)
            msk_t = jax.lax.dynamic_index_in_dim(mask_e[0], s, 0,
                                                 keepdims=False)
            contrib = jnp.take(chunk_, src_t, axis=-1) * msk_t   # [B_l, E]
            if coef_e is not None:
                cf_t = jax.lax.dynamic_index_in_dim(coef_e[0], s, 0,
                                                    keepdims=False)
                contrib = contrib * cf_t
            add = jax.ops.segment_sum(
                jnp.moveaxis(contrib, -1, 0), dst_t,
                num_segments=n_local, indices_are_sorted=True,
            )
            acc = acc + jnp.moveaxis(add, 0, -1)
            # rotate AFTER use; skip the final (wasted) hop
            chunk_ = jax.lax.cond(
                t < s_graph - 1,
                _rot_payload,
                lambda c: c,
                chunk_,
            )
            return chunk_, acc

        if s_graph == 1:
            _, acc = hop(jnp.int32(0), (chunk, jnp.zeros_like(r_l)))
        else:
            _, acc = jax.lax.fori_loop(
                0, s_graph, hop, (chunk, jnp.zeros_like(r_l))
            )
        r_new = acc + dang_mass * onehot_l
        return p_l, r_new

    def _fused(src_e, dst_e, mask_e, coef_e, inv_deg_l, dangling_l,
               p_l, r_l, onehot_l, num_iters):
        my = jax.lax.axis_index("graph").astype(jnp.int32)
        blocks = (src_e, dst_e, mask_e, coef_e)

        def body(_, st):
            return _iteration(blocks, inv_deg_l, dangling_l, my,
                              st[0], st[1], onehot_l)

        return jax.lax.fori_loop(0, num_iters, body, (p_l, r_l))

    block_specs = (P("graph", None, None),) * 3
    if coef_d is not None:
        fn = _fused
        block_specs = block_specs + (P("graph", None, None),)

        def caller(p_l, r_l, onehot_l, it):
            return mapped(src_d, dst_d, mask_d, coef_d, inv_deg_d,
                          dangling_d, p_l, r_l, onehot_l, it)
    else:
        def fn(src_e, dst_e, mask_e, inv_deg_l, dangling_l, p_l, r_l,
               onehot_l, num_iters):
            return _fused(src_e, dst_e, mask_e, None, inv_deg_l, dangling_l,
                          p_l, r_l, onehot_l, num_iters)

        def caller(p_l, r_l, onehot_l, it):
            return mapped(src_d, dst_d, mask_d, inv_deg_d, dangling_d,
                          p_l, r_l, onehot_l, it)

    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=block_specs + (
            P("graph"), P("graph"),                  # inv_deg, dangling
            P("data", "graph"), P("data", "graph"),  # p, r
            P("data", "graph"),                      # source one-hot
            P(),                                     # num_iters
        ),
        out_specs=(P("data", "graph"), P("data", "graph")),
        check_vma=False,
    )
    _run_jit = jax.jit(caller)

    def prepare(sources):
        sources = jnp.asarray(sources, jnp.int32)
        onehot = jax.nn.one_hot(sources, g.n_pad, dtype=jnp.float32)
        p = jnp.zeros_like(onehot)
        return (
            jax.device_put(p, state_spec),
            jax.device_put(onehot, state_spec),
            jax.device_put(onehot, state_spec),
        )

    def run(p_l, r_l, onehot_l, num_iters: int):
        return _run_jit(p_l, r_l, onehot_l, jnp.int32(num_iters))

    return prepare, run


def partition_csr_by_node(g: Graph, num_shards: int):
    """Host-side: per-shard CSR slices for the rotating-adjacency walk.

    Returns ``(indptr_local [S, n_local+1], indices [S, E], alias_prob
    [S, E]|None, alias_other [S, E]|None, n_local)``. ``indptr_local`` is
    rebased to 0 per shard; ``indices`` hold GLOBAL node ids (walkers move
    in global space); ``alias_other`` slot ids are rebased shard-local."""
    if g.n_pad % num_shards:
        raise ValueError(f"n_pad {g.n_pad} not divisible by {num_shards}")
    n_local = g.n_pad // num_shards
    indptr = np.asarray(g.indptr)
    indices = np.asarray(g.indices)
    weighted = g.alias_prob is not None
    prob = np.asarray(g.alias_prob) if weighted else None
    other = np.asarray(g.alias_other) if weighted else None

    bounds = indptr[np.arange(0, g.n_pad + 1, n_local)]
    counts = np.diff(bounds)
    e_max = int(counts.max()) if len(counts) else 0
    e_max = max(128, ((e_max + 127) // 128) * 128)
    ip_out = np.zeros((num_shards, n_local + 1), np.int32)
    idx_out = np.full((num_shards, e_max), g.n_pad - 1, np.int32)
    prob_out = np.ones((num_shards, e_max), np.float32) if weighted else None
    other_out = (
        np.tile(np.arange(e_max, dtype=np.int32), (num_shards, 1))
        if weighted else None
    )
    for s in range(num_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        ip_out[s] = indptr[s * n_local:(s + 1) * n_local + 1] - lo
        idx_out[s, : hi - lo] = indices[lo:hi]
        if weighted:
            prob_out[s, : hi - lo] = prob[lo:hi]
            other_out[s, : hi - lo] = other[lo:hi] - lo
    return ip_out, idx_out, prob_out, other_out, n_local


def make_node_sharded_walk_counts(mesh: Mesh, g: Graph, alpha: float,
                                  max_steps: int = 128):
    """Node-sharded walk kernel: adjacency chunks ROTATE, walkers stay put.

    The replicated-adjacency walk (parallel/sharded.py) needs the full CSR
    on every device; this variant keeps only ``1/S`` of the CSR per device
    and circulates the slices around the 'graph' ring. Per walk step every
    walker advances exactly once: the step's move decision is drawn up
    front, then ``S`` ring hops each advance the walkers whose current node
    lies in the visiting slice (SURVEY.md §7 "cross-shard walks" — the
    batched-migration alternative; here the *graph* migrates, which is
    load-balance-free and needs no overflow handling). Dangling walkers
    reset to their start (Monte_Carlo.java:87-90). Stop-count deposits
    circulate the same ring, so per-device output is ``[B_local, n_local]``
    — every array O(1/S), the true memory-scaling walk path.

    Returns ``call(starts, weights, key) -> counts`` where
    ``starts``/``weights`` are ``[B, W]`` (sharded data x graph) and counts
    come back ``[B, n_pad]`` sharded (data, graph) over node columns.
    """
    mesh_shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    s_graph = mesh_shape["graph"]
    ip_np, idx_np, prob_np, other_np, n_local = partition_csr_by_node(
        g, s_graph
    )
    weighted = prob_np is not None

    chunk_spec = NamedSharding(mesh, P("graph", None))
    ip_d = jax.device_put(jnp.asarray(ip_np), chunk_spec)
    idx_d = jax.device_put(jnp.asarray(idx_np), chunk_spec)
    prob_d = (jax.device_put(jnp.asarray(prob_np), chunk_spec)
              if weighted else None)
    other_d = (jax.device_put(jnp.asarray(other_np), chunk_spec)
               if weighted else None)

    perm = [(i, (i + 1) % s_graph) for i in range(s_graph)]

    def _rot(x):
        return jax.lax.ppermute(x, "graph", perm) if s_graph > 1 else x

    def local(ip_c, idx_c, prob_c, other_c, starts, weights, keys):
        # ip_c: [1, n_local+1]; idx_c[/prob_c/other_c]: [1, E]
        b, w = starts.shape
        flat_starts = starts.reshape(-1)
        my = jax.lax.axis_index("graph").astype(jnp.int32)
        key = jax.random.fold_in(
            jax.random.wrap_key_data(keys[0, 0]),
            jax.lax.axis_index("data") * s_graph + my,
        )

        def cond(state):
            _, active, _, step, *_ = state
            # global over BOTH axes: every device must run identical trip
            # counts — XLA:CPU (and conservatively any backend) may
            # rendezvous collectives across the whole computation, so
            # divergent per-group counts can deadlock
            any_global = jax.lax.pmax(
                jnp.any(active).astype(jnp.int32), ("data", "graph")
            )
            return (step < max_steps) & (any_global > 0)

        def body(state):
            cur, active, k, step, ip, idx, prob, other = state
            k, k_u = jax.random.split(k)
            u = jax.random.uniform(k_u, flat_starts.shape)
            stop_now = u < alpha
            u_move = (u - alpha) * (1.0 / (1.0 - alpha))
            if weighted:
                k, k_u2 = jax.random.split(k)
                u2 = jax.random.uniform(k_u2, flat_starts.shape)
            need = active & ~stop_now

            def hop(t, carry):
                ip_, idx_, prob_, other_, nxt = carry
                base = jax.lax.rem(my - t + s_graph, s_graph) * n_local
                in_chunk = need & (cur >= base) & (cur < base + n_local)
                lv = jnp.clip(cur - base, 0, n_local - 1)
                lo = jnp.take(ip_[0], lv)
                deg = jnp.take(ip_[0], lv + 1) - lo
                pick = jnp.minimum(
                    (u_move * deg.astype(jnp.float32)).astype(jnp.int32),
                    deg - 1,
                )
                slot = lo + jnp.maximum(pick, 0)
                if weighted:
                    accept = u2 < jnp.take(prob_[0], slot)
                    slot = jnp.where(accept, slot,
                                     jnp.take(other_[0], slot))
                cand = jnp.take(idx_[0], slot)
                cand = jnp.where(deg > 0, cand, flat_starts)
                nxt = jnp.where(in_chunk, cand, nxt)
                # rotate every hop: S hops per step -> chunks return home
                return (_rot(ip_), _rot(idx_),
                        _rot(prob_) if weighted else prob_,
                        _rot(other_) if weighted else other_, nxt)

            ip, idx, prob, other, nxt = jax.lax.fori_loop(
                0, s_graph, hop, (ip, idx, prob, other, cur)
            )
            cur = jnp.where(need, nxt, cur)
            return cur, active & ~stop_now, k, step + 1, ip, idx, prob, other

        stops, _, _, _, _, _, _, _ = jax.lax.while_loop(
            cond, body,
            (flat_starts, jnp.ones(flat_starts.shape, bool), key,
             jnp.int32(0), ip_c, idx_c, prob_c, other_c),
        )

        # deposit ring: counts chunks [b, n_local] circulate; after S hops
        # each chunk has passed every device in its graph group and is home
        rows = jnp.repeat(jnp.arange(b, dtype=jnp.int32), w)
        wflat = weights.reshape(-1)

        def dhop(t, chunk):
            base = jax.lax.rem(my - t + s_graph, s_graph) * n_local
            in_range = (stops >= base) & (stops < base + n_local)
            lv = jnp.clip(stops - base, 0, n_local - 1)
            chunk = chunk.at[rows, lv].add(
                jnp.where(in_range, wflat, 0.0)
            )
            return _rot(chunk)

        counts = jax.lax.fori_loop(
            0, s_graph, dhop, jnp.zeros((b, n_local), jnp.float32)
        )
        return counts

    if weighted:
        fn = local
        chunk_specs = (P("graph", None),) * 4
    else:
        def fn(ip_c, idx_c, starts, weights, keys):
            return local(ip_c, idx_c, None, None, starts, weights, keys)

        chunk_specs = (P("graph", None),) * 2

    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=chunk_specs + (
            P("data", "graph"), P("data", "graph"),   # walkers, weights
            P("data", "graph"),                        # key material
        ),
        out_specs=P("data", "graph"),
        check_vma=False,
    )
    jitted = jax.jit(mapped)

    def call(starts, weights, key):
        keys = jax.random.key_data(
            jax.random.split(
                key, mesh_shape["data"] * s_graph
            )
        ).reshape(mesh_shape["data"], s_graph, -1)
        if weighted:
            return jitted(ip_d, idx_d, prob_d, other_d, starts, weights,
                          keys)
        return jitted(ip_d, idx_d, starts, weights, keys)

    return call


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
