"""Node-sharded backward search / BASE all-pair: O(n/S) reverse push.

Completes the node-sharded engine family (top-k and whole-graph live in
:mod:`.node_sharded_fora`): the BASE all-pair preprocessing sweep
(Base_Whole_Graph.java:58-165) is the reference's memory-heaviest job — a
reverse push from EVERY node as target — and
:class:`ppr_tpu.parallel.sharded_allpair.ShardedBackwardSearch` still
replicates the ``[n_pad, T]`` state on every device. Here the node
dimension is PARTITIONED:

* device d owns node range d (its ``[T_local, n_local]`` reserve/residue
  chunk) and every original edge whose SOURCE u lies in its range — the
  reverse step scatters ``(1-alpha) r(v) / d_out(u)`` INTO u, so the
  scatter is purely local (src-sorted within each block -> sorted segment
  reduction);
* per sweep the active-residue chunks circulate the 'graph' ring (S-1
  ``ppermute`` hops); at hop t device d holds shard (d-t) mod S's chunk and
  gathers its blocks' edge-destination residues from it;
* the strict ``r > rmax`` gate (Backward_Search.java:89-94), mass dying at
  in-degree-0 frontier nodes (:73-96) and the in-degree-0 target
  short-circuit ``pi(t,t)=1`` (:46-49) all match
  :func:`ppr_tpu.ops.push.backward_push_sweeps` exactly; loop control is
  pmax-combined over BOTH mesh axes so every device runs identical trip
  counts.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.csr import Graph
from .sharded import make_mesh


def partition_edges_by_src_dst(g: Graph, num_shards: int):
    """Host-side: per-(src-shard, dst-shard) edge blocks of equal length.

    The backward-flow analogue of
    :func:`ppr_tpu.parallel.node_sharded.partition_edges_by_dst_src`:
    block (d, s) holds the edges whose SRC u (the reverse step's scatter
    side) is in shard d's node range and DST v (gather side) in shard s's,
    both rebased shard-local, src order preserved within each block so the
    scatter is a sorted segment reduction. Returns ``(src_local, dst_local,
    mask, coef|None, n_local)`` each ``[S, S, E]``."""
    if g.n_pad % num_shards:
        raise ValueError(f"n_pad {g.n_pad} not divisible by {num_shards}")
    n_local = g.n_pad // num_shards
    src = np.asarray(g.edge_src)[: g.m]
    dst = np.asarray(g.edge_dst)[: g.m]
    coef = np.asarray(g.edge_coef)[: g.m] if g.weighted else None
    d_shard = src // n_local
    s_shard = dst // n_local
    counts = np.zeros((num_shards, num_shards), np.int64)
    np.add.at(counts, (d_shard, s_shard), 1)
    e_max = int(counts.max()) if g.m else 0
    e_max = max(128, ((e_max + 127) // 128) * 128)
    src_out = np.full((num_shards, num_shards, e_max), n_local - 1, np.int32)
    dst_out = np.zeros((num_shards, num_shards, e_max), np.int32)
    mask_out = np.zeros((num_shards, num_shards, e_max), np.float32)
    coef_out = (np.zeros((num_shards, num_shards, e_max), np.float32)
                if g.weighted else None)
    key = d_shard * num_shards + s_shard
    order = np.argsort(key, kind="stable")   # stable keeps src order
    sorted_key = key[order]
    starts = np.searchsorted(sorted_key, np.arange(num_shards * num_shards))
    ends = np.searchsorted(sorted_key, np.arange(num_shards * num_shards),
                           side="right")
    for d in range(num_shards):
        for s in range(num_shards):
            blk = order[starts[d * num_shards + s]:ends[d * num_shards + s]]
            cnt = len(blk)
            src_out[d, s, :cnt] = src[blk] - d * n_local
            dst_out[d, s, :cnt] = dst[blk] - s * n_local
            mask_out[d, s, :cnt] = 1.0
            if g.weighted:
                coef_out[d, s, :cnt] = coef[blk]
    return src_out, dst_out, mask_out, coef_out, n_local


def make_node_sharded_backward(mesh: Mesh, g: Graph, *, alpha: float,
                               max_sweeps: int = 10_000):
    """Build the jitted node-sharded reverse-push program.

    Returns ``(fn, arrays)``; ``fn(...arrays..., targets, rmax) ->
    reserve`` with ``targets`` int32[T] data-sharded and the reserve
    ``[T, n_pad]`` sharded (data, graph) — [T_local, n_local] per device.
    """
    alpha_f = jnp.float32(alpha)
    mesh_shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    s_graph = mesh_shape["graph"]
    src_b, dst_b, mask_b, coef_b, n_local = partition_edges_by_src_dst(
        g, s_graph
    )
    block_spec = NamedSharding(mesh, P("graph", None, None))
    node_spec = NamedSharding(mesh, P("graph"))
    inv_deg = jnp.where(
        g.out_deg > 0, 1.0 / jnp.maximum(g.out_deg.astype(jnp.float32), 1.0),
        0.0,
    )
    arrays = dict(
        src=jax.device_put(jnp.asarray(src_b), block_spec),
        dst=jax.device_put(jnp.asarray(dst_b), block_spec),
        mask=jax.device_put(jnp.asarray(mask_b), block_spec),
        coef=(jax.device_put(jnp.asarray(coef_b), block_spec)
              if coef_b is not None else None),
        inv_deg=jax.device_put(inv_deg, node_spec),
        in_deg=jax.device_put(g.in_deg, node_spec),
        node_mask=jax.device_put(g.node_mask, node_spec),
    )
    weighted = arrays["coef"] is not None
    perm = [(i, (i + 1) % s_graph) for i in range(s_graph)]

    def _rot(x):
        return jax.lax.ppermute(x, "graph", perm) if s_graph > 1 else x

    def local(src_e, dst_e, mask_e, coef_e, inv_deg_l, in_deg_l,
              node_mask_l, targets, rmax):
        my = jax.lax.axis_index("graph").astype(jnp.int32)
        base = my * n_local
        local_ids = base + jnp.arange(n_local, dtype=jnp.int32)
        onehot_l = (targets[:, None] == local_ids[None, :]).astype(
            jnp.float32
        )                                        # [T_local, n_local]
        valid = (node_mask_l > 0)[None, :]
        p0 = jnp.zeros_like(onehot_l)

        def frontier(r_):
            return (r_ > rmax) & valid

        def cond(state):
            _, r_, it = state
            any_all = jax.lax.pmax(
                jnp.any(frontier(r_)).astype(jnp.int32), ("data", "graph")
            )
            return (it < max_sweeps) & (any_all > 0)

        def body(state):
            p_, r_, it = state
            a = jnp.where(frontier(r_), r_, 0.0)
            p_ = p_ + alpha_f * a
            chunk = (1.0 - alpha_f) * a          # circulates the ring

            def hop(t, carry):
                chunk_, acc = carry
                s = jax.lax.rem(my - t + s_graph, s_graph)
                src_t = jax.lax.dynamic_index_in_dim(src_e[0], s, 0, False)
                dst_t = jax.lax.dynamic_index_in_dim(dst_e[0], s, 0, False)
                msk_t = jax.lax.dynamic_index_in_dim(mask_e[0], s, 0, False)
                contrib = jnp.take(chunk_, dst_t, axis=-1) * msk_t
                if weighted:
                    cf_t = jax.lax.dynamic_index_in_dim(coef_e[0], s, 0,
                                                        False)
                    contrib = contrib * cf_t
                add = jax.ops.segment_sum(
                    jnp.moveaxis(contrib, -1, 0), src_t,
                    num_segments=n_local, indices_are_sorted=True,
                )
                acc = acc + jnp.moveaxis(add, 0, -1)
                chunk_ = jax.lax.cond(
                    t < s_graph - 1, _rot, lambda c: c, chunk_
                )
                return chunk_, acc

            _, pulled = jax.lax.fori_loop(
                0, s_graph, hop, (chunk, jnp.zeros_like(a))
            )
            if not weighted:
                pulled = pulled * inv_deg_l[None, :]
            r_ = r_ - a + pulled
            return p_, r_, it + 1

        p_f, _, _ = jax.lax.while_loop(
            cond, body, (p0, onehot_l, jnp.int32(0))
        )
        # zero-in-degree target short-circuit (Backward_Search.java:46-49)
        tgt_in = (targets >= base) & (targets < base + n_local)
        deg_t_l = jnp.where(
            tgt_in,
            jnp.take(in_deg_l, jnp.clip(targets - base, 0, n_local - 1)),
            0,
        )
        deg_t = jax.lax.psum(deg_t_l, "graph")           # [T_local]
        p_f = jnp.where(deg_t[:, None] == 0, onehot_l, p_f)
        return p_f

    if weighted:
        fn = local
        block_specs = (P("graph", None, None),) * 4
    else:
        def fn(src_e, dst_e, mask_e, inv_deg_l, in_deg_l, node_mask_l,
               targets, rmax):
            return local(src_e, dst_e, mask_e, None, inv_deg_l, in_deg_l,
                         node_mask_l, targets, rmax)

        block_specs = (P("graph", None, None),) * 3

    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=block_specs + (
            P("graph"), P("graph"), P("graph"),
            P("data"),
            P(),
        ),
        out_specs=P("data", "graph"),
        check_vma=False,
    )
    return jax.jit(mapped), arrays


class NodeShardedBackwardSearch:
    """Drop-in for :class:`ppr_tpu.models.backward_search.BackwardSearch`
    running the reverse push with O(n/S)-memory node-sharded state."""

    def __init__(self, graph: Graph, alpha: float, rmax: float, *,
                 mesh: Mesh | None = None, max_sweeps: int = 10_000):
        self.graph = graph
        self.alpha = float(alpha)
        self.rmax = float(rmax)
        self.duration_ns = 0
        self.mesh = mesh if mesh is not None else make_mesh()
        self._mesh_shape = dict(zip(self.mesh.axis_names,
                                    self.mesh.devices.shape))
        self.n_local = graph.n_pad // self._mesh_shape["graph"]
        self._fn, self._arrays = make_node_sharded_backward(
            self.mesh, graph, alpha=self.alpha, max_sweeps=max_sweeps
        )
        self._tgt_spec = NamedSharding(self.mesh, P("data"))

    def _pad(self, targets: np.ndarray) -> tuple[np.ndarray, int]:
        targets = np.asarray(targets, np.int32)
        t = len(targets)
        unit = self._mesh_shape["data"]
        t_pad = ((max(8, t) + unit - 1) // unit) * unit
        if t_pad > t:
            targets = np.concatenate([targets, np.zeros(t_pad - t, np.int32)])
        return targets, t

    def whole_graph_device(self, targets: np.ndarray):
        """Device-resident reserve [T_pad, n_pad] sharded (data, graph);
        rows past ``len(targets)`` are padding."""
        import time

        t0 = time.perf_counter_ns()
        targets_p, _ = self._pad(targets)
        tj = jax.device_put(jnp.asarray(targets_p, jnp.int32),
                            self._tgt_spec)
        a = self._arrays
        args = [a["src"], a["dst"], a["mask"]]
        if a["coef"] is not None:
            args.append(a["coef"])
        args += [a["inv_deg"], a["in_deg"], a["node_mask"], tj,
                 jnp.float32(self.rmax)]
        out = self._fn(*args)
        out.block_until_ready()
        self.duration_ns += time.perf_counter_ns() - t0
        return out

    def whole_graph(self, targets: np.ndarray) -> np.ndarray:
        out = self.whole_graph_device(targets)
        return np.asarray(out)[: len(targets)]

    def get_duration(self) -> int:
        """Accumulated ns across calls (Backward_Search.java:36,:98-106)."""
        return self.duration_ns


def node_sharded_base_allpair(dataset, alpha: float, *,
                              mesh: Mesh | None = None, seed: int = 0,
                              target_batch: int = 512):
    """A :class:`BaseAllPair` whose reverse-push sweep runs node-sharded —
    the O(n/S) analogue of
    :func:`ppr_tpu.parallel.sharded_allpair.sharded_base_allpair`."""
    from ..models.base_allpair import BaseAllPair

    mesh = mesh if mesh is not None else make_mesh()

    class _NodeSharded(BaseAllPair):
        name = BaseAllPair.name          # same store dir / result identity

        def _make_bws(self, threshold: float) -> NodeShardedBackwardSearch:
            return NodeShardedBackwardSearch(
                self.graph, self.alpha, rmax=threshold, mesh=mesh
            )

    return _NodeSharded(dataset, alpha, seed=seed,
                        target_batch=target_batch)
