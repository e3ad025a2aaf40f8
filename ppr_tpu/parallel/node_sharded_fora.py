"""Node-sharded END-TO-END FORA top-k: the O(n/S)-memory query engine.

:class:`ppr_tpu.parallel.sharded_fora.ShardedForaTopk` shards *edges* and
replicates the node dimension of the state on every device — right for
throughput, wrong once ``[B, n]`` outgrows one device's HBM. This module
composes the same delta-annealing FORA top-k loop
(:func:`ppr_tpu.models.fora.annealed_topk_propagate`; Fora_Topk.java:102-184
semantics — delta annealed /4 from 1/k to 1/n, termination when the k-th
reserve >= (1+eps')*delta) over the 2D ring-exchange node partition of
:mod:`ppr_tpu.parallel.node_sharded`:

* nodes are split into contiguous ranges of ``n_pad/S`` along the 'graph'
  mesh axis; each device owns the [B_local, n_local] reserve/residue chunk
  for its range plus the (dst-shard, src-shard) edge blocks whose dst falls
  in it (:func:`partition_edges_by_dst_src`);
* one sweep circulates the residue chunks around the 'graph' ring (S-1
  ``ppermute`` hops); at hop t device d holds shard (d-t) mod S's chunk and
  accumulates that block's gather + sorted segment-sum into its local
  destinations — per-device transient state stays O(n/S);
* annealing/termination scalars are ``psum``/``pmax``/``pmin``-combined over
  BOTH mesh axes, so every device runs bitwise-identical while_loop trip
  counts (required for the ring collectives to rendezvous);
* the epilogue is a DISTRIBUTED top-k: each node shard takes its local
  ``lax.top_k`` candidates, an ``all_gather`` along 'graph' concatenates the
  ``[S * kc]`` candidate columns in shard order, and a second ``top_k``
  merges them. Concatenation in ascending-shard order + local top_k's
  ascending-index tie order reproduce the single-device ``lax.top_k`` tie
  semantics exactly (ties resolve to the lowest node id), so the
  tie-expanded result sets match the reference's quickselect-with-ties
  retrieval (Forward_Push.java:413-429).

Everything — state init from the source ids, the annealed propagation loop,
the dangling-to-source mass return (Power_Method.java:74-80), the
dangling-source short-circuit (Fora_Topk.java:128-132) and the distributed
selection — runs inside ONE jitted ``shard_map`` program; no [B, n_pad]
array is ever materialized on any single device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.csr import Graph
from .node_sharded import partition_edges_by_dst_src
from .sharded import make_mesh


def _put_blocks(g: Graph, mesh: Mesh):
    """Device-put the (dst-shard, src-shard) edge blocks + node-range arrays
    sharded along 'graph'. Returns (arrays dict, n_local)."""
    s_graph = dict(zip(mesh.axis_names, mesh.devices.shape))["graph"]
    src_b, dst_b, mask_b, coef_b, n_local = partition_edges_by_dst_src(
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
        dangling=jax.device_put(
            ((g.out_deg == 0) & (g.node_mask > 0)).astype(jnp.float32),
            node_spec,
        ),
        out_deg=jax.device_put(g.out_deg, node_spec),
    )
    return arrays, n_local


def make_node_sharded_annealed_topk(
    mesh: Mesh,
    g: Graph,
    *,
    alpha: float,
    k: int,
    kcap: int,
    delta0: float,
    min_delta: float,
    max_iters: int = 600,
):
    """Build the jitted end-to-end node-sharded FORA top-k program.

    Returns ``(fn, arrays)`` where ``fn(...block/node arrays..., sources,
    eps) -> (vals, ids, p_local, iters)``: ``sources`` int32[B] sharded over
    'data'; ``vals``/``ids`` are ``[B, kcap]`` data-sharded (replicated over
    'graph'); ``p_local`` is the final reserve sharded (data, graph) —
    [B_local, n_local] per device; ``iters`` the sweep count.
    """
    alpha_f = jnp.float32(alpha)
    mesh_shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    s_graph = mesh_shape["graph"]
    arrays, n_local = _put_blocks(g, mesh)
    weighted = arrays["coef"] is not None
    perm = [(i, (i + 1) % s_graph) for i in range(s_graph)]

    def _rot(x):
        return jax.lax.ppermute(x, "graph", perm) if s_graph > 1 else x

    def local(src_e, dst_e, mask_e, coef_e, inv_deg_l, dangling_l,
              out_deg_l, sources, eps):
        # src_e/dst_e/mask_e[/coef_e]: [1, S, E] this dst-shard's blocks;
        # inv_deg_l/dangling_l/out_deg_l: [n_local]; sources: [B_local]
        my = jax.lax.axis_index("graph").astype(jnp.int32)
        base = my * n_local
        b_l = sources.shape[0]

        # --- state init, all O(n/S): one-hot restricted to the local range
        local_ids = base + jnp.arange(n_local, dtype=jnp.int32)
        onehot_l = (sources[:, None] == local_ids[None, :]).astype(
            jnp.float32
        )
        src_in = (sources >= base) & (sources < base + n_local)
        deg_src_l = jnp.where(
            src_in,
            jnp.take(out_deg_l, jnp.clip(sources - base, 0, n_local - 1)),
            0,
        )
        deg_src = jax.lax.psum(deg_src_l, "graph")          # [B_local]
        # dangling-source rows start (and stay) at zero; the epilogue
        # short-circuits them to e_s (Fora_Topk.java:128-132)
        r0 = jnp.where(deg_src[:, None] == 0, 0.0, onehot_l)
        p0 = jnp.zeros_like(onehot_l)

        def sweep(p_l, r_l):
            """One propagation sweep over the ring (O(n/S) transients)."""
            p_l = p_l + alpha_f * r_l
            rem = (1.0 - alpha_f) * r_l
            dang_mass = jax.lax.psum(
                jnp.sum(rem * dangling_l[None, :], axis=-1, keepdims=True),
                "graph",
            )
            chunk = rem if weighted else rem * inv_deg_l[None, :]

            def hop(t, carry):
                chunk_, acc = carry
                s = jax.lax.rem(my - t + s_graph, s_graph)
                src_t = jax.lax.dynamic_index_in_dim(src_e[0], s, 0, False)
                dst_t = jax.lax.dynamic_index_in_dim(dst_e[0], s, 0, False)
                msk_t = jax.lax.dynamic_index_in_dim(mask_e[0], s, 0, False)
                contrib = jnp.take(chunk_, src_t, axis=-1) * msk_t
                if weighted:
                    cf_t = jax.lax.dynamic_index_in_dim(coef_e[0], s, 0,
                                                        False)
                    contrib = contrib * cf_t
                add = jax.ops.segment_sum(
                    jnp.moveaxis(contrib, -1, 0), dst_t,
                    num_segments=n_local, indices_are_sorted=True,
                )
                acc = acc + jnp.moveaxis(add, 0, -1)
                # rotate AFTER use; the final hop's rotation is skipped
                # (both cond branches are collective-free when S == 1)
                chunk_ = jax.lax.cond(
                    t < s_graph - 1, _rot, lambda c: c, chunk_
                )
                return chunk_, acc

            _, acc = jax.lax.fori_loop(
                0, s_graph, hop, (chunk, jnp.zeros_like(r_l))
            )
            return p_l, acc + dang_mass * onehot_l

        def cond(state):
            _, _, delta, finished, it = state
            return (it < max_iters) & ~finished

        def body(state):
            p_, r_, delta, finished, it = state
            p_, r_ = sweep(p_, r_)

            # global decision scalars: identical on every device by
            # construction (psum over 'graph' completes row totals; pmax /
            # pmin fold the 'data' groups)
            rsum_row = jax.lax.psum(jnp.sum(r_, axis=-1), "graph")
            rsum_max = jax.lax.pmax(jnp.max(rsum_row), "data")
            settled = rsum_max <= eps * delta
            thresh = (1.0 + eps) * delta
            cnt = jax.lax.psum(
                jnp.sum((p_ >= thresh).astype(jnp.int32), axis=-1), "graph"
            )
            done_local = jnp.all(cnt >= k)
            done = jax.lax.pmin(done_local.astype(jnp.int32), "data") > 0
            done = settled & done
            at_floor = delta <= min_delta
            finished = done | (settled & at_floor)
            delta = jnp.where(
                settled & ~finished, jnp.maximum(min_delta, delta / 4.0),
                delta,
            )
            return p_, r_, delta, finished, it + 1

        p_f, _, _, _, iters = jax.lax.while_loop(
            cond, body,
            (p0, r0, jnp.float32(delta0), jnp.bool_(False), jnp.int32(0)),
        )

        # --- epilogue: dangling-source short-circuit + DISTRIBUTED top-k
        p_f = jnp.where(deg_src[:, None] == 0, onehot_l, p_f)
        kc = min(kcap, n_local)
        vals_l, ids_l = jax.lax.top_k(p_f, kc)              # [B_l, kc]
        ids_g = ids_l + base
        # ascending-shard concatenation keeps global tie order = node-id
        # order (each shard's candidates are already id-ordered within ties)
        vals_all = jax.lax.all_gather(vals_l, "graph", axis=1, tiled=True)
        ids_all = jax.lax.all_gather(ids_g, "graph", axis=1, tiled=True)
        km = min(kcap, vals_all.shape[-1])
        vals, sel = jax.lax.top_k(vals_all, km)
        ids = jnp.take_along_axis(ids_all, sel, axis=1)
        return vals, ids, p_f, iters

    if weighted:
        fn = local
        block_specs = (P("graph", None, None),) * 4
    else:
        def fn(src_e, dst_e, mask_e, inv_deg_l, dangling_l, out_deg_l,
               sources, eps):
            return local(src_e, dst_e, mask_e, None, inv_deg_l, dangling_l,
                         out_deg_l, sources, eps)

        block_specs = (P("graph", None, None),) * 3

    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=block_specs + (
            P("graph"), P("graph"), P("graph"),   # inv_deg, dangling, deg
            P("data"),                            # sources
            P(),                                  # eps
        ),
        out_specs=(
            P("data", None), P("data", None),     # vals, ids
            P("data", "graph"),                   # final reserve (local)
            P(),                                  # iters
        ),
        check_vma=False,
    )
    return jax.jit(mapped), arrays


class NodeShardedForaTopk:
    """Node-sharded multi-device FORA top-k engine: O(n/S) state per device.

    Drop-in for :class:`ppr_tpu.parallel.sharded_fora.ShardedForaTopk`'s
    query surface; matches the single-device annealed engine's decision
    points exactly (same annealing schedule, same global stopping rule),
    differing only by float reassociation across shard blocks/collectives.
    """

    name = "FORA-Topk-node-sharded"

    def __init__(self, dataset, alpha: float = 0.15, k: int = 10, *,
                 mesh: Mesh | None = None, max_iters: int = 600):
        self.dataset = dataset
        self.graph = dataset.graph
        self.alpha = float(alpha)
        self.k = int(k)
        n = self.graph.n
        self.delta0 = 1.0 / self.k
        self.min_delta = 1.0 / n
        self.max_iters = max_iters
        self.mesh = mesh if mesh is not None else make_mesh()
        self._mesh_shape = dict(zip(self.mesh.axis_names,
                                    self.mesh.devices.shape))
        self.n_local = self.graph.n_pad // self._mesh_shape["graph"]
        self._src_spec = NamedSharding(self.mesh, P("data"))
        self._programs: dict = {}

    def _pad_batch(self, sources: np.ndarray) -> tuple[np.ndarray, int]:
        sources = np.asarray(sources, np.int32)
        b = len(sources)
        unit = self._mesh_shape["data"]
        b_pad = max(8, b)
        b_pad = ((b_pad + unit - 1) // unit) * unit
        if b_pad > b:
            sources = np.concatenate([sources, np.zeros(b_pad - b, np.int32)])
        return sources, b

    def _program(self, k: int, kcap: int):
        key = (k, kcap)
        if key not in self._programs:
            self._programs[key] = make_node_sharded_annealed_topk(
                self.mesh, self.graph, alpha=self.alpha, k=k, kcap=kcap,
                delta0=1.0 / k, min_delta=self.min_delta,
                max_iters=self.max_iters,
            )
        return self._programs[key]

    def _run(self, sources: np.ndarray, k: int, kcap: int, eps: float):
        fn, arrays = self._program(k, kcap)
        sources_j = jax.device_put(jnp.asarray(sources, jnp.int32),
                                   self._src_spec)
        args = [arrays["src"], arrays["dst"], arrays["mask"]]
        if arrays["coef"] is not None:
            args.append(arrays["coef"])
        args += [arrays["inv_deg"], arrays["dangling"], arrays["out_deg"],
                 sources_j, jnp.float32(eps)]
        return fn(*args)

    def compute_topk_ids_batch(self, sources: np.ndarray, k: int, param, *,
                               kcap: int | None = None):
        """Serving path: (values [B, K], ids [B, K]) numpy, selected on
        device across the mesh; only O(B*K) crosses device->host."""
        k = int(k) if k and k > 0 else self.k
        g = self.graph
        if len(sources) == 0:
            return (np.zeros((0, 0), np.float32), np.zeros((0, 0), np.int64))
        eps = float(param) * 0.5          # eps' = eps/2 (Fora_Topk.java:110)
        sources_p, b = self._pad_batch(sources)
        kcap = int(kcap) if kcap else min(max(4 * k, k + 32), g.n_pad)
        kcap = min(kcap, g.n_pad)
        vals, ids, _, _ = self._run(sources_p, k, kcap, eps)
        return np.asarray(vals)[:b], np.asarray(ids)[:b]

    def compute_topk_batch(self, sources: np.ndarray, k: int,
                           param) -> np.ndarray:
        """Dense [B, n_pad] scores (test/verification path — gathers the
        node-sharded reserve to the host; prefer compute_topk_ids_batch)."""
        k = int(k) if k and k > 0 else self.k
        g = self.graph
        if len(sources) == 0:
            return np.zeros((0, g.n_pad), np.float32)
        eps = float(param) * 0.5
        sources_p, b = self._pad_batch(sources)
        kcap = min(max(4 * k, k + 32), g.n_pad)
        _, _, p_local, _ = self._run(sources_p, k, kcap, eps)
        return np.asarray(p_local)[:b]

    def final_state_shard_shape(self, batch: int) -> tuple[int, int]:
        """The per-device reserve shard shape — O(B/data, n/S) by design;
        tests assert it against the addressable shards of a live result."""
        return (max(8, batch) // self._mesh_shape["data"], self.n_local)
