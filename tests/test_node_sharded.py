import jax
import jax.numpy as jnp
import numpy as np
import pytest

ALPHA = 0.15


@pytest.fixture(scope="module")
def mesh8():
    from ppr_tpu.parallel.sharded import make_mesh

    return make_mesh(8, data=2, graph=4)


def test_node_sharded_propagate_matches_power_method(got, mesh8):
    from ppr_tpu.models.power_method import power_method_batch
    from ppr_tpu.parallel.node_sharded import make_node_sharded_propagate

    g = got.graph
    assert g.n_pad % 4 == 0
    step, prepare, run = make_node_sharded_propagate(mesh8, g, ALPHA)
    sources = np.array([3, 11, 42, 64])
    p, r, onehot = prepare(sources)
    # single-step API once (synchronized: host-loop dispatch trains of CPU
    # collectives are unreliable — see node_sharded.run docstring)
    p, r = jax.block_until_ready(step(p, r, onehot))
    # the remaining iterations in one fused dispatch
    p, r = run(p, r, onehot, 59)

    ref = np.asarray(
        power_method_batch(g, jnp.asarray(sources, jnp.int32), ALPHA, 60)
    )
    np.testing.assert_allclose(np.asarray(p), ref, atol=1e-5)
    # state really is sharded over the node dimension
    shard_shapes = {s.data.shape for s in p.addressable_shards}
    assert shard_shapes == {(2, g.n_pad // 4)}


def test_edge_partition_by_dst(got):
    from ppr_tpu.parallel.node_sharded import partition_edges_by_dst

    g = got.graph
    src_sh, dst_sh, coef_sh, n_local = partition_edges_by_dst(g, 4)
    assert coef_sh is None  # uniform graph
    assert src_sh.shape == dst_sh.shape
    assert n_local * 4 == g.n_pad
    # every real edge appears exactly once in the right shard
    total_real = (src_sh != g.n_pad - 1).sum()
    assert total_real == g.m
    for s in range(4):
        real = src_sh[s] != g.n_pad - 1
        assert (dst_sh[s][real] >= 0).all()
        assert (dst_sh[s][real] < n_local).all()
        # local dsts sorted for the sorted segment reduction
        assert (np.diff(dst_sh[s]) >= 0).all()


def test_node_sharded_weighted_matches_oracle(mesh8):
    from ppr_tpu.graph.csr import build_graph
    from ppr_tpu.models.power_method import power_method_batch
    from ppr_tpu.parallel.node_sharded import make_node_sharded_propagate

    rng = np.random.default_rng(17)
    n, m = 200, 1500
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m) + 0.1
    g = build_graph(src, dst, n=n, weights=w, dense_threshold=0)
    assert g.n_pad % 4 == 0

    step, prepare, run = make_node_sharded_propagate(mesh8, g, ALPHA)
    sources = np.array([3, 77])
    p, r, onehot = prepare(sources)
    p, r = run(p, r, onehot, 50)

    ref = np.asarray(
        power_method_batch(g, jnp.asarray(sources, jnp.int32), ALPHA, 50)
    )
    np.testing.assert_allclose(np.asarray(p), ref, atol=1e-5)


def test_ring_propagate_matches_power_method(got, mesh8):
    """Chunked-ppermute ring exchange == oracle, with O(n/S) local state."""
    from ppr_tpu.models.power_method import power_method_batch
    from ppr_tpu.parallel.node_sharded import (
        make_node_sharded_propagate_ring,
        partition_edges_by_dst_src,
    )

    g = got.graph
    prepare, run = make_node_sharded_propagate_ring(mesh8, g, ALPHA)
    sources = np.array([3, 11, 42, 64])
    p, r, onehot = prepare(sources)
    p, r = run(p, r, onehot, 60)

    ref = np.asarray(
        power_method_batch(g, jnp.asarray(sources, jnp.int32), ALPHA, 60)
    )
    np.testing.assert_allclose(np.asarray(p), ref, atol=1e-5)
    # state sharded over the node dim: [B/2, n_pad/4] per device
    shard_shapes = {s.data.shape for s in p.addressable_shards}
    assert shard_shapes == {(2, g.n_pad // 4)}

    # per-device edge-block footprint shrinks with S (memory scaling):
    # block E is the max (dst,src)-block size, ~m/S^2 per block but a
    # device holds S blocks -> O(m/S) edges per device
    e2 = partition_edges_by_dst_src(g, 2)[0].shape[-1] * 2
    e4 = partition_edges_by_dst_src(g, 4)[0].shape[-1] * 4
    assert e4 <= e2 * 1.5  # per-device edge storage does not grow with S


def test_ring_propagate_weighted_matches_oracle(mesh8):
    from ppr_tpu.graph.csr import build_graph
    from ppr_tpu.models.power_method import power_method_batch
    from ppr_tpu.parallel.node_sharded import (
        make_node_sharded_propagate_ring,
    )

    rng = np.random.default_rng(23)
    n, m = 300, 2500
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m) + 0.1
    g = build_graph(src, dst, n=n, weights=w, dense_threshold=0)

    prepare, run = make_node_sharded_propagate_ring(mesh8, g, ALPHA)
    sources = np.array([3, 77])
    p, r, onehot = prepare(sources)
    p, r = run(p, r, onehot, 50)

    ref = np.asarray(
        power_method_batch(g, jnp.asarray(sources, jnp.int32), ALPHA, 50)
    )
    np.testing.assert_allclose(np.asarray(p), ref, atol=1e-5)


def test_dst_src_partition_covers_every_edge(got):
    from ppr_tpu.parallel.node_sharded import partition_edges_by_dst_src

    g = got.graph
    src_b, dst_b, mask_b, coef_b, n_local = partition_edges_by_dst_src(g, 4)
    assert coef_b is None
    assert int(mask_b.sum()) == g.m
    # real edges land in the right blocks, dst-sorted within each block
    for d in range(4):
        for s in range(4):
            real = mask_b[d, s] > 0
            assert (dst_b[d, s][real] < n_local).all()
            assert (src_b[d, s][real] < n_local).all()
            rd = dst_b[d, s][real]
            assert (np.diff(rd) >= 0).all()


def test_node_sharded_walk_mass_and_distribution(got, mesh8):
    """Rotating-adjacency walks: mass conserved, distribution ~ MC PPR."""
    from ppr_tpu.parallel.node_sharded import make_node_sharded_walk_counts

    g = got.graph
    b, w = 2, 2048
    starts = jnp.broadcast_to(
        jnp.asarray([5, 9], jnp.int32)[:, None], (b, w)
    )
    weights = jnp.full((b, w), 1.0 / w, jnp.float32)
    walk = make_node_sharded_walk_counts(mesh8, g, ALPHA)
    counts = walk(starts, weights, jax.random.key(0))
    assert counts.shape == (b, g.n_pad)
    # output really node-sharded: [B/2, n_pad/4] per device
    shard_shapes = {s.data.shape for s in counts.addressable_shards}
    assert shard_shapes == {(1, g.n_pad // 4)}
    counts = np.asarray(counts)
    np.testing.assert_allclose(counts.sum(axis=-1), 1.0, atol=1e-5)

    # walk stop-frequency estimates PPR: compare to the exact oracle
    from ppr_tpu.models.power_method import power_method_batch

    ref = np.asarray(power_method_batch(
        g, jnp.asarray([5, 9], jnp.int32), ALPHA, 100
    ))
    # MC error ~ 1/sqrt(w) per node; check the heavy entries agree
    for i in range(b):
        heavy = ref[i] > 0.02
        np.testing.assert_allclose(
            counts[i][heavy], ref[i][heavy], atol=0.05
        )


def test_node_sharded_walk_matches_replicated_kernel_stats(got, mesh8):
    """Same start/weights: rotating-chunk and replicated-adjacency kernels
    agree statistically (not bitwise: independent RNG streams)."""
    from ppr_tpu.parallel.node_sharded import make_node_sharded_walk_counts
    from ppr_tpu.parallel.sharded import make_sharded_walk_counts

    g = got.graph
    b, w = 2, 4096
    starts = jnp.broadcast_to(
        jnp.asarray([3, 42], jnp.int32)[:, None], (b, w)
    )
    weights = jnp.full((b, w), 1.0 / w, jnp.float32)
    ring = make_node_sharded_walk_counts(mesh8, g, ALPHA)
    rep = make_sharded_walk_counts(mesh8, ALPHA)
    c1 = np.asarray(ring(starts, weights, jax.random.key(1)))
    c2 = np.asarray(rep(g.indptr, g.indices, g.out_deg, starts, weights,
                        jax.random.key(2)))
    np.testing.assert_allclose(c1.sum(axis=-1), c2.sum(axis=-1), atol=1e-5)
    heavy = (c2 > 0.02) | (c1 > 0.02)
    np.testing.assert_allclose(c1[heavy], c2[heavy], atol=0.06)


def test_csr_partition_roundtrip(got):
    from ppr_tpu.parallel.node_sharded import partition_csr_by_node

    g = got.graph
    ip, idx, prob, other, n_local = partition_csr_by_node(g, 4)
    assert prob is None and other is None
    indptr = np.asarray(g.indptr)
    indices = np.asarray(g.indices)
    for s in range(4):
        for v_l in range(0, n_local, 7):
            v = s * n_local + v_l
            lo_g, hi_g = indptr[v], indptr[v + 1]
            lo_l, hi_l = ip[s, v_l], ip[s, v_l + 1]
            assert hi_l - lo_l == hi_g - lo_g
            np.testing.assert_array_equal(
                idx[s, lo_l:hi_l], indices[lo_g:hi_g]
            )
