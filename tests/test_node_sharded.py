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
