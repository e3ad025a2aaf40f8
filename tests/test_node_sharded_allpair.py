"""Node-sharded backward search == single-device / edge-sharded engines,
with O(n/S) per-device state (completes the node-sharded family)."""

import numpy as np
import pytest

from ppr_tpu.models.backward_search import BackwardSearch
from ppr_tpu.parallel.sharded import make_mesh
from ppr_tpu.parallel.node_sharded_allpair import (
    NodeShardedBackwardSearch,
    node_sharded_base_allpair,
)

RMAX = 1e-3


def test_node_sharded_backward_matches_single(got):
    mesh = make_mesh(8)                      # (data=4, graph=2)
    rng = np.random.default_rng(0)
    targets = rng.integers(0, got.graph.n, size=8).astype(np.int32)
    single = BackwardSearch(got.graph, 0.15, rmax=RMAX)
    ns = NodeShardedBackwardSearch(got.graph, 0.15, rmax=RMAX, mesh=mesh)
    np.testing.assert_allclose(
        ns.whole_graph(targets), single.whole_graph(targets),
        atol=5e-6, rtol=1e-4,
    )
    assert ns.get_duration() > 0


def test_node_sharded_backward_state_o_n_over_s():
    from ppr_tpu.graph.io import synthetic_powerlaw

    ds = synthetic_powerlaw(2048, 8, seed=5, dense_threshold=0)
    mesh = make_mesh(8, data=2, graph=4)
    ns = NodeShardedBackwardSearch(ds.graph, 0.15, rmax=RMAX, mesh=mesh)
    out = ns.whole_graph_device(np.arange(8, dtype=np.int32))
    n_pad = ds.graph.n_pad
    assert out.shape == (8, n_pad)
    for shard in out.addressable_shards:
        assert shard.data.shape == (8 // 2, n_pad // 4)
    # the reverse-push edge blocks are node-partitioned too
    for shard in ns._arrays["src"].addressable_shards:
        assert shard.data.shape[0] == 1


def test_node_sharded_backward_zero_indeg_target():
    """pi(t, t) = 1 for an in-degree-0 target (Backward_Search.java:46-49)."""
    from ppr_tpu.graph.csr import build_graph

    # node 3 has no in-edges
    src = np.array([3, 0, 1])
    dst = np.array([0, 1, 2])
    g = build_graph(src, dst, n=4, dense_threshold=0)
    mesh = make_mesh(4, data=2, graph=2)
    ns = NodeShardedBackwardSearch(g, 0.15, rmax=RMAX, mesh=mesh)
    out = ns.whole_graph(np.array([3], np.int32))
    assert out[0, 3] == pytest.approx(1.0)
    assert out[0].sum() == pytest.approx(1.0)


def test_node_sharded_base_allpair_prep(tmp_path):
    """BASE preprocessing through the node-sharded reverse push: same rows
    as the single-device BaseAllPair store."""
    import os

    from ppr_tpu.graph.io import synthetic_powerlaw
    from ppr_tpu.models import AlgoConf, AlgoType

    ds = synthetic_powerlaw(512, 4, seed=7, dense_threshold=0)
    mesh = make_mesh(8, data=2, graph=4)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        single = AlgoConf(0.15).new_algo_obj(AlgoType.BASE_WHOLE_GRAPH,
                                             ds, 10)
        single.prep_dirname = "single_BASE"
        single.preprocessing(1e-3, -1, progress=False)
        ns = node_sharded_base_allpair(ds, 0.15, mesh=mesh)
        ns.prep_dirname = "ns_BASE"
        ns.preprocessing(1e-3, -1, progress=False)
        for s in (0, 17, 301):
            single.read_preprocessed_ppr(s)
            a = single.get_whole_graph_dense()
            ns.read_preprocessed_ppr(s)
            b = ns.get_whole_graph_dense()
            np.testing.assert_allclose(b, a, atol=5e-6, rtol=1e-4)
    finally:
        os.chdir(cwd)
