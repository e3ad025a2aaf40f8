import numpy as np
import pytest

from tests.conftest import exact_ppr_dangling_to_source


@pytest.fixture(scope="module")
def rand_graph():
    rng = np.random.default_rng(3)
    n, m = 40, 200
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    # force node n-1 dangling to exercise the dangling-to-source path
    keep = src != n - 1
    return src[keep], dst[keep], n


def test_power_method_matches_numpy_oracle(rand_graph):
    from ppr_tpu.graph.csr import build_graph
    from ppr_tpu.models.power_method import power_method_batch

    src, dst, n = rand_graph
    g = build_graph(src, dst, n=n)
    alpha = 0.15
    sources = np.array([0, 7, n - 1])
    out = np.asarray(power_method_batch(g, sources.astype(np.int32), alpha, 100))
    for b, s in enumerate(sources):
        expected = exact_ppr_dangling_to_source(src, dst, n, s, alpha, iters=100)
        np.testing.assert_allclose(out[b, :n], expected, atol=2e-6)
        # padded tail stays zero
        assert np.all(out[b, n:] == 0)


def test_power_method_sums_to_one(got):
    from ppr_tpu.models.power_method import PowerMethod

    pm = PowerMethod(got, alpha=0.15)
    res = pm.compute_whole_graph_batch(np.arange(8))
    sums = res.sum(axis=-1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)


def test_power_method_interface_parity(got):
    from ppr_tpu.models.power_method import PowerMethod

    pm = PowerMethod(got, alpha=0.15)
    pm.compute_topk_ppr(3, 10, None)
    ids = pm.get_topk_node_ids(10)
    assert len(ids) >= min(10, len(pm.get_whole_graph_ppr()))
    scores = pm.get_whole_graph_dense()
    vals = scores[ids]
    assert np.all(np.diff(vals) <= 1e-12)  # sorted descending
