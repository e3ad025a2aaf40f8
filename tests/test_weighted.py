"""Weighted-edge extension: normalized-coef SpMV + alias-table sampling.

Net-new capability beyond the (unweighted) reference; validated against
dense numpy oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppr_tpu.graph.csr import build_graph

ALPHA = 0.15


@pytest.fixture(scope="module")
def wgraph():
    rng = np.random.default_rng(21)
    n, m = 60, 500
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != n - 1          # force one dangling node
    src, dst = src[keep], dst[keep]
    w = rng.random(src.size) * 4 + 0.1
    g = build_graph(src, dst, n=n, weights=w)
    return g, src, dst, w, n


def _weighted_operator(src, dst, w, n):
    P = np.zeros((n, n))
    wsum = np.zeros(n)
    np.add.at(wsum, src, w)
    for s, d, ww in zip(src, dst, w):
        P[s, d] += ww / wsum[s]
    return P


def test_weighted_flag_and_alias_shapes(wgraph):
    g, src, dst, w, n = wgraph
    assert g.weighted
    assert g.alias_prob.shape == (g.m_pad,)
    coef = np.asarray(g.edge_coef)[: g.m]
    # per-source coefficients sum to 1
    sums = np.zeros(g.n_pad)
    np.add.at(sums, np.asarray(g.edge_src)[: g.m], coef)
    deg = np.asarray(g.out_deg)
    np.testing.assert_allclose(sums[: n][deg[:n] > 0], 1.0, atol=1e-5)


@pytest.mark.parametrize("backend", ["dense", "coo", "coo_sorted"])
def test_weighted_push_out(wgraph, backend):
    from ppr_tpu.ops.spmv import push_out

    g, src, dst, w, n = wgraph
    P = _weighted_operator(src, dst, w, n)
    rng = np.random.default_rng(1)
    a = np.zeros((3, g.n_pad), np.float32)
    a[:, :n] = rng.random((3, n))
    out = np.asarray(push_out(g, jnp.asarray(a), backend=backend))
    np.testing.assert_allclose(out[:, :n], a[:, :n] @ P, atol=1e-4)


@pytest.mark.parametrize("backend", ["dense", "coo", "coo_sorted"])
def test_weighted_pull_out(wgraph, backend):
    from ppr_tpu.ops.spmv import pull_out_norm

    g, src, dst, w, n = wgraph
    P = _weighted_operator(src, dst, w, n)
    rng = np.random.default_rng(2)
    a = np.zeros((2, g.n_pad), np.float32)
    a[:, :n] = rng.random((2, n))
    out = np.asarray(pull_out_norm(g, jnp.asarray(a), backend=backend))
    np.testing.assert_allclose(out[:, :n], a[:, :n] @ P.T, atol=1e-4)


def test_weighted_power_method_matches_oracle(wgraph):
    from ppr_tpu.models.power_method import power_method_batch

    g, src, dst, w, n = wgraph
    P = _weighted_operator(src, dst, w, n)
    dangling = np.asarray(g.out_deg)[:n] == 0
    s = 3
    p = np.zeros(n)
    r = np.zeros(n)
    r[s] = 1.0
    for _ in range(100):
        p += ALPHA * r
        rem = (1 - ALPHA) * r
        dm = rem[dangling].sum()
        r = rem @ P
        r[s] += dm
    out = np.asarray(
        power_method_batch(g, jnp.asarray([s], jnp.int32), ALPHA, 100)
    )[0]
    np.testing.assert_allclose(out[:n], p, atol=2e-5)


def test_alias_tables_sample_correct_distribution(wgraph):
    """Single-hop distribution from alias sampling matches edge weights."""
    from ppr_tpu.ops.walk import _uniform_neighbor

    g, src, dst, w, n = wgraph
    deg = np.asarray(g.out_deg)
    v = int(np.argmax(deg[:n]))       # highest-degree node
    W = 200_000
    key = jax.random.key(5)
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (W,))
    u2 = jax.random.uniform(k2, (W,))
    cur = jnp.full((W,), v, jnp.int32)
    nxt = np.asarray(_uniform_neighbor(g, cur, u, cur, u2))

    P = _weighted_operator(src, dst, w, n)
    counts = np.bincount(nxt, minlength=g.n_pad)[:n] / W
    np.testing.assert_allclose(counts, P[v], atol=0.01)


def test_weighted_mc_converges_to_weighted_ppr(wgraph):
    from ppr_tpu.graph.io import Dataset
    from ppr_tpu.models.monte_carlo import MonteCarlo
    from ppr_tpu.models.power_method import power_method_batch

    g, *_ = wgraph
    ds = Dataset(graph=g, names=[str(i) for i in range(g.n)], name="wtest")
    mc = MonteCarlo(ds, ALPHA, seed=4)
    est = mc.compute_whole_graph_batch(np.asarray([3]), 0.3)[0]
    oracle = np.asarray(
        power_method_batch(g, jnp.asarray([3], jnp.int32), ALPHA, 100)
    )[0]
    assert np.abs(est - oracle).max() < 0.02
