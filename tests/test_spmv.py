import numpy as np
import jax.numpy as jnp
import pytest

from ppr_tpu.graph.csr import build_graph
from ppr_tpu.ops.spmv import pull_out_norm, push_out


@pytest.fixture(scope="module")
def g():
    rng = np.random.default_rng(11)
    n, m = 300, 3000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    return build_graph(src, dst, n=n)  # small enough for dense operator


@pytest.fixture(scope="module")
def a(g):
    rng = np.random.default_rng(12)
    x = rng.random((4, g.n_pad)).astype(np.float32)
    x *= np.asarray(g.node_mask)  # padding nodes carry no mass
    return jnp.asarray(x)


def test_push_out_backends_agree(g, a):
    dense = np.asarray(push_out(g, a, backend="dense"))
    coo = np.asarray(push_out(g, a, backend="coo"))
    srt = np.asarray(push_out(g, a, backend="coo_sorted"))
    np.testing.assert_allclose(coo, dense, atol=1e-4)
    np.testing.assert_allclose(srt, dense, atol=1e-4)


def test_pull_out_norm_backends_agree(g, a):
    dense = np.asarray(pull_out_norm(g, a, backend="dense"))
    coo = np.asarray(pull_out_norm(g, a, backend="coo"))
    srt = np.asarray(pull_out_norm(g, a, backend="coo_sorted"))
    np.testing.assert_allclose(coo, dense, atol=1e-4)
    np.testing.assert_allclose(srt, dense, atol=1e-4)


def test_push_out_1d(g, a):
    one = np.asarray(push_out(g, a[0], backend="coo_sorted"))
    np.testing.assert_allclose(
        one, np.asarray(push_out(g, a, backend="dense"))[0], atol=1e-4
    )


def test_sentinel_is_padding(g):
    # n+1 rounding guarantees the sentinel node is never a real node
    assert g.n < g.n_pad
    assert np.asarray(g.node_mask)[g.n_pad - 1] == 0.0


def test_push_out_chunked_matches(g, a):
    from ppr_tpu.ops.spmv import push_out_chunked

    dense = np.asarray(push_out(g, a, backend="dense"))
    for nc in (1, 3, 16):
        chunked = np.asarray(push_out_chunked(g, a, num_chunks=nc))
        np.testing.assert_allclose(chunked, dense, atol=1e-4)
    one = np.asarray(push_out_chunked(g, a[0], num_chunks=4))
    np.testing.assert_allclose(one, dense[0], atol=1e-4)


def test_push_out_chunked_t_matches(got):
    from ppr_tpu.graph.csr import build_graph
    from ppr_tpu.ops.spmv import push_out, push_out_chunked_t

    rng = np.random.default_rng(21)
    n, m = 300, 4000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g = build_graph(src, dst, n=n, dense_threshold=0)
    a = np.zeros((5, g.n_pad), np.float32)
    a[:, :n] = rng.random((5, n))
    ref = np.asarray(push_out(g, jnp.asarray(a), backend="coo"))
    for chunks in (1, 3, 7):
        out_t = np.asarray(
            push_out_chunked_t(g, jnp.asarray(a.T), num_chunks=chunks)
        )
        np.testing.assert_allclose(out_t.T, ref, atol=1e-4)
    # weighted
    w = rng.random(m) + 0.1
    gw = build_graph(src, dst, n=n, weights=w, dense_threshold=0)
    refw = np.asarray(push_out(gw, jnp.asarray(a), backend="coo_sorted"))
    outw = np.asarray(
        push_out_chunked_t(gw, jnp.asarray(a.T), num_chunks=4)
    )
    np.testing.assert_allclose(outw.T, refw, atol=1e-4)


def test_fora_topk_chunked_matches(got):
    from ppr_tpu.models import AlgoConf

    sources = np.arange(0, got.n, 13)
    ref_algo = AlgoConf(0.15, seed=3).set_conf_fora_topk(got, 10)
    ref_algo.completion = "spmv"
    ref = ref_algo.compute_topk_batch(sources, 10, 0.5)

    chunked = AlgoConf(0.15, seed=3).set_conf_fora_topk(got, 10)
    chunked.completion = "spmv"
    chunked.spmv_intermediate_budget = 1024  # force many chunks
    assert chunked._num_chunks(len(sources)) > 1
    out = chunked.compute_topk_batch(sources, 10, 0.5)
    np.testing.assert_allclose(out, ref, atol=1e-5)
