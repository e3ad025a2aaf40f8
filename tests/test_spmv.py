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
