import numpy as np
import pytest

from ppr_tpu.native import build_csr_native, get_lib, parse_edge_list_native


needs_native = pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")


@needs_native
def test_native_csr_matches_numpy():
    rng = np.random.default_rng(5)
    n, m, n_pad = 100, 700, 128
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    indptr, indices, sorted_src, out_deg, in_deg = build_csr_native(
        src, dst, n, n_pad
    )
    assert np.array_equal(out_deg[:n], np.bincount(src, minlength=n))
    assert np.array_equal(in_deg[:n], np.bincount(dst, minlength=n))
    order = np.argsort(src, kind="stable")
    assert np.array_equal(indices, dst[order])
    assert np.array_equal(sorted_src, src[order])
    assert indptr[-1] == m


@needs_native
def test_native_out_of_range_raises():
    with pytest.raises(ValueError):
        build_csr_native(np.array([5]), np.array([0]), n=3, n_pad=8)


@needs_native
def test_native_edge_list_parse(tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text("# comment\n0 1\n1 2\n\n2 0\n")
    src, dst = parse_edge_list_native(str(p), 16)
    assert list(src) == [0, 1, 2]
    assert list(dst) == [1, 2, 0]


def test_edge_list_loader_roundtrip(tmp_path):
    from ppr_tpu.graph.io import load_edge_list

    p = tmp_path / "snap.txt"
    p.write_text("# snap style\n10 20\n20 30\n30 10\n10 30\n")
    ds = load_edge_list(str(p))
    assert ds.graph.n == 3
    assert ds.graph.m == 4
    assert ds.names == ["10", "20", "30"]
    # first-appearance remap: 10->0, 20->1, 30->2
    assert np.asarray(ds.graph.out_deg)[0] == 2


@needs_native
def test_native_alias_matches_python():
    import numpy as np

    from ppr_tpu.graph.csr import build_graph
    from ppr_tpu.ops.walk import _uniform_neighbor
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(31)
    n, m = 80, 900
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m) + 0.05
    g = build_graph(src, dst, n=n, weights=w)  # native alias path

    # sampling distribution from one high-degree node matches the weights
    deg = np.asarray(g.out_deg)
    v = int(np.argmax(deg[:n]))
    W = 100_000
    k1, k2 = jax.random.split(jax.random.key(2))
    u = jax.random.uniform(k1, (W,))
    u2 = jax.random.uniform(k2, (W,))
    nxt = np.asarray(
        _uniform_neighbor(g, jnp.full((W,), v, jnp.int32), u,
                          jnp.full((W,), v, jnp.int32), u2)
    )
    wsum = np.zeros(n)
    np.add.at(wsum, src, w)
    expect = np.zeros(n)
    for s, d, ww in zip(src, dst, w):
        if s == v:
            expect[d] += ww / wsum[v]
    counts = np.bincount(nxt, minlength=g.n_pad)[:n] / W
    np.testing.assert_allclose(counts, expect, atol=0.012)
