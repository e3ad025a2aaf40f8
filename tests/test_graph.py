import numpy as np

from ppr_tpu.graph.csr import build_graph, summarize


def test_csr_matches_scipy():
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    n, m = 50, 400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g = build_graph(src, dst, n=n)

    mat = sp.coo_matrix((np.ones(m), (src, dst)), shape=(n, n)).tocsr()
    out_deg = np.asarray(g.out_deg)[:n]
    assert np.array_equal(out_deg, np.bincount(src, minlength=n))
    in_deg = np.asarray(g.in_deg)[:n]
    assert np.array_equal(in_deg, np.bincount(dst, minlength=n))

    # CSR adjacency: the multiset of out-neighbors per node must match scipy
    indptr = np.asarray(g.indptr)
    indices = np.asarray(g.indices)
    for v in range(n):
        mine = sorted(indices[indptr[v]:indptr[v + 1]])
        theirs = sorted(
            np.repeat(
                mat.indices[mat.indptr[v]:mat.indptr[v + 1]],
                mat.data[mat.indptr[v]:mat.indptr[v + 1]].astype(int),
            )
        )
        assert mine == theirs, v


def test_padding_and_masks(tiny):
    g = tiny
    assert g.n_pad % 128 == 0 and g.m_pad % 128 == 0
    assert float(np.asarray(g.node_mask).sum()) == g.n
    assert float(np.asarray(g.edge_mask).sum()) == g.m
    # padded edges point at the sentinel node
    assert np.all(np.asarray(g.edge_src)[g.m:] == g.n_pad - 1)


def test_dense_operator_row_stochastic(tiny):
    dense = np.asarray(tiny.dense_out)
    deg = np.asarray(tiny.out_deg)
    rowsum = dense.sum(axis=1)
    np.testing.assert_allclose(rowsum[deg > 0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(rowsum[deg == 0], 0.0)


def test_got_loads(got):
    s = summarize(got.graph)
    # GOT: 107 nodes / 352 edges (reference dataset/got CSVs, README.md:17-20)
    assert s["n"] in (107,)
    assert s["m"] in (352,)
    assert len(got.names) == s["n"]


def test_summarize(tiny):
    s = summarize(tiny)
    assert s["dangling"] == 1  # only node 4 has out-degree 0
