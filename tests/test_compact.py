"""Device-side threshold compaction (ops/compact.py) == host np.nonzero."""

import numpy as np
import jax.numpy as jnp
import pytest

from ppr_tpu.ops.compact import threshold_nonzeros, _pow2_at_least


def _check(p_np, node_mask_np, threshold, rows=None):
    p = jnp.asarray(p_np)
    nm = jnp.asarray(node_mask_np)
    r, c, v = threshold_nonzeros(p, nm, threshold, rows=rows)
    lim = p_np.shape[0] if rows is None else rows
    want_r, want_c = np.nonzero(
        (p_np[:lim] >= threshold) & (node_mask_np > 0)[None, :]
    )
    order = np.lexsort((c, r))
    np.testing.assert_array_equal(r[order], want_r)
    np.testing.assert_array_equal(c[order], want_c)
    np.testing.assert_allclose(v[order], p_np[want_r, want_c])


def test_pow2_bucket():
    assert _pow2_at_least(1) == 1024
    assert _pow2_at_least(1024) == 1024
    assert _pow2_at_least(1025) == 2048


def test_compact_random():
    rng = np.random.default_rng(0)
    p = rng.random((16, 512), np.float32)
    nm = np.ones(512, np.int32)
    nm[500:] = 0  # padding columns must never be selected
    _check(p, nm, 0.9)


def test_compact_row_limit():
    rng = np.random.default_rng(1)
    p = rng.random((8, 256), np.float32)
    nm = np.ones(256, np.int32)
    _check(p, nm, 0.5, rows=5)


def test_compact_empty():
    p = jnp.zeros((4, 128), jnp.float32)
    r, c, v = threshold_nonzeros(p, jnp.ones(128, jnp.int32), 0.5)
    assert r.size == c.size == v.size == 0


def test_compact_dense_fallback():
    # keep-everything threshold: count*8 >= t*n*4 -> dense host path
    rng = np.random.default_rng(2)
    p = rng.random((8, 256), np.float32) + 1.0
    nm = np.ones(256, np.int32)
    _check(p, nm, 0.5)


def test_base_preprocessing_matches_host_select(got, tmp_path, monkeypatch):
    """BASE preprocessing via device compaction stores the same rows as a
    direct host-side threshold of the dense reserves."""
    from ppr_tpu.models.backward_search import BackwardSearch
    from ppr_tpu.models.base_allpair import BaseAllPair

    monkeypatch.chdir(tmp_path)
    threshold = 1e-3
    algo = BaseAllPair(got, 0.15, target_batch=64)
    algo.preprocessing(threshold, -1, progress=False)

    g = got.graph
    bws = BackwardSearch(g, 0.15, rmax=threshold)
    probe = np.array([0, 7, 50, got.graph.n - 1])
    rows = algo.compute_whole_graph_batch(probe)
    # oracle: dense reserves of ALL targets, host-thresholded, transposed
    dense = np.concatenate(
        [bws.whole_graph(np.arange(s, min(s + 64, g.n)))
         for s in range(0, g.n, 64)]
    )[:, : g.n]
    for i, s in enumerate(probe):
        keep = np.nonzero(dense[:, s] >= threshold)[0]
        np.testing.assert_array_equal(np.nonzero(rows[i][: g.n])[0], keep)
        np.testing.assert_allclose(rows[i][keep], dense[keep, s])
