import numpy as np
import jax.numpy as jnp

from tests.conftest import exact_ppr_dangling_to_source

ALPHA = 0.15


def _run_forward(g, sources, rmax, alpha=ALPHA):
    from ppr_tpu.ops.push import (
        apply_dangling_source_shortcircuit,
        forward_push_init,
        forward_push_sweeps,
    )

    sources_j = jnp.asarray(sources, jnp.int32)
    p, r, onehot = forward_push_init(g, sources_j)
    p, r, sweeps = forward_push_sweeps(g, p, r, onehot, jnp.float32(rmax), alpha)
    p, r = apply_dangling_source_shortcircuit(g, sources_j, p, r, onehot)
    return np.asarray(p), np.asarray(r), int(sweeps)


def test_mass_conservation(tiny):
    p, r, _ = _run_forward(tiny, [0, 1, 2, 3, 5], rmax=1e-4)
    np.testing.assert_allclose((p + r).sum(axis=-1), 1.0, atol=1e-5)


def test_fixpoint_invariant(tiny):
    rmax = 1e-4
    p, r, _ = _run_forward(tiny, [0, 1, 2], rmax=rmax)
    deg = np.asarray(tiny.out_deg)
    # no non-dangling node remains above the gate; dangling residue fully drained
    ratios = r[:, deg > 0] / np.maximum(deg[deg > 0], 1)
    assert (ratios < rmax + 1e-9).all()
    assert (r[:, (deg == 0)] <= 1e-9).all()


def test_forward_push_converges_to_exact(tiny):
    src_np = np.array([0, 0, 1, 2, 3, 5])
    dst_np = np.array([1, 2, 2, 0, 0, 5])
    p, r, _ = _run_forward(tiny, [0, 3], rmax=1e-8)
    for row, s in enumerate([0, 3]):
        expected = exact_ppr_dangling_to_source(src_np, dst_np, 6, s, ALPHA, iters=2000)
        np.testing.assert_allclose(p[row, :6], expected, atol=1e-4)


def test_dangling_source_shortcircuit(tiny):
    # node 4 has out-degree 0 -> reserve = e_4 (Forward_Push.java:70-74)
    p, r, _ = _run_forward(tiny, [4], rmax=1e-3)
    assert p[0, 4] == 1.0
    assert p[0].sum() == 1.0
    assert r.sum() == 0.0


def test_push_error_bound_vs_oracle(got):
    """Forward push theory: |pi_hat - pi| <= rmax * d_out bound proxy; check
    tight rmax gives tight max error on GOT."""
    from ppr_tpu.models.power_method import power_method_batch

    g = got.graph
    sources = np.array([3, 14, 50])
    p, _, _ = _run_forward(g, sources, rmax=1e-7)
    oracle = np.asarray(
        power_method_batch(g, jnp.asarray(sources, jnp.int32), ALPHA, 100)
    )
    assert np.abs(p - oracle).max() < 1e-4


def test_incremental_push_matches_fresh(got):
    """Pushing at rmax1 then continuing at rmax2 == pushing fresh at rmax2 on
    the reserve fixpoint (resumable top-k semantics, Forward_Push.java:144-250)."""
    from ppr_tpu.ops.push import forward_push_init, forward_push_sweeps

    g = got.graph
    sources_j = jnp.asarray([5], jnp.int32)
    p0, r0, onehot = forward_push_init(g, sources_j)

    pa, ra, _ = forward_push_sweeps(g, p0, r0, onehot, jnp.float32(1e-3), ALPHA)
    pa2, ra2, _ = forward_push_sweeps(g, pa, ra, onehot, jnp.float32(1e-6), ALPHA)

    pb, rb, _ = forward_push_sweeps(g, p0, r0, onehot, jnp.float32(1e-6), ALPHA)
    # fixpoints can differ microscopically by sweep order; compare via oracle gap
    np.testing.assert_allclose(
        np.asarray(pa2 + ra2).sum(), np.asarray(pb + rb).sum(), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(pa2), np.asarray(pb), atol=1e-4)


def _exact_ppr_mass_dies(src_np, dst_np, n, source, alpha, iters=2000):
    """Plain PPR where dangling mass is lost — the probability model implied
    by the reference's Backward_Search (no dangling correction exists on the
    reverse-push path, Backward_Search.java:73-96, unlike the forward
    algorithms which return dangling mass to the source)."""
    P = np.zeros((n, n))
    deg = np.bincount(src_np, minlength=n)
    for s, d in zip(src_np, dst_np):
        P[s, d] += 1.0 / deg[s]
    p = np.zeros(n)
    r = np.zeros(n)
    r[source] = 1.0
    for _ in range(iters):
        p += alpha * r
        r = ((1 - alpha) * r) @ P
    return p


def test_backward_search_column_of_plain_ppr(got):
    """Backward push from target t estimates pi(v, t) for all v under the
    mass-dies-at-dangling model: compare the t-column against a numpy oracle."""
    from ppr_tpu.models.backward_search import BackwardSearch

    g = got.graph
    src_np = np.asarray(g.edge_src)[: g.m]
    dst_np = np.asarray(g.edge_dst)[: g.m]
    targets = np.array([2, 9, 33])
    bws = BackwardSearch(g, ALPHA, rmax=1e-7)
    reserve = bws.whole_graph(targets)       # [T, n_pad]: pi(v, t) at [t_row, v]

    oracle = np.stack(
        [_exact_ppr_mass_dies(src_np, dst_np, g.n, s, ALPHA, iters=300)
         for s in range(g.n)]
    )  # oracle[s, v] = pi(s, v)
    for row, t in enumerate(targets):
        np.testing.assert_allclose(reserve[row, : g.n], oracle[:, t], atol=1e-4)


def test_backward_zero_indeg_shortcircuit():
    from ppr_tpu.graph.csr import build_graph
    from ppr_tpu.models.backward_search import BackwardSearch

    # node 3 has no in-edges
    g = build_graph(np.array([3, 0, 1]), np.array([0, 1, 0]), n=4)
    reserve = BackwardSearch(g, ALPHA, rmax=1e-6).whole_graph(np.array([3]))
    assert reserve[0, 3] == 1.0
    assert reserve[0].sum() == 1.0
