import jax
import jax.numpy as jnp
import numpy as np

ALPHA = 0.15


def test_weighted_walk_counts_mass_conservation(got):
    from ppr_tpu.ops.walk import weighted_walk_counts

    g = got.graph
    w = 4096
    rng = np.random.default_rng(0)
    starts = jnp.asarray(rng.integers(0, g.n, w), jnp.int32)
    rows = jnp.asarray(rng.integers(0, 4, w), jnp.int32)
    weights = jnp.asarray(rng.random(w).astype(np.float32))
    counts = weighted_walk_counts(
        g, starts, rows, weights, jax.random.key(0), ALPHA, num_rows=4
    )
    assert counts.shape == (4, g.n_pad)
    np.testing.assert_allclose(
        float(counts.sum()), float(weights.sum()), rtol=1e-5
    )
    # per-row mass conservation too
    for r_ in range(4):
        expect = float(weights[np.asarray(rows) == r_].sum())
        np.testing.assert_allclose(float(counts[r_].sum()), expect, rtol=1e-4)


def test_weighted_walk_counts_distribution(got):
    """Compacted walks estimate the same PPR distribution as the oracle."""
    from ppr_tpu.models.power_method import power_method_batch
    from ppr_tpu.ops.walk import weighted_walk_counts

    g = got.graph
    s, w = 7, 200_000
    starts = jnp.full((w,), s, jnp.int32)
    rows = jnp.zeros((w,), jnp.int32)
    weights = jnp.full((w,), 1.0 / w, jnp.float32)
    counts = weighted_walk_counts(
        g, starts, rows, weights, jax.random.key(1), ALPHA, num_rows=1
    )
    oracle = np.asarray(
        power_method_batch(g, jnp.asarray([s], jnp.int32), ALPHA, 100)
    )[0]
    assert np.abs(np.asarray(counts[0]) - oracle).max() < 5e-3


def test_weighted_walk_counts_matches_uncompacted(got):
    """compact_factor=1 path (no compaction) equals plain walks + scatter."""
    from ppr_tpu.ops.walk import random_walks, weighted_walk_counts

    g = got.graph
    w = 1024
    starts = jnp.asarray(np.arange(w) % g.n, jnp.int32)
    rows = jnp.zeros((w,), jnp.int32)
    weights = jnp.ones((w,), jnp.float32)
    key = jax.random.key(3)
    counts = weighted_walk_counts(
        g, starts, rows, weights, key, ALPHA, num_rows=1,
        phase_steps=10_000, compact_factor=1,
    )
    # same key, same phase behaviour (single phase) -> identical trajectory
    stops = random_walks(g, starts, key, ALPHA)
    expect = np.zeros(g.n_pad, np.float32)
    np.add.at(expect, np.asarray(stops), 1.0)
    np.testing.assert_allclose(np.asarray(counts[0]), expect)


def test_walk_contrib_chunked_branch(got, monkeypatch):
    """The int32-overflow-safe chunked branch (groups + integer pass
    splits) is unreachable at test scale by default; shrink the budget to
    force it and check the invariant that holds exactly regardless of
    where walks stop: every (row, node) walk population deposits
    om[row, node] * w[row, node] total mass into that same row."""
    import jax.numpy as jnp
    import ppr_tpu.models.fora as fora_mod

    g = got.graph
    rng = np.random.default_rng(3)
    b = 5
    om_np = np.zeros((b, g.n_pad), np.int32)
    nodes = rng.integers(0, g.n, size=(b, 12))
    om_np[np.arange(b)[:, None], nodes] = rng.integers(1, 40, size=(b, 12))
    w_np = np.zeros((b, g.n_pad), np.float32)
    w_np[om_np > 0] = rng.random((om_np > 0).sum(), dtype=np.float32) + 0.5

    om, w = jnp.asarray(om_np), jnp.asarray(w_np)
    key_it = iter(jax.random.split(jax.random.key(0), 512))

    # budget below single-row totals: forces multi-group AND multi-pass
    monkeypatch.setattr(fora_mod, "_WALK_CHUNK_BUDGET", 64)
    chunked = np.asarray(fora_mod._walk_contrib_chunked(
        g, om, w, lambda: next(key_it), 0.15, False
    ))
    want_row_mass = (om_np * w_np).sum(axis=1)
    np.testing.assert_allclose(chunked.sum(axis=1), want_row_mass,
                               rtol=1e-5)
    assert (chunked >= 0).all()

    # sanity: the unchunked path conserves the same row mass
    monkeypatch.setattr(fora_mod, "_WALK_CHUNK_BUDGET", 1 << 28)
    single = np.asarray(fora_mod._walk_contrib_chunked(
        g, om, w, lambda: next(key_it), 0.15, False
    ))
    np.testing.assert_allclose(single.sum(axis=1), want_row_mass, rtol=1e-5)
