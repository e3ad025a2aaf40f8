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
