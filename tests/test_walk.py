import numpy as np
import jax
import jax.numpy as jnp

ALPHA = 0.15


def test_walk_stop_distribution_matches_ppr(got):
    """MC estimate converges to the power-method oracle (same dangling-to-
    source model: walks reset to start at dangling nodes)."""
    from ppr_tpu.models.power_method import power_method_batch
    from ppr_tpu.ops.walk import random_walks

    g = got.graph
    s = 7
    w = 200_000
    starts = jnp.full((w,), s, jnp.int32)
    stops = random_walks(g, starts, jax.random.key(0), ALPHA)
    counts = np.bincount(np.asarray(stops), minlength=g.n_pad) / w

    oracle = np.asarray(
        power_method_batch(g, jnp.asarray([s], jnp.int32), ALPHA, 100)
    )[0]
    assert np.abs(counts - oracle).max() < 5e-3


def test_dangling_start_returns_start(tiny):
    from ppr_tpu.ops.walk import random_walks

    # node 4 is dangling: every walk must stop at 4 (Monte_Carlo.java:70-72)
    starts = jnp.full((256,), 4, jnp.int32)
    stops = random_walks(tiny, starts, jax.random.key(1), ALPHA)
    assert np.all(np.asarray(stops) == 4)


def test_no_zero_hop_never_stops_at_step_zero():
    """On a 2-cycle with no self loops, a no-zero-hop walk from 0 can stop at
    0 only after >= 2 hops; the zero-hop share must be missing relative to
    plain walks: P_plain(stop=start at hop 0) = alpha."""
    from ppr_tpu.graph.csr import build_graph
    from ppr_tpu.ops.walk import random_walks

    g = build_graph(np.array([0, 1]), np.array([1, 0]), n=2)
    w = 100_000
    starts = jnp.zeros((w,), jnp.int32)
    plain = np.asarray(random_walks(g, starts, jax.random.key(2), ALPHA))
    nzh = np.asarray(
        random_walks(g, starts, jax.random.key(3), ALPHA, no_zero_hop=True)
    )
    # plain: P(stop at 0) = alpha + (1-alpha)^2*alpha + ... = alpha/(1-(1-alpha)^2)
    p_plain = ALPHA / (1 - (1 - ALPHA) ** 2)
    # no-zero-hop: first hop forced to 1 -> stop at 0 requires even hops >= 2
    p_nzh = (1 - ALPHA) * ALPHA / (1 - (1 - ALPHA) ** 2) * (1 - ALPHA)
    # derive: after forced hop at node 1, stop at 1 w.p. alpha etc.; check 0-share
    assert abs((plain == 0).mean() - p_plain) < 5e-3
    assert (nzh == 0).mean() < (plain == 0).mean() - 0.05


def test_expand_walkers():
    from ppr_tpu.ops.walk import expand_walkers

    om = jnp.asarray([2, 0, 3, 1], jnp.int32)
    starts, valid = expand_walkers(om, 8)
    starts = np.asarray(starts)[np.asarray(valid)]
    assert np.array_equal(np.sort(starts), [0, 0, 2, 2, 2, 3])


def test_walk_determinism(got):
    from ppr_tpu.ops.walk import random_walks

    g = got.graph
    starts = jnp.arange(64, dtype=jnp.int32) % g.n
    a = np.asarray(random_walks(g, starts, jax.random.key(9), ALPHA))
    b = np.asarray(random_walks(g, starts, jax.random.key(9), ALPHA))
    assert np.array_equal(a, b)
