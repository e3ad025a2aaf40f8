"""Sharded execution correctness on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ALPHA = 0.15


@pytest.fixture(scope="module")
def mesh8():
    from ppr_tpu.parallel.sharded import make_mesh

    assert len(jax.devices()) >= 8
    return make_mesh(8, data=2, graph=4)


def test_sharded_push_matches_single_device(got, mesh8):
    from ppr_tpu.ops.push import forward_push_init
    from ppr_tpu.ops.spmv import push_out
    from ppr_tpu.parallel.sharded import make_sharded_push_sweeps, shard_graph

    g = got.graph
    gs = shard_graph(g, mesh8)
    sources = jnp.asarray([3, 11, 42, 64], jnp.int32)
    p0, r0, onehot = forward_push_init(g, sources)
    rmax = jnp.float32(1e-3)

    push = make_sharded_push_sweeps(mesh8, ALPHA, num_sweeps=5)
    p_sh, r_sh = push(
        gs.edge_src, gs.edge_dst, gs.edge_mask, gs.out_deg, gs.node_mask,
        p0, r0, onehot, rmax,
    )

    # single-device: apply exactly 5 sweeps of the same body
    from ppr_tpu.ops.push import forward_frontier

    p, r = p0, r0
    is_dangling = (np.asarray(g.out_deg) == 0) & (np.asarray(g.node_mask) > 0)
    for _ in range(5):
        active = np.asarray(forward_frontier(g, r, rmax))
        a = jnp.where(active, r, 0.0)
        p = p + ALPHA * a
        a_dang = jnp.where(jnp.asarray(is_dangling), a, 0.0)
        dang = a_dang.sum(axis=-1, keepdims=True)
        pushed = push_out(g, (1 - ALPHA) * (a - a_dang), backend="coo")
        r = r - a + pushed + (1 - ALPHA) * dang * onehot

    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_sh), np.asarray(r), atol=1e-5)


def test_sharded_walk_counts_mass(got, mesh8):
    from ppr_tpu.parallel.sharded import make_sharded_walk_counts

    g = got.graph
    b, w = 2, 128
    starts = jnp.broadcast_to(
        jnp.asarray([5, 9], jnp.int32)[:, None], (b, w)
    )
    weights = jnp.full((b, w), 1.0 / w, jnp.float32)
    walk = make_sharded_walk_counts(mesh8, ALPHA)
    counts = walk(g.indptr, g.indices, g.out_deg, starts, weights,
                  jax.random.key(0))
    assert counts.shape == (b, g.n_pad)
    np.testing.assert_allclose(np.asarray(counts).sum(axis=-1), 1.0, atol=1e-5)


def test_full_sharded_step_runs(got, mesh8):
    from ppr_tpu.parallel.sharded import sharded_fora_step

    step, example = sharded_fora_step(mesh8, got.graph, ALPHA)
    p, r = step(*example)
    p = np.asarray(p)
    assert np.isfinite(p).all()
    # push + alpha*r + walk estimate ~ mass conservation per row
    np.testing.assert_allclose(p.sum(axis=-1), 1.0, atol=0.05)
