"""Pallas fused dense kernels, validated in interpreter mode on CPU against
the XLA reference implementations."""

import jax.numpy as jnp
import numpy as np

ALPHA = 0.15


def test_fused_power_iterations_match_power_method(got, monkeypatch):
    from ppr_tpu.models.power_method import power_method_batch
    from ppr_tpu.ops.pallas_dense import dense_power_iterations, supports

    monkeypatch.setenv("PPR_TPU_PALLAS", "1")
    g = got.graph
    assert supports(g)
    sources = jnp.asarray([0, 5, 17, 50, 99], jnp.int32)
    onehot = jnp.eye(g.n_pad, dtype=jnp.float32)[sources]
    fused = np.asarray(
        dense_power_iterations(g, onehot, ALPHA, 100, interpret=True)
    )
    ref = np.asarray(power_method_batch(g, sources, ALPHA, 100))
    np.testing.assert_allclose(fused, ref, atol=2e-5)


def test_fused_power_iterations_batch_padding(got):
    from ppr_tpu.ops.pallas_dense import dense_power_iterations

    g = got.graph
    sources = jnp.asarray([3], jnp.int32)  # b=1, padded to the row tile
    onehot = jnp.eye(g.n_pad, dtype=jnp.float32)[sources]
    out = np.asarray(
        dense_power_iterations(g, onehot, ALPHA, 50, interpret=True)
    )
    assert out.shape == (1, g.n_pad)
    # after T iterations the un-settled mass is (1-alpha)^T ~ 3e-4
    np.testing.assert_allclose(out.sum(), 1.0, atol=1e-3)


def test_fused_pagerank_matches_neo4j_method(got):
    from ppr_tpu.models.neo4j_method import personalized_pagerank_batch
    from ppr_tpu.ops.pallas_dense import dense_pagerank_iterations

    g = got.graph
    sources = jnp.asarray([2, 44], jnp.int32)
    onehot = jnp.eye(g.n_pad, dtype=jnp.float32)[sources]
    damping = 1.0 - ALPHA
    fused = np.asarray(
        dense_pagerank_iterations(g, onehot, damping, 40, interpret=True)
    )
    total = fused.sum(axis=-1, keepdims=True)
    fused_norm = np.where(total > 0, fused / total, fused)
    ref = np.asarray(personalized_pagerank_batch(g, sources, damping, 40))
    np.testing.assert_allclose(fused_norm, ref, atol=2e-5)


def test_enabled_gating(monkeypatch):
    from ppr_tpu.ops import pallas_dense

    # env forces win over everything (no subprocess probe)
    monkeypatch.setenv("PPR_TPU_PALLAS", "1")
    assert pallas_dense.enabled() is True
    monkeypatch.setenv("PPR_TPU_PALLAS", "0")
    assert pallas_dense.enabled() is False
    # no env + CPU backend: off without probing
    monkeypatch.delenv("PPR_TPU_PALLAS")
    assert pallas_dense.enabled() is False  # conftest forces the CPU backend
