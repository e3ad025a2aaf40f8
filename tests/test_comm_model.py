"""Communication model (VERDICT r2 weak item 1): bytes formulas, prediction
structure, and the measured collective-vs-compute breakdown on the virtual
mesh."""

import numpy as np

from ppr_tpu.parallel.comm_model import (
    measure_breakdown,
    predict_sweep,
    psum_bytes_per_sweep,
    ring_bytes_per_sweep,
    two_host_prediction,
)
from ppr_tpu.parallel.sharded import make_mesh


def test_bytes_formulas():
    # 1 shard: no traffic
    assert psum_bytes_per_sweep(1024, 8, 1) == 0
    assert ring_bytes_per_sweep(1024, 8, 1) == 0
    # ring all-reduce: 2(S-1)/S of the full state out of each device
    assert psum_bytes_per_sweep(1024, 8, 2) == 1024 * 8 * 4
    # traffic scales linearly with the batch width
    assert psum_bytes_per_sweep(1024, 16, 4) == 2 * psum_bytes_per_sweep(
        1024, 8, 4
    )
    # node-sharded ring moves (S-1)*n/S*B -> approaches HALF the psum bytes
    p8, r8 = psum_bytes_per_sweep(4096, 8, 8), ring_bytes_per_sweep(4096, 8, 8)
    assert r8 < p8 and abs(r8 / p8 - 0.5) < 0.1


def test_predict_sweep_efficiency_monotone():
    from ppr_tpu.graph.io import synthetic_powerlaw

    g = synthetic_powerlaw(8192, 8, seed=1, dense_threshold=0).graph
    effs = [predict_sweep(g, s_graph=s, batch=512).efficiency
            for s in (1, 2, 4, 8)]
    assert effs[0] == 1.0
    # fixed work + growing collectives -> strong-scaling efficiency decays
    assert all(a >= b for a, b in zip(effs, effs[1:]))


def test_two_host_prediction_fields():
    from ppr_tpu.graph.io import synthetic_powerlaw

    g = synthetic_powerlaw(8192, 8, seed=1, dense_threshold=0).graph
    out = two_host_prediction(g, batch=512)
    assert out["data_parallel_2host"]["efficiency"] == 1.0
    assert 0 < out["graph_parallel_2host"]["efficiency"] <= 1.0
    assert out["two_host_relative_efficiency"] > 0
    assert "assumptions" in out


def test_measure_breakdown_virtual_mesh():
    from ppr_tpu.graph.io import synthetic_powerlaw

    g = synthetic_powerlaw(4096, 6, seed=2, dense_threshold=0).graph
    mesh = make_mesh(8)
    out = measure_breakdown(mesh, g, batch=16, num_sweeps=8, iters=3)
    assert out["t_sweep_full_s"] > 0 and out["t_sweep_local_only_s"] > 0
    assert 0.0 <= out["collective_fraction"] < 1.0
    assert out["platform"] == "cpu"
    assert out["model_psum_bytes"] == psum_bytes_per_sweep(
        g.n_pad, 16 // 4, 2
    )
