import numpy as np


def test_phase_timer():
    import jax.numpy as jnp

    from ppr_tpu.utils.timer import PhaseTimer

    t = PhaseTimer()
    x = jnp.ones((64,))
    with t.phase("push", block_on=x):
        y = x * 2
    with t.phase("push", block_on=y):
        _ = y + 1
    assert t.counts["push"] == 2
    assert t.ms("push") >= 0
    assert "push" in t.report()


def test_scaling_sweep_runs(got):
    from ppr_tpu.parallel.scaling import scaling_sweep

    res = scaling_sweep(got.graph, device_counts=[1, 2], iters=2,
                        walkers_per_row=64)
    assert len(res) == 2
    assert res[0]["devices"] == 1 and res[1]["devices"] == 2
    for r in res:
        assert r["queries_per_sec"] > 0
        assert np.isfinite(r["efficiency"])


def test_calibrate(got):
    from ppr_tpu.models import AlgoConf
    from ppr_tpu.utils import calibrate

    consts = calibrate.measure(got.graph, walkers=2048, batch=4, reps=1)
    assert consts[0] > 0 and consts[1] > 0
    fora = AlgoConf(0.15).set_conf_fora_whole_graph(got)
    calibrate.apply(fora, consts)
    assert fora.avg_rand_walk_time_ns == consts[0]
