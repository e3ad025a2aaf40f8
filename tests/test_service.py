import numpy as np


def test_service_topk(got):
    from ppr_tpu.service import PPRService
    from ppr_tpu.models import AlgoConf

    svc = PPRService.from_dataset(got, alpha=0.15, k=10, seed=5)
    hits = svc.top_k([3, 14], k=10)
    assert len(hits) == 2
    for row in hits:
        assert len(row) >= 1
        scores = [h.score for h in row]
        assert scores == sorted(scores, reverse=True)
        assert all(isinstance(h.name, str) for h in row)

    # agreement with the oracle top-1
    pm = AlgoConf(0.15).set_conf_power_method(got)
    oracle = pm.compute_whole_graph_batch(np.asarray([3, 14]))
    for row, orc in zip(hits, oracle):
        assert row[0].node == int(np.argmax(orc))


def test_service_whole_graph(got):
    from ppr_tpu.service import PPRService

    svc = PPRService.from_dataset(got)
    dense = svc.whole_graph([7])
    assert dense.shape == (1, got.n)
    np.testing.assert_allclose(dense.sum(), 1.0, atol=0.02)
