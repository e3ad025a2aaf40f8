"""Reference semantic quirks, verified one by one (SURVEY.md §7 'hard parts').

Each test pins one behavior that changes answers and is deliberately
preserved from the Java reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppr_tpu.graph.csr import build_graph

ALPHA = 0.15


@pytest.fixture(scope="module")
def dangling_graph():
    # 0 -> 1 -> 2, 2 dangling; 3 -> 0
    return build_graph(np.array([0, 1, 3]), np.array([1, 2, 0]), n=4)


def test_power_method_dangling_mass_returns_to_source(dangling_graph):
    """Power_Method.java:74-80: dangling residue goes to the *source*, not
    uniform teleport — pi(0, 0) is inflated by the restart loop."""
    from ppr_tpu.models.power_method import power_method_batch

    p = np.asarray(
        power_method_batch(dangling_graph, jnp.asarray([0], jnp.int32),
                           ALPHA, 200)
    )[0]
    # plain PPR (mass dies at 2) would give pi(0,0) = alpha; restart makes
    # it strictly larger
    assert p[0] > ALPHA + 0.01
    np.testing.assert_allclose(p[:4].sum(), 1.0, atol=1e-5)


def test_walks_restart_at_start_on_dangling(dangling_graph):
    """Monte_Carlo.java:87-90: a walk reaching a dangling node resets to its
    start node and continues (it does not die or stop there)."""
    from ppr_tpu.ops.walk import random_walks

    starts = jnp.zeros((20000,), jnp.int32)
    stops = np.asarray(
        random_walks(dangling_graph, starts, jax.random.key(0), ALPHA)
    )
    # node 3 is unreachable from 0; nodes 0,1,2 all reachable incl. restarts
    assert set(np.unique(stops)) == {0, 1, 2}
    # stop distribution matches the dangling-to-source oracle
    from ppr_tpu.models.power_method import power_method_batch

    oracle = np.asarray(
        power_method_batch(dangling_graph, jnp.asarray([0], jnp.int32),
                           ALPHA, 200)
    )[0]
    counts = np.bincount(stops, minlength=4)[:4] / len(stops)
    np.testing.assert_allclose(counts, oracle[:4], atol=0.02)


def test_backward_search_mass_dies_at_dangling(dangling_graph):
    """Backward_Search.java:73-96 has no dangling correction: the t-column
    estimate equals plain PPR where mass dies, NOT the forward oracle."""
    from ppr_tpu.models.backward_search import BackwardSearch

    reserve = BackwardSearch(dangling_graph, ALPHA, 1e-8).whole_graph(
        np.array([0])
    )[0]
    # pi(0, 0) under the mass-dies model: only alpha at hop 0 from source 0
    # (no cycle back to 0 except via 3 which nothing reaches)
    np.testing.assert_allclose(reserve[0], ALPHA, atol=1e-4)


def test_forward_push_dangling_source_shortcircuit(dangling_graph):
    """Forward_Push.java:70-74: out-degree-0 source => reserve = e_s."""
    from ppr_tpu.models.forward_push import ForwardPush
    from ppr_tpu.graph.io import Dataset

    ds = Dataset(graph=dangling_graph, names=list("abcd"), name="tiny")
    fp = ForwardPush(ds, ALPHA)
    p = fp.compute_whole_graph_batch(np.array([2]), 1e-6)[0]
    assert p[2] == 1.0 and p.sum() == 1.0


def test_topk_tie_semantics_and_precision_denominator():
    """Algo_Util.kth_ppr + Gen_Util.java:278: top-k set includes ties beyond
    k; precision divides by the GND set size, not k."""
    from ppr_tpu.ops.topk import topk_ids_with_ties
    from ppr_tpu.utils.metrics import precision_at_k

    gnd = np.array([0.5, 0.2, 0.2, 0.2, 0.0])
    gnd_ids = topk_ids_with_ties(gnd, 2)
    assert len(gnd_ids) == 4  # 1 + 3 tied
    algo_ids = np.array([0, 1])
    assert precision_at_k(algo_ids, gnd_ids) == 2 / 4


def test_fora_walk_variants_differ(got):
    """Fora_Whole_Graph.java:134 uses no-zero-hop walks; Fora_Topk.java:162
    uses plain walks — the distinction is observable at the walk level."""
    from ppr_tpu.ops.walk import random_walks

    g = got.graph
    # pick a source with out-edges
    deg = np.asarray(g.out_deg)
    s = int(np.nonzero(deg > 0)[0][0])
    starts = jnp.full((50000,), s, jnp.int32)
    plain = np.asarray(random_walks(g, starts, jax.random.key(1), ALPHA))
    nzh = np.asarray(
        random_walks(g, starts, jax.random.key(2), ALPHA, no_zero_hop=True)
    )
    frac_plain = (plain == s).mean()
    frac_nzh = (nzh == s).mean()
    # plain walks stop at the start with >= alpha probability; forced first
    # hop removes that zero-hop mass
    assert frac_plain >= ALPHA - 0.01
    assert frac_nzh < frac_plain - 0.05


def test_backward_zero_indegree_target_is_one():
    """Backward_Search.java:46-49: in-degree-0 target => pi(t,t) = 1.0
    (the reference's quirk — not alpha)."""
    from ppr_tpu.models.backward_search import BackwardSearch

    g = build_graph(np.array([0]), np.array([1]), n=3)
    reserve = BackwardSearch(g, ALPHA, 1e-6).whole_graph(np.array([0]))[0]
    assert reserve[0] == 1.0


def test_neo4j_damping_is_one_minus_alpha(got):
    """Neo4j_Method.java:75: library damping = 1 - alpha; normalization to
    sum 1 and zero-dropping (buildPPRMap :80-99)."""
    from ppr_tpu.models import AlgoConf

    nm = AlgoConf(ALPHA).set_conf_neo4j_method(got)
    nm.compute_whole_graph_ppr(3, 100)
    res = nm.get_whole_graph_ppr()
    assert all(v > 0 for v in res.values())  # zeros dropped
    np.testing.assert_allclose(sum(res.values()), 1.0, atol=1e-4)
