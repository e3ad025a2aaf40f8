"""Accuracy metrics — faithful ports of the reference's error definitions.

Reference: Gen_Util.computeError (Gen_Util.java:259-326). All three metrics
compare an algorithm's output against the Power-Method ground truth and are
host-side numpy (they run once per query, never in the hot path).

Quirks preserved exactly:

* **Precision@k** (Gen_Util.java:271-279): numerator counts algorithm top-k
  ids found in the ground-truth top-k set; the denominator is the *ground
  truth set size* — which may exceed k due to ties or be below k on tiny
  supports — not k itself.
* **NDCG@k** (Gen_Util.java:280-300): gain 2^pi - 1 with the ground-truth
  ranking as the ideal Z_k; the DCG sum runs over the algorithm's (possibly
  tie-extended) list using *ground-truth* ppr values, 0 when the node is not
  in the ground-truth top-k map.
* **MaxAbsErr** (Gen_Util.java:306-321): maximum |est - exact| over the
  *ground-truth support only*; algorithm estimates for nodes outside the
  oracle support are ignored, and missing estimates count as 0.
"""

from __future__ import annotations

import numpy as np


def precision_at_k(algo_ids: np.ndarray, gnd_ids: np.ndarray) -> float:
    """|algo top-k ∩ gnd top-k| / |gnd top-k| (Gen_Util.java:271-279)."""
    if gnd_ids.size == 0:
        return 0.0
    gnd = set(int(i) for i in gnd_ids)
    correct = sum(1 for i in algo_ids if int(i) in gnd)
    return correct / float(len(gnd))


def ndcg_at_k(
    algo_ids: np.ndarray,
    gnd_ids: np.ndarray,
    gnd_values: np.ndarray,
) -> float:
    """NDCG with gain 2^ppr - 1 against the oracle ranking (Gen_Util.java:280-300).

    ``gnd_values`` is the dense ground-truth ppr vector (indexable by node
    id); gains for algorithm picks outside the oracle top-k set are 0, as in
    the reference where the lookup into the oracle's top-k map returns null.
    """
    if gnd_ids.size == 0:
        return 0.0
    log2 = np.log(2.0)
    gnd_set = set(int(i) for i in gnd_ids)

    zk = 0.0
    for i, node in enumerate(gnd_ids, start=1):
        zk += (2.0 ** float(gnd_values[int(node)]) - 1.0) / np.log(i + 1.0) / log2

    dcg = 0.0
    for i, node in enumerate(algo_ids, start=1):
        v = float(gnd_values[int(node)]) if int(node) in gnd_set else 0.0
        dcg += (2.0 ** v - 1.0) / np.log(i + 1.0) / log2

    return dcg / zk if zk > 0 else 0.0


def max_abs_err(
    algo_values: np.ndarray,
    gnd_values: np.ndarray,
    gnd_support: np.ndarray | None = None,
) -> float:
    """max |est - exact| over the oracle support (Gen_Util.java:306-321)."""
    gnd_values = np.asarray(gnd_values, np.float64)
    algo_values = np.asarray(algo_values, np.float64)
    if gnd_support is None:
        gnd_support = gnd_values > 0.0
    diff = np.abs(algo_values - gnd_values)
    masked = np.where(gnd_support, diff, 0.0)
    return float(masked.max()) if masked.size else 0.0
