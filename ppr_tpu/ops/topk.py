"""Top-k selection with the reference's tie semantics.

The reference selects "top-k" as *every node whose ppr >= the k-th largest
value*, so the returned set can exceed k on ties, and when fewer than k
nodes have ppr at all the whole support is returned (quickselect returning
null for invalid k — Algo_Util.kth_ppr, Algo_Util.java:32-53, and the
retrieveTopK pattern, e.g. Forward_Push.java:413-429). Result lists are
sorted by ppr descending (Monte_Carlo.java:258-276 et al.).

Device side, ``jax.lax.top_k`` extracts the k largest over the support;
tie expansion to a variable-size set is a host-side operation
(:func:`topk_ids_with_ties`), since the set size is data-dependent and the
consumers (precision/NDCG metrics, result printing) are host code anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def kth_value(p: jax.Array, k: int) -> jax.Array:
    """k-th largest value of ``p`` along the last axis (no support filtering)."""
    vals, _ = jax.lax.top_k(p, k)
    return vals[..., -1]


def device_top_k(p: jax.Array, k: int):
    """(values, indices) of the k largest entries per row — pure device path."""
    return jax.lax.top_k(p, k)


def topk_ids_with_ties(values: np.ndarray, k: int, *, support=None,
                       tol: float = 0.0) -> np.ndarray:
    """Node ids with value >= k-th largest support value, sorted descending.

    ``values`` is a dense [n] vector; support defaults to ``values > 0``
    (matching the reference where hash-map entries exist only for touched
    nodes). If the support holds fewer than k entries, the entire support is
    returned (kth_ppr == null branch). Ties beyond position k are included.

    ``tol`` > 0 treats values within ``tol`` of the k-th value as tied —
    estimates of an exact oracle tie can split by float noise far below the
    algorithm's eps*delta accuracy bound, and the reference's own precision
    denominator is already tie-aware (Gen_Util.java:271-279).
    """
    values = np.asarray(values)
    if support is None:
        support = values > 0.0
    sup_ids = np.nonzero(support)[0]
    sup_vals = values[sup_ids]
    if sup_ids.size == 0:
        return np.zeros((0,), np.int64)
    if sup_ids.size <= k:
        chosen = sup_ids
    else:
        kth = np.partition(sup_vals, -k)[-k]
        chosen = sup_ids[sup_vals >= kth - tol]
    order = np.argsort(-values[chosen], kind="stable")
    return chosen[order]


def topk_ids_with_ties_from_pairs(vals_row: np.ndarray, ids_row: np.ndarray,
                                  k: int, *, tol: float = 0.0) -> np.ndarray:
    """Tie-expanded top-k over a device-selected (values, ids) row pair
    (descending, length kcap >= k) — same semantics as
    :func:`topk_ids_with_ties` without needing the dense vector (incl. the
    ``tol`` near-tie expansion). Ties extending beyond the kcap window are
    truncated; callers that need exact tie sets detect
    ``vals_row[-1] >= kth - tol`` and fall back to the dense path.
    """
    vals_row = np.asarray(vals_row)
    ids_row = np.asarray(ids_row)
    sup = vals_row > 0.0
    v, i = vals_row[sup], ids_row[sup]
    if v.size <= k:
        return i
    kth = v[k - 1]
    return i[v >= kth - tol]


def kth_ppr(values: np.ndarray, k: int):
    """Host quickselect-parity helper: k-th largest, or None when k is invalid
    (k <= 0 or k > len(values)) — Algo_Util.java:39-53 returns null then."""
    values = np.asarray(values)
    if k <= 0 or k > values.size:
        return None
    return float(np.partition(values, -k)[-k])
