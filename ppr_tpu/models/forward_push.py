"""Forward Push algorithm (local push from the source).

Reference: Forward_Push.java — whole-graph variant at :63-142 (queue-driven
residue/reserve updates gated by r(v)/d_out(v) >= rmax) and the resumable
top-k variant at :144-250 (reused by FORA top-k). Parameter: ``rmax``.

TPU design: the queue becomes the frontier-masked synchronous sweep kernel
(:func:`ppr_tpu.ops.push.forward_push_sweeps`), batched over sources. The
whole-graph fixpoint (no node above the gate; dangling residue returned to
the source) matches the reference's invariants; top-k is the whole-graph
result thresholded with ties, exactly as Forward_Push.computeTopKPPR
(:389-394) simply delegates to the whole-graph computation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.push import (
    apply_dangling_source_shortcircuit,
    forward_push_init,
    forward_push_sweeps,
)
from .base import PPRAlgorithm, PreprocessingMixin


class ForwardPush(PreprocessingMixin, PPRAlgorithm):
    name = "Forward-Push"
    prep_dirname = "FWP_ppr_results"

    _last_residue = None
    _last_residue_dev = None

    def compute_whole_graph_batch(self, sources: np.ndarray, param) -> np.ndarray:
        p = self.compute_whole_graph_device(sources, param)
        self._last_residue = np.asarray(self._last_residue_dev)
        return np.asarray(p)

    def compute_whole_graph_device(self, sources: np.ndarray, param):
        """Device-resident reserve (preprocessing compaction consumers skip
        the dense host copy)."""
        rmax = float(param)
        sources_j = jnp.asarray(sources, jnp.int32)
        p, r, src_onehot = forward_push_init(self.graph, sources_j)
        p, r, _ = forward_push_sweeps(
            self.graph, p, r, src_onehot, jnp.float32(rmax), self.alpha
        )
        p, r = apply_dangling_source_shortcircuit(
            self.graph, sources_j, p, r, src_onehot
        )
        self._last_residue_dev = r
        self._last_residue = None
        return p

    def residue_sum(self) -> np.ndarray:
        """Per-row residue mass after the last push (the reference's
        ``getUpdatedRsum``, Forward_Push.java:252-254)."""
        if self._last_residue is None:
            return np.asarray(jnp.sum(self._last_residue_dev, axis=-1))
        return self._last_residue.sum(axis=-1)
