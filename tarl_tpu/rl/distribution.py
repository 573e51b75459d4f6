"""Graph action distribution: one outgoing edge per source node, jointly.

Functional JAX re-design of the reference's ``GraphDistribution``
(reinforcement_learning.py:15-96), a ``torch.distributions.Distribution``
over multi-hot edge vectors that activate exactly one outgoing edge per node.
The reference materializes segment-sorted cumulative sums for inverse-CDF
sampling (rl.py:62-80); per-segment categorical sampling is equivalent in
distribution and maps directly onto the Gumbel-max segment ops
(:mod:`tarl_tpu.ops.segment`), so sampling is one fused gather/reduce with no
sort.

All methods operate on unbatched ``logits[E]``; use ``jax.vmap`` for batches
(the reference hand-rolls 3-D batching with offset edge indices,
mpnn_agent.py:138-165 — under vmap that machinery disappears).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.segment import (
    segment_argmax,
    segment_log_softmax,
    segment_sample,
    segment_softmax,
    segment_sum,
)


class GraphDistribution(NamedTuple):
    """Distribution over multi-hot edge actions grouped by source node.

    Attributes
    ----------
    logits: float32[E] — per-edge scores.
    edge_src: int32[E] — source node of each edge (the grouping key,
        the reference's ``edge_index[0]``).
    num_nodes: int — static segment count.
    temperature: float — logit scale (rl.py:25).
    """

    logits: jnp.ndarray
    edge_src: jnp.ndarray
    num_nodes: int
    temperature: float = 1.0

    @property
    def _scaled(self) -> jnp.ndarray:
        return self.logits / self.temperature

    def probs(self) -> jnp.ndarray:
        """Per-edge probability within its source-node group
        (scatter_softmax, rl.py:25)."""
        return segment_softmax(self._scaled, self.edge_src, self.num_nodes)

    def log_probs(self) -> jnp.ndarray:
        return segment_log_softmax(self._scaled, self.edge_src, self.num_nodes)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        """Multi-hot bool[E]: one edge per node that has outgoing edges."""
        e = self.logits.shape[0]
        chosen = segment_sample(key, self._scaled, self.edge_src, self.num_nodes)
        hot = jnp.zeros((e,), bool)
        return hot.at[jnp.minimum(chosen, e)].set(True, mode="drop")

    def mode(self) -> jnp.ndarray:
        """Deterministic multi-hot: per-group argmax (rl.py:44-59)."""
        e = self.logits.shape[0]
        best = segment_argmax(self._scaled, self.edge_src, self.num_nodes)
        hot = jnp.zeros((e,), bool)
        return hot.at[jnp.minimum(best, e)].set(True, mode="drop")

    def log_prob(self, action: jnp.ndarray) -> jnp.ndarray:
        """Joint log-probability of a multi-hot action.

        Invalid actions — any group with outgoing edges whose activation
        count is not exactly one — score ``-inf`` (rl.py:82-93).
        """
        act = action.astype(jnp.float32)
        lp = self.log_probs()
        per_group = segment_sum(act, self.edge_src, self.num_nodes)
        group_sizes = segment_sum(
            jnp.ones_like(act), self.edge_src, self.num_nodes
        )
        valid = jnp.all(
            jnp.where(group_sizes > 0, per_group == 1.0, per_group == 0.0)
        )
        # Mask by activation, not finiteness: a chosen zero-probability edge
        # must drive the joint log-prob to -inf (0 * -inf would be NaN).
        total = jnp.sum(jnp.where(act > 0, lp, 0.0))
        return jnp.where(valid, total, -jnp.inf)

    def entropy(self) -> jnp.ndarray:
        """Sum of per-group categorical entropies (rl.py:95-96)."""
        p = self.probs()
        lp = self.log_probs()
        contrib = jnp.where(p > 0, -p * lp, 0.0)
        return jnp.sum(contrib)
