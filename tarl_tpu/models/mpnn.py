"""MPNN policy and value networks (Flax).

Re-design of the reference's policy/value stack (src/agents/mpnn_agent.py):

* :class:`MPNNPolicyNet` — per-edge logits over the full edge list.  The
  reference's *live* path gathers a 1-d node embedding at each edge target
  (mpnn_agent.py:195-217); its *intended* richer path (edge MLP over
  endpoint features + edge attributes, mpnn_agent.py:35-41,227-231, and a
  shortest-path-distance prior, mpnn_agent.py:84-113) is commented out.
  Here both are first-class: ``mode="embedding"`` reproduces the live
  minimal path, ``mode="edge_mlp"`` (default) implements the intended
  design, and ``use_distance_prior`` adds ``-dist[target, agent_dest]``
  logits from the on-device Bellman-Ford table.
* :class:`MPNNValueNet` — message-MLP + node-MLP MPNN with a time embedding
  (mpnn_agent.py:267-402).
* :class:`MPNNValueNetSimple` — the variant the reference runner actually
  uses (runner.py:68): occupancy vector concat time -> 3-layer MLP -> scalar
  (mpnn_agent.py:407-450).

Input convention: ``x [N, 16]`` is the per-node context — the 7 observation
columns (rl.observation) concatenated with the FIFO-head agent's 9-column row,
i.e. the ObservationFeatureHelpers layout (feature_helpers.py:74-93).  All
modules are pure and unbatched; batching is ``jax.vmap`` (no 3-D
reshape/edge-offset machinery, cf. mpnn_agent.py:138-165).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.segment import segment_sum

# Column indices into the x[N, 16] context (feature_helpers.py:74-93).
COL_NUMBER_OF_AGENT = 1
COL_ROAD_INDEX = 6
COL_DESTINATION = 8


class MPNNPolicyNet(nn.Module):
    """Edge-logit policy over the dual graph."""

    num_nodes: int
    num_node_embeddings: int  # == num_roads + 1 (ROAD_INDEX -1 -> last slot)
    mode: str = "edge_mlp"    # "edge_mlp" (intended) | "embedding" (live path)
    hidden: int = 64
    use_distance_prior: bool = False
    prior_scale: float = 600.0  # logits -= dist/prior_scale (smaller = stronger)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,               # [N, 16] node context
        edge_features: jnp.ndarray,   # [E, 1]
        edge_src: jnp.ndarray,        # [E] int
        edge_dst: jnp.ndarray,        # [E] int
        dist: Optional[jnp.ndarray] = None,  # [N, N] congested distances
    ) -> jnp.ndarray:
        if self.mode == "embedding":
            # Live minimal path: 1-d embedding gathered at the edge target's
            # ROAD_INDEX (mpnn_agent.py:195-217).
            road_index = x[:, COL_ROAD_INDEX].astype(jnp.int32)
            road_index = jnp.where(
                road_index < 0, self.num_node_embeddings - 1, road_index
            )
            table = nn.Embed(self.num_node_embeddings, 1, name="nodes_embedding")
            logits = table(road_index)[edge_dst][:, 0]
        elif self.mode == "edge_mlp":
            # Intended design: MLP over [x_src, x_dst, edge_attr]
            # (mpnn_agent.py:35-41). Inputs squashed to tame the raw
            # second/metre magnitudes in the observation, plus two
            # indicators the MLP cannot recover from squashed raw indices:
            # "this edge's target IS the source head agent's destination"
            # (the exit edge to take) and "the target is a virtual SRC/DEST
            # node" (selecting such an edge for a non-destined head freezes
            # it: no turn edge can match SELECTED_ROAD, direction.py:62).
            xs = x / (1.0 + jnp.abs(x))
            dest = x[:, COL_DESTINATION].astype(jnp.int32)
            is_virtual = (x[:, COL_ROAD_INDEX] < 0.0).astype(jnp.float32)
            match = (edge_dst == dest[edge_src]).astype(jnp.float32)
            e_in = jnp.concatenate(
                [xs[edge_src], xs[edge_dst], edge_features,
                 match[:, None], is_virtual[edge_dst][:, None]], axis=-1
            )
            h = nn.relu(nn.Dense(self.hidden, name="edge_fc1")(e_in))
            h = nn.relu(nn.Dense(self.hidden // 2, name="edge_fc2")(h))
            logits = nn.Dense(1, name="edge_out")(h)[:, 0]
        else:
            raise ValueError(f"Unknown policy mode {self.mode!r}")

        if self.use_distance_prior and dist is not None:
            # Shortest-path prior: prefer edges whose target minimizes TOTAL
            # remaining time = the target road's own free-flow traversal
            # (obs column 2; zero at virtual nodes) + the shortest distance
            # from the target onward (mpnn_agent.py:84-113, intended).
            # Omitting the target's own fftt inverts preferences wherever a
            # slow direct road competes with a fast multi-hop route (e.g. it
            # prefers Braess's 150 s UT route over the 105 s shortcut).
            dest = x[:, COL_DESTINATION].astype(jnp.int32)
            d = dist[edge_dst, dest[edge_src]]
            d = jnp.where(jnp.isfinite(d) & (d < 1e17), d, 1e6)
            d = d + x[edge_dst, 2]
            logits = logits - d / self.prior_scale

        return logits


class MPNNValueNet(nn.Module):
    """Full MPNN critic (mpnn_agent.py:267-402): per-edge message MLP,
    mean aggregation at the source node, node MLP, time embedding, and a
    final linear over all node values."""

    num_nodes: int
    hidden: int = 32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,               # [N, 16]
        edge_features: jnp.ndarray,   # [E, 1]
        edge_src: jnp.ndarray,
        edge_dst: jnp.ndarray,
        time: jnp.ndarray,            # [1]
    ) -> jnp.ndarray:
        xs = x / (1.0 + jnp.abs(x))
        msg_in = jnp.concatenate([xs[edge_dst], edge_features], axis=-1)
        msg = nn.tanh(nn.Dense(1, name="message_fc")(msg_in))
        deg = segment_sum(
            jnp.ones((edge_src.shape[0],), jnp.float32), edge_src, self.num_nodes
        )
        agg = segment_sum(msg[:, 0], edge_src, self.num_nodes) / jnp.maximum(deg, 1.0)
        v = nn.tanh(nn.Dense(1, name="node_fc")(agg[:, None]))[:, 0]

        t = nn.relu(nn.Dense(self.hidden, name="time_fc1")(time / 86400.0))
        t = nn.relu(nn.Dense(self.hidden, name="time_fc2")(t))
        t_emb = nn.Dense(1, name="time_out")(t)

        final_in = jnp.concatenate([v, t_emb], axis=-1)
        return nn.Dense(1, name="final")(final_in)[0]


class MPNNValueNetSimple(nn.Module):
    """The critic the reference actually trains with (runner.py:68):
    occupancy-per-node concat time -> MLP(64, 64) -> scalar value
    (mpnn_agent.py:407-450)."""

    hidden: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, time: jnp.ndarray) -> jnp.ndarray:
        occupancy = x[:, COL_NUMBER_OF_AGENT]
        inp = jnp.concatenate([occupancy, time / 3600.0], axis=-1)
        h = nn.relu(nn.Dense(self.hidden, name="fc1")(inp))
        h = nn.relu(nn.Dense(self.hidden, name="fc2")(h))
        return nn.Dense(1, name="out")(h)[0]
