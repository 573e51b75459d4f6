"""Transformer-based route-choice policy and value nets.

Re-design of the reference's ``MLAgents`` / ``ValueNet``
(src/agents/transformer_agent.py:19-323): a GraphTransformerNet over the full
dual graph whose per-edge scores are the route-choice logits.  Laplacian PE is
precomputed once per network on the host (on road nodes only, zero-padded for
SRC/DEST — transformer_agent.py:190-200) and baked into the module.

The policy exposes the same ``apply(params, x, edge_features, edge_src,
edge_dst)`` signature as :class:`~tarl_tpu.models.mpnn.MPNNPolicyNet`, so it
drops into :class:`~tarl_tpu.rl.ppo.PPO` unchanged; ``make_transformer_choice``
adapts it to the classical simulation loop (the reference's grouped-cumsum
sampler, transformer_agent.py:202-253, becomes a per-group Gumbel-max draw).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...network import Network
from ...rl.distribution import GraphDistribution
from .embedding import laplacian_positional_encoding
from .model import GraphTransformerNet


def network_positional_encoding(network: Network, dim: int = 16) -> np.ndarray:
    """Laplacian PE over the road-only turn graph, zero-padded to all nodes
    (transformer_agent.py:47-56,190-200)."""
    return laplacian_positional_encoding(
        np.asarray(network.edge_src),
        np.asarray(network.edge_dst),
        network.num_roads,
        dim,
        total_num_nodes=network.num_nodes,
    )


class TransformerRoutePolicy(nn.Module):
    """Per-edge logits from a GraphTransformerNet (MLAgents.forward,
    transformer_agent.py:58-127)."""

    # GTConv attention aggregates over the WHOLE edge list — logits are not
    # per-edge-row independent, so the slot-major padded-table fast paths
    # (rl.learned_policy.make_learned_choice, the shard_map episode) cannot
    # run this net's own forward (they mask invalid rows only after the
    # fact).  They detect the flag and route through the masked slot-twin
    # forward instead (models/transformer/slot_forward.py — same params).
    edge_row_independent = False

    pe: np.ndarray          # [N, pe_dim] static positional encodings
    hidden_dim: int = 16
    num_layers: int = 2
    num_heads: int = 4
    gate: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,              # [N, 16] node context
        edge_features: jnp.ndarray,  # [E, 1]
        edge_src: jnp.ndarray,
        edge_dst: jnp.ndarray,
        dist: Optional[jnp.ndarray] = None,  # unused; signature parity
    ) -> jnp.ndarray:
        xs = x / (1.0 + jnp.abs(x))
        net = GraphTransformerNet(
            node_dim_in=xs.shape[-1],
            edge_dim_in=edge_features.shape[-1],
            pe_in_dim=self.pe.shape[-1],
            hidden_dim=self.hidden_dim,
            gate=self.gate,
            num_gt_layers=self.num_layers,
            num_heads=self.num_heads,
            dropout=self.dropout,
            name="transformer",
        )
        _, edge_scores = net(
            xs, edge_src, edge_dst, edge_features, jnp.asarray(self.pe), raw=True
        )
        return edge_scores


class TransformerValueNet(nn.Module):
    """Graph-level value head (transformer_agent.py:257-323): same trunk,
    pooled mu output."""

    pe: np.ndarray
    hidden_dim: int = 16
    num_layers: int = 2
    num_heads: int = 4
    gate: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        edge_features: jnp.ndarray,
        edge_src: jnp.ndarray,
        edge_dst: jnp.ndarray,
        time: jnp.ndarray,
    ) -> jnp.ndarray:
        xs = x / (1.0 + jnp.abs(x))
        net = GraphTransformerNet(
            node_dim_in=xs.shape[-1],
            edge_dim_in=edge_features.shape[-1],
            pe_in_dim=self.pe.shape[-1],
            hidden_dim=self.hidden_dim,
            gate=self.gate,
            num_gt_layers=self.num_layers,
            num_heads=self.num_heads,
            name="transformer",
        )
        mu, _ = net(
            xs, edge_src, edge_dst, edge_features, jnp.asarray(self.pe), raw=True
        )
        t = nn.Dense(1, name="time_head")(time / 3600.0)
        return (mu + t)[0]


def make_transformer_choice(policy_net: TransformerRoutePolicy, params, network):
    """Adapt the transformer policy to the classical loop: sample one
    outgoing edge per node from the per-edge logits and write SELECTED_ROAD
    (MLAgents.choice, transformer_agent.py:202-253)."""
    from ...rl.observation import observe
    from ...schema import agent_features_matrix

    def choice(state, net: Network):
        key, sub = jax.random.split(state.key)
        nf, ef, _, ai = observe(state, net)
        agent_mat = agent_features_matrix(state.agents)
        x = jnp.concatenate([nf, agent_mat[ai]], axis=-1)
        logits = policy_net.apply(params, x, ef, net.full_src, net.full_dst)
        dist = GraphDistribution(logits, net.full_src, net.num_nodes)
        action = dist.sample(sub)
        src = jnp.where(action, net.full_src, net.num_nodes)
        sel = state.selected_road.at[src].set(
            net.full_dst.astype(jnp.int32), mode="drop"
        )
        return state._replace(selected_road=sel, key=key), None

    return choice
