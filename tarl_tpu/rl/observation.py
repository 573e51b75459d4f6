"""Observation extraction — the reference's ``TransportationSimulator.state()``
contract (transportation_simulator.py:360-366).

``node_features`` is the 7-column tail of the packed node row
(``x[:, 3*Nmax:]`` = [MAX_NUMBER_OF_AGENT, NUMBER_OF_AGENT,
FREE_FLOW_TIME_TRAVEL, LENGHT_OF_ROAD, MAX_FLOW, SELECTED_ROAD, ROAD_INDEX]),
``agent_index`` the FIFO-head agent id per node (0 for SRC/DEST nodes).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..network import Network
from ..state import SimState

NUM_OBS = 7  # reinforcement_learning.py:124


def node_features(state: SimState, network: Network) -> jnp.ndarray:
    """float32[N, 7] in ObservationFeatureHelpers column order."""
    R = network.num_roads
    n = network.num_nodes
    feats = jnp.zeros((n, NUM_OBS), jnp.float32)
    feats = feats.at[:R, 0].set(network.capacity)
    feats = feats.at[:R, 1].set(state.road.count.astype(jnp.float32))
    feats = feats.at[:R, 2].set(network.free_flow)
    feats = feats.at[:R, 3].set(network.length)
    feats = feats.at[:R, 4].set(network.max_flow)
    feats = feats.at[:, 5].set(state.selected_road.astype(jnp.float32))
    road_index = jnp.concatenate(
        [jnp.arange(R, dtype=jnp.float32), -jnp.ones(n - R, jnp.float32)]
    )
    feats = feats.at[:, 6].set(road_index)
    return feats


def agent_index(state: SimState, network: Network) -> jnp.ndarray:
    """int32[N] FIFO-head agent id per node (HEAD_FIFO column)."""
    n = network.num_nodes
    idx = jnp.zeros((n,), jnp.int32)
    return idx.at[: network.num_roads].set(state.road.head_ids())


def observe(state: SimState, network: Network):
    """(node_features [N,7], edge_features [Ef,1], edge_index [2,Ef],
    agent_index [N])."""
    ef = network.full_attr.reshape(-1, 1)
    ei = jnp.stack([network.full_src, network.full_dst], axis=0)
    return node_features(state, network), ef, ei, agent_index(state, network)
