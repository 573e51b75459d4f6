"""Agent withdrawal: pop arrived agents from FIFO heads.

TPU-native rewrite of ``Agents.withdraw_agent_from_network``
(reference: agents/base.py:334-403).  An agent leaves the network when it sits
in the consecutive-from-head run of agents that (a) have reached their
departure time and (b) whose destination DEST node is adjacent to the current
road.  The reference checks adjacency through a dense ``adj[road, dest]``
lookup (base.py:361); every road has exactly one outgoing DEST edge, so this
is an equality against ``network.road_dest``.  The reference then pops by
gather-shifting all three FIFO slices (base.py:377-396); the ring buffer pops
by advancing ``head`` — zero data movement.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..network import Network
from ..state import AgentState, RoadState


def withdraw_agents(
    road: RoadState,
    agents: AgentState,
    network: Network,
    time: jnp.ndarray,
    depth: int | None = None,
) -> tuple[RoadState, AgentState, jnp.ndarray]:
    """Withdraw all consecutive-from-head arrived agents.

    Parameters
    ----------
    depth:
        Maximum FIFO slots scanned per road per tick.  ``None`` scans the full
        queue (the reference semantics, base.py:364-371); a small static bound
        caps per-tick memory traffic for very deep queues at the cost of
        spreading bursts over consecutive ticks.

    Returns ``(road, agents, withdraw_counts)`` where ``withdraw_counts`` is
    int32[R] agents popped per road this tick; ``withdraw_counts > 0`` is the
    mask the reference appends to ``withdraw_history`` (base.py:402), and its
    sum feeds the incremental DONE counter (no O(A) reduction per tick).
    """
    R = road.num_roads
    Nmax = road.nmax
    A = agents.num_agents
    K = Nmax if depth is None else min(depth, Nmax)

    logical = jnp.arange(K, dtype=jnp.int32)
    phys = (road.head[:, None] + logical[None, :]) % Nmax  # [R, K]
    ids = jnp.take_along_axis(road.fifo_ids, phys, axis=1)
    dep = jnp.take_along_axis(road.fifo_departure, phys, axis=1)

    dest = agents.dest[ids]  # [R, K]
    eligible = (
        (dest == network.road_dest[:, None])
        & (dep <= time)
        & (logical[None, :] < road.count[:, None])
    )
    # Consecutive run from the head (cumprod trick, base.py:370).
    cum = jnp.cumprod(eligible.astype(jnp.int32), axis=1).astype(bool)
    wcount = cum.sum(axis=1).astype(jnp.int32)

    # Pop: advance head pointers, nothing else moves.
    new_head = (road.head + wcount) % Nmax
    new_count = road.count - wcount

    # Stamp arrival (base.py:398-400).  DONE/ON_WAY are derived from it
    # (state.AgentState), so this ONE scatter replaces the reference's three
    # agent-column writes — withdraw is the largest tick phase on TPU.
    wids = jnp.where(cum, ids, A).reshape(-1)  # A -> dropped
    arrival = agents.arrival.at[wids].set(
        jnp.broadcast_to(time, wids.shape), mode="drop"
    )

    return (
        road._replace(head=new_head, count=new_count),
        agents._replace(arrival=arrival),
        wcount,
    )
