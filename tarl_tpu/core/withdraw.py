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

    # Static slot loop: each depth level is a row of [R] gathers fused into
    # their consumers (see core.direction's performance note — materialized
    # [R, K] gathered tables cost ~7 ns/element on the un-fused TPU gather
    # emitter, dominating the tick at large R).
    iota = jnp.arange(R, dtype=jnp.int32)
    run = jnp.ones((R,), bool)  # consecutive-from-head run (base.py:370)
    wid_rows = []
    for k in range(K):
        phys_k = (road.head + k) % Nmax
        ids_k = road.fifo_ids[iota, phys_k]
        dep_k = road.fifo_departure[iota, phys_k]
        eligible = (
            (agents.dest[ids_k] == network.road_dest)
            & (dep_k <= time)
            & (k < road.count)
        )
        run = run & eligible
        wid_rows.append(jnp.where(run, ids_k, A))  # A -> dropped
    wcount = sum(r < A for r in wid_rows) if K else jnp.zeros((R,), jnp.int32)
    wcount = wcount.astype(jnp.int32)

    # Pop: advance head pointers, nothing else moves.
    new_head = (road.head + wcount) % Nmax
    new_count = road.count - wcount

    # Stamp arrival (base.py:398-400).  DONE/ON_WAY are derived from it
    # (state.AgentState), so this ONE scatter replaces the reference's three
    # agent-column writes — withdraw is the largest tick phase on TPU.
    wids = jnp.concatenate(wid_rows) if K else jnp.full((0,), A, jnp.int32)
    arrival = agents.arrival.at[wids].set(
        jnp.broadcast_to(time, wids.shape), mode="drop"
    )

    return (
        road._replace(head=new_head, count=new_count),
        agents._replace(arrival=arrival),
        wcount,
    )
