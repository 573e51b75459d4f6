"""Agent insertion: place all due agents onto their chosen entry road.

TPU-native rewrite of ``Agents.insert_agent_into_network``
(reference: agents/base.py:244-331).  The reference sorts ready agents by
road, computes per-road allowed counts with ``unique_consecutive`` and then
runs a small Python loop over unique roads (base.py:288-291); here the whole
assignment — including the capacity clip — is one fused, static-shape
computation: within-group ranks via an O(K^2) pairwise comparison for
windowed candidate sets (or stable sort + segmented rank for
whole-population inserts), capacity masking, and four scatters into the
ring-buffer FIFOs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import PhysicsConfig, DEFAULT_PHYSICS
from ..network import Network
from ..state import AgentState, RoadState

# Candidate-set size above which the O(K^2) pairwise rank falls back to the
# argsort form (whole-population inserts); the windowed path stays under it.
_PAIRWISE_RANK_MAX = 2048

# The pairwise count_add materializes a [K, R] boolean intermediate; at metro
# scale (R ~ 65k) that is ~134M elements per tick even when K is small, so
# the compare+sum only pays off while K*R stays modest.
_PAIRWISE_COUNT_MAX_ELEMS = 16 * 1024 * 1024



def _admit_candidates(
    road: RoadState,
    agents: AgentState,
    network: Network,
    time: jnp.ndarray,
    physics: PhysicsConfig,
    candidate_ids: jnp.ndarray,  # int32[K] agent ids
    road_key: jnp.ndarray,       # int32[K] entry road, R = not a candidate
) -> tuple[RoadState, AgentState]:
    """Shared admission core: capacity-clipped group insert of candidates.

    The reference stable-sorts candidates by road and ranks within groups
    (base.py:275-291); ranks here come from an O(K^2) pairwise comparison
    instead — ``rank_i = #{j < i : road_j == road_i}`` — which is ~K^2 fused
    boolean ops on the VPU and removes the per-tick sort (the argsort was
    the largest remaining phase of the slot-major tick).  Identical
    admission set, slots and stamps: admission order within a road group is
    candidate order either way.  Admits ``rank < capacity - CONGESTION_FILE
    - count`` (base.py:280-299) and scatters ids/arrival/departure/dest
    into the ring buffers with the congestion-law departure stamp
    (base.py:313-325).
    """
    R = road.num_roads
    Nmax = road.nmax
    A = agents.num_agents
    K = candidate_ids.shape[0]

    if K <= _PAIRWISE_RANK_MAX:
        road_cand = road_key.astype(jnp.int32)
        agent_cand = candidate_ids.astype(jnp.int32)
        same = road_cand[None, :] == road_cand[:, None]    # [K, K]
        pos = jnp.arange(K, dtype=jnp.int32)
        earlier = pos[None, :] < pos[:, None]
        rank = jnp.sum(same & earlier, axis=1).astype(jnp.int32)
    else:
        # O(K^2) would blow up for whole-population inserts; fall back to
        # the stable sort + segmented-rank form (same admission outcome).
        order = jnp.argsort(road_key, stable=True)
        road_cand = road_key[order].astype(jnp.int32)
        agent_cand = candidate_ids[order].astype(jnp.int32)
        pos = jnp.arange(K, dtype=jnp.int32)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), road_cand[1:] != road_cand[:-1]]
        )
        group_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(is_start, pos, 0)
        )
        rank = pos - group_start

    safe_road = jnp.minimum(road_cand, R - 1)
    count_before = road.count[safe_road]
    remaining = (
        network.capacity[safe_road]
        - physics.congestion_buffer
        - count_before.astype(jnp.float32)
    ).astype(jnp.int32)
    ok = (road_cand < R) & (rank < remaining) & (remaining > 0)

    # Scatter into ring buffers: logical slot = count_before + rank.
    slot = (road.head[safe_road] + count_before + rank) % Nmax
    rows = jnp.where(ok, road_cand, R)  # R is out of bounds -> dropped

    time_congestion = network.congestion_constant[safe_road] / (
        network.capacity[safe_road]
        + physics.congestion_softening
        - count_before.astype(jnp.float32)
    )
    travel_time = jnp.maximum(network.free_flow[safe_road], time_congestion)

    fifo_ids = road.fifo_ids.at[rows, slot].set(agent_cand, mode="drop")
    fifo_arrival = road.fifo_arrival.at[rows, slot].set(
        jnp.broadcast_to(time, (K,)), mode="drop"
    )
    fifo_departure = road.fifo_departure.at[rows, slot].set(
        time + travel_time, mode="drop"
    )
    fifo_dest = road.fifo_dest.at[rows, slot].set(
        agents.dest[agent_cand], mode="drop"
    )
    if K <= _PAIRWISE_RANK_MAX and K * R <= _PAIRWISE_COUNT_MAX_ELEMS:
        # Per-road admitted counts via the same pairwise trick (a [K, R]
        # compare+sum is fused VPU work; the segment_sum alternative is
        # another serialized scatter).
        count_add = jnp.sum(
            ok[:, None] & (road_cand[:, None] == jnp.arange(R)[None, :]),
            axis=0,
        ).astype(jnp.int32)
    else:
        count_add = jax.ops.segment_sum(
            ok.astype(jnp.int32), rows, num_segments=R + 1
        )[:R]

    # Scatter into an int32 staging vector: TPU bool scatters run ~7x
    # slower than int32 ones (measured); the OR is a fused [A] pass.
    inserted_agents = jnp.where(ok, agent_cand, A)  # A -> dropped
    ins_delta = jnp.zeros((A,), jnp.int32).at[inserted_agents].set(
        1, mode="drop"
    )
    inserted = agents.inserted | (ins_delta > 0)

    return (
        road._replace(
            fifo_ids=fifo_ids,
            fifo_arrival=fifo_arrival,
            fifo_departure=fifo_departure,
            fifo_dest=fifo_dest,
            count=road.count + count_add,
        ),
        agents._replace(inserted=inserted),
    )


def insert_agents(
    road: RoadState,
    agents: AgentState,
    selected_road: jnp.ndarray,
    network: Network,
    time: jnp.ndarray,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    entry_road: jnp.ndarray | None = None,
) -> tuple[RoadState, AgentState]:
    """Insert every ready agent whose entry road has spare capacity.

    Parameters
    ----------
    entry_road:
        Optional int32[A] road index per agent.  Defaults to the road selected
        at the agent's origin SRC node (``x[origins, SELECTED_ROAD]``,
        base.py:258-259).  Routing policies that know each agent's destination
        (e.g. the shortest-path policy) pass a per-agent road instead, fixing
        the reference quirk where all entrants at one SRC share a single
        head-of-FIFO-driven choice.

    Semantics matched to the reference:

    * ready = departure reached & not ON_WAY & not DONE (base.py:247-251);
    * per-road admitted count = min(#candidates, capacity - CONGESTION_FILE -
      count) with candidates admitted in agent-index order (base.py:275-299);
    * arrival stamped ``time``; departure stamped ``time + max(fftt,
      congestion_constant / (cap + 10 - count_before))`` where ``count_before``
      is the road's occupancy before this whole insert (base.py:313-325).
    """
    R = road.num_roads

    ready = (agents.departure <= time) & (~agents.on_way) & (~agents.done)
    if entry_road is None:
        entry_road = selected_road[agents.origin]
    valid_road = (entry_road >= 0) & (entry_road < R)
    road_key = jnp.where(ready & valid_road, entry_road, R).astype(jnp.int32)
    candidate_ids = jnp.arange(agents.num_agents, dtype=jnp.int32)
    return _admit_candidates(
        road, agents, network, time, physics, candidate_ids, road_key
    )


def insert_agents_windowed(
    road: RoadState,
    agents: AgentState,
    selected_road: jnp.ndarray,
    network: Network,
    time: jnp.ndarray,
    order: jnp.ndarray,      # int32[A] — agent ids sorted by departure time
    ptr: jnp.ndarray,        # int32[] — first order[] position still pending
    window: int,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    entry_road: jnp.ndarray | None = None,
    entry_lookup=None,
) -> tuple[RoadState, AgentState, jnp.ndarray]:
    """Windowed insertion: O(W log W) per tick instead of O(A log A).

    ``entry_lookup(agent_ids) -> roads`` supplies per-agent entry roads for
    the window only (preferred: keeps the tick independent of A);
    ``entry_road`` is the full [A] array fallback.

    The reference scans the whole population every tick (base.py:247-251);
    for multi-million-agent populations the per-tick argsort dominates.
    Since readiness is monotone in departure time, candidates live in a
    moving window of the departure-sorted order: ``order[ptr : ptr + W]``.
    ``ptr`` advances past the leading run of agents that are ON_WAY or DONE.
    Capacity-blocked agents pin the pointer and retry next tick; if more than
    ``W`` agents are simultaneously pending, the overflow waits extra ticks
    (bounded, documented deviation from the all-at-once reference scan).

    Returns ``(road, agents, new_ptr)``.
    """
    R = road.num_roads
    Nmax = road.nmax
    A = agents.num_agents
    W = min(window, A)

    # Explicit clamped start: dynamic_slice clamps anyway, but the pointer
    # arithmetic below must use the *actual* slice start.
    start = jnp.minimum(ptr, A - W).astype(jnp.int32)
    win_ids = jax.lax.dynamic_slice_in_dim(order, start, W)

    ready = (
        (agents.departure[win_ids] <= time)
        & (~agents.on_way[win_ids])
        & (~agents.done[win_ids])
    )
    if entry_lookup is not None:
        win_entry = entry_lookup(win_ids)
    elif entry_road is not None:
        win_entry = entry_road[win_ids]
    else:
        win_entry = selected_road[agents.origin[win_ids]]
    valid_road = (win_entry >= 0) & (win_entry < R)
    road_key = jnp.where(ready & valid_road, win_entry, R).astype(jnp.int32)

    road, agents = _admit_candidates(
        road, agents, network, time, physics, win_ids.astype(jnp.int32), road_key
    )
    on_way = agents.on_way

    # Advance past the leading settled run (ON_WAY or DONE after this insert),
    # measured from the actual slice start.  The run length is the first
    # unsettled position — a min-reduce, which is much cheaper on TPU than
    # the equivalent cumprod-and-sum scan (~80 us/tick at W=1024, measured).
    settled = on_way[win_ids] | agents.done[win_ids]
    pos_w = jnp.arange(W, dtype=jnp.int32)
    advance = jnp.min(jnp.where(settled, W, pos_w))
    new_ptr = jnp.minimum(start + advance, A).astype(jnp.int32)

    return road, agents, new_ptr
