"""Direction step: propose and accept at most one agent transfer per road.

TPU-native rewrite of ``DirectionMPNN`` (reference: direction_mpnn.py:19-236).
The PyG message/aggregate/update phases become one fused gather -> mask ->
segment-sample -> scatter pipeline over the turn-edge list:

* ``message`` (direction_mpnn.py:44-100): per turn edge (u -> v), transfer
  eligibility = departure time reached AND v has space below
  ``capacity - CONGESTION_FILE`` AND u's head selected v AND u non-empty,
  OR the gridlock-escape submask (stuck > 10 s, u nearly full, v at least as
  free as u, v selected);
* ``aggregate`` (direction_mpnn.py:103-146): Gumbel-max categorical over each
  downstream road's incoming proposals, probability proportional to
  ``edge_attr * mask`` — here the *exact* trick (log-prob + Gumbel, -inf on
  masked edges) instead of the reference's ``log(prob + 1e-12)`` approximation;
* ``update`` (direction_mpnn.py:148-196): push the chosen agent at v's FIFO
  tail, stamp arrival = now and departure = now + max(fftt,
  congestion_constant / (cap + 10 - count)); agent id 0 is the sentinel
  non-agent and never increments the count (direction_mpnn.py:194).

Also emits the per-edge ``delta_travel_time`` the reference stores for the
road-optimality metric (direction_mpnn.py:94-96), aggregated per source road.

Performance note (measured, scripts/microbench_*.py): XLA's un-fused
gather/scatter emitters run serially at ~7 ns/element on TPU, so segment
reductions over the edge list and row-scatters into the FIFO arrays dominated
the tick at large R.  The aggregate is therefore a static K-slot loop over the
per-road incoming-edge table (network.in_edge_tab) — each slot row is a [R]
gather that fuses into its elementwise consumer — and the FIFO push is a dense
[R, Nmax] select.  Outcomes are bitwise-identical to the segment-op
formulation: the Gumbel noise is drawn per edge in edge-list order with the
same key, and ascending slot order reproduces segment_argmax's
lowest-edge-index tie-break.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import PhysicsConfig, DEFAULT_PHYSICS
from ..network import Network
from ..state import RoadState

NEG_INF = jnp.float32(-jnp.inf)


def direction_step(
    road: RoadState,
    selected_road: jnp.ndarray,
    network: Network,
    time: jnp.ndarray,
    key: jax.Array,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    compute_delta: bool = True,
) -> tuple[RoadState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns ``(road_state, road_delta_tt, accept, win_src)``.

    ``road_delta_tt[R]`` is the congestion delay of each road's head agent
    summed over its outgoing turn edges (the aggregation
    plot_road_optimality applies, transportation_simulator.py:482-488).
    ``accept[R]`` marks roads that received an agent this step and
    ``win_src[R]`` is the winning upstream road (R when none) — the exact
    transfer record the response phase needs to pop upstream heads without
    re-deriving it from FIFO contents (see core.response)."""
    R = road.num_roads
    Nmax = road.nmax
    u = network.edge_src
    v = network.edge_dst

    head_id = road.head_ids()
    head_arrival = road.head_arrival()
    head_departure = road.head_departure()
    count_f = road.count.astype(jnp.float32)
    cap = network.capacity

    # --- message: eligibility mask per turn edge (direction_mpnn.py:81-91) ---
    dep_ok = head_departure[u] <= time
    space_ok = count_f[v] < cap[v] - physics.congestion_buffer
    wants_v = selected_road[:R][u] == v
    nonempty = road.count[u] > 0
    mask = dep_ok & space_ok & wants_v & nonempty

    # Gridlock escape (direction_mpnn.py:87-90) with two safety guards the
    # reference gets implicitly from its zero-filled FIFO / flat layout:
    # the upstream must actually hold an agent, and the downstream must stay
    # below its hard slot capacity (else the ring write would wrap onto the
    # head slot once count reached Nmax).
    stuck = (head_departure[u] - time) < -physics.gridlock_patience
    u_full = cap[u] - physics.congestion_buffer <= count_f[u]
    v_freer = cap[u] - count_f[u] <= cap[v] - count_f[v]
    v_has_slot = count_f[v] < cap[v]
    gridlock = stuck & u_full & v_freer & wants_v & nonempty & v_has_slot
    mask = mask | gridlock

    prob = network.edge_attr * mask.astype(jnp.float32)

    # --- aggregate: sample <=1 incoming proposal per road (dm.py:103-146) ---
    # Exact Gumbel-max over the edge list (== ops.segment.segment_sample:
    # same per-edge noise, same key) with the argmax taken by a static slot
    # loop over the incoming-edge table; strict > keeps the first (lowest
    # edge id) maximum, matching segment_argmax's tie-break.
    E = network.num_turn_edges
    logits = jnp.where(prob > 0, jnp.log(jnp.maximum(prob, 1e-30)), -jnp.inf)
    gumbel = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    scores = jnp.where(jnp.isfinite(logits), logits + gumbel, NEG_INF)

    best = jnp.full((R,), NEG_INF, jnp.float32)
    win_edge = jnp.full((R,), E, jnp.int32)
    for k in range(network.in_edge_tab.shape[0]):
        e_k = network.in_edge_tab[k]
        s_k = jnp.where(network.in_edge_ok[k], scores[e_k], NEG_INF)
        take = s_k > best
        best = jnp.where(take, s_k, best)
        win_edge = jnp.where(take, e_k, win_edge)

    has_proposal = win_edge < E
    src_road = u[jnp.minimum(win_edge, E - 1)]
    chosen_agent = jnp.where(has_proposal, head_id[src_road], 0)
    accept = chosen_agent != 0  # sentinel guard (direction_mpnn.py:194)

    # --- update: push at tail, stamp times (direction_mpnn.py:171-195) ---
    slot = (road.head + road.count) % Nmax
    time_congestion = network.congestion_constant / (
        cap + physics.congestion_softening - count_f
    )
    travel_time = jnp.maximum(network.free_flow, time_congestion)

    col = jnp.arange(Nmax, dtype=jnp.int32)[None, :]
    hit = (col == slot[:, None]) & accept[:, None]
    fifo_ids = jnp.where(hit, chosen_agent[:, None], road.fifo_ids)
    fifo_arrival = jnp.where(hit, time, road.fifo_arrival)
    fifo_departure = jnp.where(
        hit, (time + travel_time)[:, None], road.fifo_departure
    )
    new_count = road.count + accept.astype(jnp.int32)

    # --- road-optimality data (direction_mpnn.py:94-96) ---
    if compute_delta:
        # The per-edge delta depends only on the SOURCE road, so the
        # reference's per-source segment reduction over outgoing turn edges
        # (ts.py:482-488) is exactly delta * out-degree — O(R) elementwise,
        # no edge reduce.  Out-degrees are constants XLA folds at compile.
        outdeg = network.out_edge_ok.sum(axis=0).astype(jnp.float32)
        road_delta_tt = (
            jnp.maximum((head_departure - head_arrival) - network.free_flow, 0.0)
            * outdeg
        )
    else:
        road_delta_tt = jnp.zeros((0,), jnp.float32)

    return (
        road._replace(
            fifo_ids=fifo_ids,
            fifo_arrival=fifo_arrival,
            fifo_departure=fifo_departure,
            count=new_count,
        ),
        road_delta_tt,
        accept,
        jnp.where(accept, src_road, R).astype(jnp.int32),
    )
