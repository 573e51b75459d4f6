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

Performance note (measured, scripts/microbench_*.py + ablate_sample_micro.py):
TPU gathers are only fast when their indices are (near-)sorted — XLA's
general emitter runs serially at ~7 ns/element, so one unsorted [R]-from-[E]
gather (or any edge-list segment reduction / FIFO row-scatter) costs more
than the rest of the tick at large R.  The whole step is therefore computed
in SLOT-MAJOR form: slot k of road v is its k-th incoming turn edge
(network.in_src_tab / in_logit_tab, slot order = increasing
edge id), every per-edge quantity is an [R]-row, upstream state is gathered
with spatially-banded road indices, the Gumbel noise is drawn directly in
[KIN, R] slot-major order, and the FIFO push is a dense [R, Nmax] select.
Winner selection is distribution-identical to segment sampling over the edge
list (independent Gumbel per edge, ascending-slot strict-> tie-break =
segment_argmax's lowest-edge-id rule); the PRNG *stream* differs, so
cross-implementation equality tests must use the same formulation on both
sides (parallel.shard_map_episode does).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import PhysicsConfig, DEFAULT_PHYSICS
from ..network import Network
from ..state import RoadState

NEG_INF = jnp.float32(-jnp.inf)


def upstream_pack_layout(num_roads: int, nmax: int) -> tuple[int, int, int]:
    """Bit layout for the packed upstream word: ``(shift_free, shift_sel,
    free_mask)``.

    3 flag bits (departure-reached / non-empty / gridlock-stuck), then
    free-space (``cap - count``, needs ceil(log2(Nmax+1)) bits — the
    "effectively full" test derives from it as ``free <= congestion
    buffer``), then the selected road (ceil(log2(R+1)) bits; R encodes
    "no/invalid selection").  Sized per network so neither field can clip.
    """
    bits_free = max((nmax + 1).bit_length(), 1)
    bits_sel = max((num_roads + 1).bit_length(), 1)
    if 3 + bits_free + bits_sel > 31:
        raise ValueError(
            f"upstream pack overflow: Nmax={nmax} needs {bits_free} bits and "
            f"R={num_roads} needs {bits_sel}; split the network or widen the "
            "pack word"
        )
    return 3, 3 + bits_free, (1 << bits_free) - 1


def pack_upstream(head_departure, count, cap, sel_enc, time, physics,
                  num_roads: int, nmax: int):
    """One int32 per road of everything the downstream slot loop needs.

    REQUIRES integral ``cap``: free space ``cap - count`` is truncated to an
    integer field, and the downstream tests ``u_full = free <= buffer`` /
    ``v_freer = u_free <= v_free`` compare the truncated value against exact
    ones — equivalent to the unpacked semantics only when capacity is a whole
    number.  :func:`~tarl_tpu.network.build_network` guarantees this
    (``int(length*lanes/cell) + 1``, ts.py:122-124) and asserts it; a
    hand-built :class:`Network` with fractional capacities would silently
    shift gridlock behaviour.
    """
    shift_free, shift_sel, _ = upstream_pack_layout(num_roads, nmax)
    count_f = count.astype(jnp.float32)
    u_free_i = jnp.clip(cap - count_f, 0, (1 << (shift_sel - shift_free)) - 1)
    return (
        (head_departure <= time).astype(jnp.int32)
        | ((count > 0).astype(jnp.int32) << 1)
        | (((head_departure - time) < -physics.gridlock_patience)
           .astype(jnp.int32) << 2)
        | (u_free_i.astype(jnp.int32) << shift_free)
        | (sel_enc << shift_sel)
    )


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
    KIN = network.in_src_tab.shape[0]

    head_id = road.head_ids()
    head_arrival = road.head_arrival()
    head_departure = road.head_departure()
    count = road.count
    count_f = count.astype(jnp.float32)
    cap = network.capacity
    sel = selected_road[:R]
    iota = jnp.arange(R, dtype=jnp.int32)

    # Downstream-side (this road, elementwise) ingredients, shared by slots.
    space_ok = count_f < cap - physics.congestion_buffer
    v_free = cap - count_f
    v_has_slot = count_f < cap

    # Upstream-side state packed into ONE int32 per road, so each slot costs
    # a single gather (unsorted [R] gathers run at ~7 ns/element on TPU —
    # module docstring).  Bit layout sized per network: see
    # :func:`upstream_pack_layout` (direction_mpnn.py:81-90 semantics).
    shift_free, shift_sel, free_mask = upstream_pack_layout(R, Nmax)
    sel_enc = jnp.where((sel >= 0) & (sel < R), sel, R).astype(jnp.int32)
    pack = pack_upstream(
        head_departure, count, cap, sel_enc, time, physics, R, Nmax
    )

    # --- message + aggregate fused: per in-slot eligibility, Gumbel-max ---
    # (direction_mpnn.py:81-91, 103-146).  Slot k of road v is its k-th
    # incoming turn edge; the Gumbel noise is drawn directly in slot-major
    # [KIN, R] order.  Ascending slots + strict > reproduce segment_argmax's
    # lowest-edge-id tie-break.  Renumbered networks address the stream by
    # CANONICAL position (core.rng) so the draw is a pure function of the
    # physical edge — renumbered episodes are trace-identical to
    # identity-numbered ones; identity networks keep the plain draw.
    from .rng import direction_gumbel

    gumbel = direction_gumbel(key, network)
    best = jnp.full((R,), NEG_INF, jnp.float32)
    win_slot = jnp.zeros((R,), jnp.int32)
    accept = jnp.zeros((R,), bool)
    # The in-slot gather is the step's only index-dependent op.  At metro
    # scale it is evaluated as per-offset ROLLS (core.roll_gather: the serial
    # gather emitter costs ~7 ns/index, a roll is a full-bandwidth
    # dynamic-slice), stacking head id / head dest into the same plan so the
    # winner gathers below are covered too.  Small nets keep ONE flattened
    # [KIN*R] gather (launch-bound regime; fewer ops wins there).
    from .roll_gather import roll_enabled, MIN_ROADS

    # Plans are now BUILT from 512 roads up (the fused kernel uses them at
    # any size); the XLA roll evaluation stays gated at MIN_ROADS, below
    # which the flattened gather wins (launch-bound regime).
    use_roll = roll_enabled(network.in_roll_shift) and R >= MIN_ROADS
    if use_roll:
        from .roll_gather import roll_gather

        mat = jnp.stack([pack, head_id, road.head_dests()])
        slots = roll_gather(
            mat, network.in_roll_shift, network.in_roll_sel,
            network.in_roll_exc_src, network.in_roll_exc_k,
            network.in_roll_exc_v,
        )  # [KIN, 3, R]
        pack_slots = slots[:, 0]
    else:
        pack_slots = pack[network.in_src_tab.reshape(-1)].reshape(KIN, R)
    for k in range(KIN):
        p_k = pack_slots[k]
        dep_ok = (p_k & 1) > 0
        nonempty = (p_k & 2) > 0
        stuck = (p_k & 4) > 0
        u_free = ((p_k >> shift_free) & free_mask).astype(jnp.float32)
        # "effectively full" (cap - buffer <= count) == free <= buffer.
        u_full = u_free <= physics.congestion_buffer
        wants_v = (p_k >> shift_sel) == iota
        mask = dep_ok & space_ok & wants_v & nonempty
        # Gridlock escape (direction_mpnn.py:87-90) with two safety guards
        # the reference gets implicitly from its zero-filled FIFO / flat
        # layout: the upstream must actually hold an agent, and the
        # downstream must stay below its hard slot capacity (else the ring
        # write would wrap onto the head slot once count reached Nmax).
        v_freer = u_free <= v_free
        mask = mask | (
            stuck & u_full & v_freer & wants_v & nonempty & v_has_slot
        )
        mask = mask & network.in_edge_ok[k]
        s_k = jnp.where(mask, network.in_logit_tab[k] + gumbel[k], NEG_INF)
        take = s_k > best
        best = jnp.where(take, s_k, best)
        win_slot = jnp.where(take, k, win_slot)
        accept = accept | take

    src_road = jnp.zeros((R,), jnp.int32)
    for k in range(KIN):
        src_road = jnp.where(win_slot == k, network.in_src_tab[k], src_road)
    src_road = jnp.where(accept, src_road, R).astype(jnp.int32)
    if use_roll:
        # Winner head id / dest selected from the pre-rolled slot rows —
        # no [R]-index gather.  Garbage rows (invalid slots) are never
        # selected: accept implies win_slot points at a valid edge.
        cand_id = slots[0, 1]
        cand_dest = slots[0, 2]
        for k in range(1, KIN):
            pick = win_slot == k
            cand_id = jnp.where(pick, slots[k, 1], cand_id)
            cand_dest = jnp.where(pick, slots[k, 2], cand_dest)
        chosen_agent = jnp.where(accept, cand_id, 0)
        accept = chosen_agent != 0  # sentinel guard (direction_mpnn.py:194)
        chosen_dest = jnp.where(accept, cand_dest, 0)
    else:
        src_c = jnp.minimum(src_road, R - 1)
        chosen_agent = jnp.where(accept, head_id[src_c], 0)
        accept = chosen_agent != 0  # sentinel guard (direction_mpnn.py:194)
        chosen_dest = jnp.where(accept, road.head_dests()[src_c], 0)

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
    fifo_dest = jnp.where(hit, chosen_dest[:, None], road.fifo_dest)
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
            fifo_dest=fifo_dest,
            count=new_count,
        ),
        road_delta_tt,
        accept,
        jnp.where(accept, src_road, R).astype(jnp.int32),
    )
