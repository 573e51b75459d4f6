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

Performance note (r3 consolidation): the windowed tick is LAUNCH-bound —
~20 small kernels at ~5-7 us each, dominated by one-column [W] gathers.
All per-candidate reads are therefore batched into three row gathers:

* one ``[A, 3]`` static agent table (departure / origin / dest) — built by
  ``jnp.stack`` from arrays that ``run_episode`` keeps OUT of the scan
  carry, so XLA hoists the stack out of the loop;
* one ``[R, 3]`` static road table (capacity / congestion constant / fftt),
  likewise loop-invariant;
* one packed head/count word per road (both < Nmax+1, one int32) — a cheap
  [R] elementwise pack replacing two gathers.

Readiness needs only the ``inserted`` flag: ``done`` implies ``inserted``
(arrival is stamped strictly after insertion), so the reference's
``~ON_WAY & ~DONE`` (base.py:247-251) reduces to ``~inserted`` — no
arrival gather.  The post-insert "settled" scan of the windowed pointer
advance reuses the admission mask instead of re-gathering agent flags.
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


def _road_static_tab(network: Network) -> jnp.ndarray:
    """[R, 3] = (capacity, congestion_constant, free_flow) — loop-invariant
    (network arrays are scan constants), so one row gather serves all three
    per-candidate reads."""
    return jnp.stack(
        [network.capacity, network.congestion_constant, network.free_flow],
        axis=1,
    )


def _resolve_compact(compact, num_candidates: int) -> int | None:
    """Resolve SimConfig.insert_compact for a K-candidate admission: "auto"
    enables the 256-index budget once K reaches 4096.  Measured on the v5e:
    lax.top_k is launch-bound at ~50 us regardless of input size, so
    replacing the 4 K-index scatters (~28 us at K=1024) LOSES below ~4k
    candidates and wins above (withdraw_compact's measured 179 -> 47 us at
    32k candidates)."""
    if isinstance(compact, str):
        if compact != "auto":
            raise ValueError(f"insert compact: {compact!r} (int|None|'auto')")
        return 256 if num_candidates >= 4096 else None
    return compact


def _admit_candidates(
    road: RoadState,
    agents: AgentState,
    network: Network,
    time: jnp.ndarray,
    physics: PhysicsConfig,
    candidate_ids: jnp.ndarray,  # int32[K] agent ids
    road_key: jnp.ndarray,       # int32[K] entry road, R = not a candidate
    cand_dest: jnp.ndarray | None = None,  # int32[K] dest per candidate
    update_inserted: bool = True,
    stamp_count: jnp.ndarray | None = None,  # int32[R] tick-start occupancy
    force_pairwise: bool = False,
    compact: int | None = None,
) -> tuple[RoadState, AgentState, jnp.ndarray]:
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

    Returns ``(road, agents, admitted)`` where ``admitted`` is the admission
    mask in CANDIDATE order (windowed insertion derives its pointer advance
    from it without re-reading agent flags).

    ``stamp_count`` (optional [R] snapshot of road occupancy at tick start)
    overrides the departure-stamp denominator: the reference stamps every
    agent admitted in one tick with the congestion law evaluated at the
    road's occupancy BEFORE the whole insert (base.py:313-325).  Escalation
    passes (see :func:`insert_agents_windowed`) admit after earlier
    same-tick passes already raised ``road.count``, so they pass the
    snapshot to keep stamps bitwise-equal to a single whole-population
    insert.  Rank/capacity math always uses the CURRENT count (equivalent
    to global ranks, since earlier passes admit per-road prefixes).
    """
    R = road.num_roads
    Nmax = road.nmax
    A = agents.num_agents
    K = candidate_ids.shape[0]

    pairwise = force_pairwise or K <= _PAIRWISE_RANK_MAX
    if pairwise:
        road_cand = road_key.astype(jnp.int32)
        agent_cand = candidate_ids.astype(jnp.int32)
        dest_cand = cand_dest
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
        dest_cand = None if cand_dest is None else cand_dest[order]
        pos = jnp.arange(K, dtype=jnp.int32)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), road_cand[1:] != road_cand[:-1]]
        )
        group_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(is_start, pos, 0)
        )
        rank = pos - group_start

    safe_road = jnp.minimum(road_cand, R - 1)

    # One packed head/count gather (both fields < Nmax+1; RoadState keeps
    # them integral by construction) + one static-table row gather.
    hc = road.head * (Nmax + 1) + road.count            # [R] elementwise
    hc_c = hc[safe_road]
    head_c = hc_c // (Nmax + 1)
    count_before = hc_c % (Nmax + 1)
    rs = _road_static_tab(network)[safe_road]           # [K, 3]
    cap_c, cc_c, ff_c = rs[:, 0], rs[:, 1], rs[:, 2]

    remaining = (
        cap_c - physics.congestion_buffer - count_before.astype(jnp.float32)
    ).astype(jnp.int32)
    ok = (road_cand < R) & (rank < remaining) & (remaining > 0)

    # Scatter into ring buffers: logical slot = count_before + rank.
    slot = (head_c + count_before + rank) % Nmax
    rows = jnp.where(ok, road_cand, R)  # R is out of bounds -> dropped

    stamp_c = (
        count_before if stamp_count is None else stamp_count[safe_road]
    )
    time_congestion = cc_c / (
        cap_c + physics.congestion_softening - stamp_c.astype(jnp.float32)
    )
    travel_time = jnp.maximum(ff_c, time_congestion)

    if dest_cand is None:
        dest_cand = agents.dest[agent_cand]
    dep_stamp = time + travel_time

    def _write(rws, slt, ids_v, dst_v, dep_v, ins_mask_ids):
        """The admission scatters over one (possibly compacted) index set.
        Returns (fifo_ids, fifo_arrival, fifo_departure, fifo_dest[,
        ins_delta])."""
        out = (
            road.fifo_ids.at[rws, slt].set(ids_v, mode="drop"),
            road.fifo_arrival.at[rws, slt].set(
                jnp.broadcast_to(time, ids_v.shape), mode="drop"
            ),
            road.fifo_departure.at[rws, slt].set(dep_v, mode="drop"),
            road.fifo_dest.at[rws, slt].set(dst_v, mode="drop"),
        )
        if update_inserted:
            # Scatter into an int32 staging vector: TPU bool scatters run
            # ~7x slower than int32 ones (measured); OR is a fused [A] pass.
            out += (
                jnp.zeros((A,), jnp.int32).at[ins_mask_ids].set(
                    1, mode="drop"
                ),
            )
        return out

    compact = _resolve_compact(compact, K)
    if compact is not None and 0 < compact < K:
        # Admissions are sparse (~departure rate per tick, not K) and TPU
        # scatters cost ~7 ns per INDEX regardless of drops: pull the
        # admitted candidates to the front with a stable top_k (ties keep
        # index order) and scatter `compact` indices instead of K.  Ticks
        # whose admission count overflows the budget take the full scatter
        # through lax.cond — bitwise-identical either way (same index/value
        # pairs land; admitted (row, slot) pairs are unique so order is
        # immaterial).
        flags = ok.astype(jnp.int32)
        topf, topi = jax.lax.top_k(flags, compact)
        sel = topf > 0
        c_rows = jnp.where(sel, rows[topi], R)
        outs = jax.lax.cond(
            jnp.sum(flags) <= compact,
            lambda _: _write(
                c_rows, slot[topi], agent_cand[topi], dest_cand[topi],
                dep_stamp[topi],
                jnp.where(c_rows < R, agent_cand[topi], A),
            ),
            lambda _: _write(
                rows, slot, agent_cand, dest_cand, dep_stamp,
                jnp.where(ok, agent_cand, A),
            ),
            None,
        )
    else:
        outs = _write(
            rows, slot, agent_cand, dest_cand, dep_stamp,
            jnp.where(ok, agent_cand, A),
        )
    fifo_ids, fifo_arrival, fifo_departure, fifo_dest = outs[:4]

    if pairwise and K * R <= _PAIRWISE_COUNT_MAX_ELEMS:
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

    if update_inserted:
        inserted = agents.inserted | (outs[4] > 0)
    else:
        # Caller updates the flag itself (the sorted fast path replaces the
        # scatter with a contiguous dynamic_update_slice).
        inserted = agents.inserted

    if pairwise:
        admitted = ok
    else:
        # Map the admission mask back to candidate order for the caller.
        admitted = jnp.zeros((K,), bool).at[order].set(ok)

    return (
        road._replace(
            fifo_ids=fifo_ids,
            fifo_arrival=fifo_arrival,
            fifo_departure=fifo_departure,
            fifo_dest=fifo_dest,
            count=road.count + count_add,
        ),
        agents._replace(inserted=inserted),
        admitted,
    )


def insert_agents(
    road: RoadState,
    agents: AgentState,
    selected_road: jnp.ndarray,
    network: Network,
    time: jnp.ndarray,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    entry_road: jnp.ndarray | None = None,
    compact: int | str | None = None,
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

    * ready = departure reached & not ON_WAY & not DONE (base.py:247-251) —
      equivalently ``~inserted``, since DONE implies inserted;
    * per-road admitted count = min(#candidates, capacity - CONGESTION_FILE -
      count) with candidates admitted in agent-index order (base.py:275-299);
    * arrival stamped ``time``; departure stamped ``time + max(fftt,
      congestion_constant / (cap + 10 - count_before))`` where ``count_before``
      is the road's occupancy before this whole insert (base.py:313-325).
    """
    R = road.num_roads

    ready = (agents.departure <= time) & (~agents.inserted)
    if entry_road is None:
        entry_road = selected_road[agents.origin]
    valid_road = (entry_road >= 0) & (entry_road < R)
    road_key = jnp.where(ready & valid_road, entry_road, R).astype(jnp.int32)
    candidate_ids = jnp.arange(agents.num_agents, dtype=jnp.int32)
    road, agents, _ = _admit_candidates(
        road, agents, network, time, physics, candidate_ids, road_key,
        cand_dest=agents.dest, compact=compact,
    )
    return road, agents


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
    sorted_fast: bool = False,
    escalate: bool = False,
    compact: int | str | None = None,
) -> tuple[RoadState, AgentState, jnp.ndarray, jnp.ndarray]:
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
    (a bounded deviation from the all-at-once reference scan) — UNLESS
    ``escalate`` is set (SimConfig.insert_escalate, the default), in which
    case additional window passes run at offsets ``ptr + k·W`` until the
    last pass's tail agent is no longer due (or the population is covered).

    Escalation is BITWISE-EXACT vs whole-population :func:`insert_agents`
    (given the same entry roads): consecutive windows compose, because
    per-road admission is a prefix of candidates in departure order — a
    later pass sees ``remaining`` reduced by exactly the earlier passes'
    same-road admissions, so local rank < local remaining ⟺ global rank <
    global remaining, and slots (head + count + rank) telescope identically.
    Departure stamps use the tick-start occupancy snapshot
    (``stamp_count``), matching the reference's stamp-before-the-whole-
    insert semantics (base.py:313-325).  Overlapping passes near the end of
    the population (clamped starts) are outcome-neutral: a road that
    blocked anyone has ``remaining == 0`` afterwards, and admitted agents
    are no longer ready.  Non-saturated ticks pay only the while-loop
    predicate.

    Returns ``(road, agents, new_ptr, saturated)``.  Without escalation
    ``saturated`` (bool[]) is the in-run overflow monitor: True when the
    window's TAIL agent is already due, i.e. due agents may extend beyond
    the window and this tick's admission can differ from exact
    whole-population insertion (a run whose saturated series is all-False
    is outcome-identical to ``insert_agents``).  With escalation the run is
    ALWAYS outcome-identical and ``saturated`` (float32[]) instead counts
    the extra passes taken this tick (0 = the window sufficed).
    """
    R = road.num_roads
    A = agents.num_agents
    W = min(window, A)

    if sorted_fast:
        # SimConfig.sorted_population: ids 1..A-1 ARE the departure order,
        # so the window is a contiguous id range [start+1, start+1+W) —
        # every window read is a dynamic slice (no gathers) and the
        # inserted-flag write is a dynamic_update_slice (no scatter).  The
        # dummy agent 0 departs past the horizon and is simply never
        # windowed.  ``order`` is ignored.
        W = min(W, A - 1)
        limit = A - 1 - W   # max clamped window start
        static_tab = None
    else:
        limit = A - W
        # ONE row gather of the static per-agent columns.  The stack is
        # loop-invariant when run_episode keeps these arrays out of the
        # scan carry (module docstring); int columns round-trip exactly
        # through f32 for A, N < 2^24.
        static_tab = jnp.stack(
            [
                agents.departure,
                agents.origin.astype(jnp.float32),
                agents.dest.astype(jnp.float32),
            ],
            axis=1,
        )

    agents_static = agents  # immutable columns; `inserted` threads explicitly
    pos_w = jnp.arange(W, dtype=jnp.int32)

    def one_pass(road, inserted, off, stamp_count):
        """One window pass at (clamped) offset ``off``.  Returns
        ``(road, inserted, settled, saturated, start)``."""
        start = jnp.minimum(off, limit).astype(jnp.int32)
        if sorted_fast:
            lo = start + 1
            win_ids = lo + pos_w
            win_dep = jax.lax.dynamic_slice_in_dim(
                agents_static.departure, lo, W
            )
            win_origin = jax.lax.dynamic_slice_in_dim(
                agents_static.origin, lo, W
            )
            win_dest = jax.lax.dynamic_slice_in_dim(agents_static.dest, lo, W)
            win_inserted = jax.lax.dynamic_slice_in_dim(inserted, lo, W)
        else:
            win_ids = jax.lax.dynamic_slice_in_dim(order, start, W).astype(
                jnp.int32
            )
            win_static = static_tab[win_ids]                # [W, 3]
            win_dep = win_static[:, 0]
            win_origin = win_static[:, 1].astype(jnp.int32)
            win_dest = win_static[:, 2].astype(jnp.int32)
            win_inserted = inserted[win_ids]         # dynamic flag gather

        # done => inserted (arrival is stamped strictly after insertion), so
        # the reference's ~ON_WAY & ~DONE readiness (base.py:247-251) is
        # ~inserted.
        ready = (win_dep <= time) & (~win_inserted)
        if entry_lookup is not None:
            win_entry = entry_lookup(win_ids)
        elif entry_road is not None:
            win_entry = entry_road[win_ids]
        else:
            win_entry = selected_road[win_origin]
        valid_road = (win_entry >= 0) & (win_entry < R)
        road_key = jnp.where(
            ready & valid_road, win_entry, R
        ).astype(jnp.int32)

        road, agents2, admitted = _admit_candidates(
            road, agents_static._replace(inserted=inserted), network, time,
            physics, win_ids, road_key, cand_dest=win_dest,
            update_inserted=not sorted_fast, stamp_count=stamp_count,
            compact=compact,
        )
        if sorted_fast:
            inserted = jax.lax.dynamic_update_slice_in_dim(
                inserted, win_inserted | admitted, lo, axis=0
            )
        else:
            inserted = agents2.inserted

        # settled = ON_WAY | DONE = inserted, and post-insert that is
        # exactly (pre-insert inserted) | (admitted this tick) — no
        # re-gather.  The tail agent being DUE (inserted or not) means
        # later departures beyond the window may be due too.
        settled = win_inserted | admitted
        saturated = win_dep[W - 1] <= time
        return road, inserted, settled, saturated, start

    count0 = road.count  # tick-start occupancy (escalation stamp snapshot)
    road, inserted, settled0, sat0, start0 = one_pass(
        road, agents.inserted, ptr.astype(jnp.int32), None
    )

    # Advance past the leading settled run, measured from the actual slice
    # start.  The run length is the first unsettled position — a min-reduce,
    # much cheaper on TPU than the cumprod-and-sum scan (~80 us/tick,
    # measured).
    adv0 = jnp.min(jnp.where(settled0, W, pos_w))

    if not escalate:
        new_ptr = jnp.minimum(start0 + adv0, A).astype(jnp.int32)
        return road, agents._replace(inserted=inserted), new_ptr, sat0

    # --- escalation: more passes while the last window's tail was due and
    # a further window would cover new candidates -------------------------
    def cond_fn(c):
        _road, _ins, _start, sat, _adv, _open, _extra = c
        return sat & (_start < limit)

    def body_fn(c):
        road, inserted, start_prev, _sat, adv, adv_open, extra = c
        off = start_prev + W
        road, inserted, settled, sat, start = one_pass(
            road, inserted, off, count0
        )
        adv_k = jnp.min(jnp.where(settled, W, pos_w))
        # Chain the pointer advance only across contiguous (unclamped)
        # fully-settled windows; a conservative (smaller) ptr is always
        # safe — the next tick just re-examines settled agents.
        contiguous = start == off
        adv = jnp.where(adv_open & contiguous, adv + adv_k, adv)
        adv_open = adv_open & contiguous & (adv_k == W)
        return road, inserted, start, sat, adv, adv_open, extra + 1.0

    road, inserted, _start, _sat, adv, _open, extra = jax.lax.while_loop(
        cond_fn, body_fn,
        (road, inserted, start0, sat0, adv0, adv0 == W,
         jnp.zeros((), jnp.float32)),
    )
    new_ptr = jnp.minimum(start0 + adv, A).astype(jnp.int32)
    return road, agents._replace(inserted=inserted), new_ptr, extra


def backlog_frontier_append(qpack, qcount, qhead, static_tab, ptr, time, *,
                            R: int, window: int, escalate: bool = True):
    """Departure-frontier appends into the per-SRC queues (phase 1 of
    :func:`insert_agents_backlogged`; see its docstring for semantics).

    Pure function of the replicated inputs — reads NO road state — so the
    shard_map episode runs it replicated verbatim and stays bitwise-equal
    to the serial path.  ``static_tab`` is the packed [A, 3]
    (departure, origin, dest) agent row table (float32; int columns
    round-trip exactly for A, N < 2^24).  Returns
    ``(qpack, qcount, new_ptr, overflow)``.
    """
    S, Q, _ = qpack.shape
    A = static_tab.shape[0]
    F = min(window, A - 1)
    pos_f = jnp.arange(F, dtype=jnp.int32)
    # One packed head/count word per SRC (qhead < Q, qcount <= Q: base Q+1
    # fits int32 up to Q ~ 46k) — halves the queue-state gathers per pass.
    qhc = qhead * (Q + 1) + qcount

    def append_pass(c):
        qpack, qhc, ptr, _sat, overflow = c
        lo = jnp.minimum(ptr + 1, A - F).astype(jnp.int32)
        skip = ptr + 1 - lo          # clamped-slice prefix already consumed
        ids = lo + pos_f
        win = jax.lax.dynamic_slice(static_tab, (lo, 0), (F, 3))
        dep = win[:, 0]
        origin = win[:, 1].astype(jnp.int32)
        dest = win[:, 2].astype(jnp.int32)
        fresh = pos_f >= skip
        due = (dep <= time) & fresh
        o = jnp.clip((origin - R) // 2, 0, S - 1)
        # Append rank among earlier due same-SRC slice entries (everything
        # earlier than the stall point is appended, so this is the queue
        # position offset).
        same = (
            (o[None, :] == o[:, None])
            & due[None, :]
            & (pos_f[None, :] < pos_f[:, None])
        )
        rank = jnp.sum(same, axis=1).astype(jnp.int32)
        qhc_o = qhc[o]                               # ONE queue-state gather
        qpos = qhc_o % (Q + 1) + rank
        roomok = qpos < Q
        consumable = (~fresh) | (due & roomok)
        adv = jnp.min(jnp.where(consumable, F, pos_f))
        band = due & roomok & (pos_f < adv)
        rows = jnp.where(band, o, S)                 # S -> dropped
        col = (qhc_o // (Q + 1) + qpos) % Q
        qpack = qpack.at[rows, col].set(
            jnp.stack([ids, dest], axis=-1), mode="drop"
        )
        # count + 1 carries no overflow into the head field: roomok bounds
        # the new count by Q.
        qhc = qhc.at[rows].add(1, mode="drop")
        new_ptr = (lo - 1 + adv).astype(jnp.int32)
        # Full slice consumed -> more agents may be due (re-pass); a stall
        # on a DUE agent is a queue overflow (bounded deviation active).
        sat = (adv == F) & (new_ptr < A - 1)
        due_at_stop = jnp.sum(
            jnp.where(pos_f == adv, due & ~roomok, False)
        )
        return qpack, qhc, new_ptr, sat, \
            overflow + due_at_stop.astype(jnp.float32)

    state0 = append_pass((
        qpack, qhc, ptr.astype(jnp.int32),
        jnp.bool_(True), jnp.zeros((), jnp.float32),
    ))
    if escalate:
        qpack, qhc, new_ptr, _sat, overflow = jax.lax.while_loop(
            lambda c: c[3], append_pass, state0
        )
    else:
        qpack, qhc, new_ptr, _sat, overflow = state0
    return qpack, qhc % (Q + 1), new_ptr, overflow


def insert_agents_backlogged(
    road: RoadState,
    agents: AgentState,
    backlog,                 # state.BacklogState (per-SRC ring queues)
    selected_road: jnp.ndarray,
    network: Network,
    time: jnp.ndarray,
    ptr: jnp.ndarray,        # int32[] — agents 1..ptr already enqueued
    window: int,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    escalate: bool = True,
    compact: int | str | None = "auto",  # drain-scatter compaction budget
    pop_width: int | None = None,
    update_inserted: bool = True,
):
    """Exact insertion via per-SRC candidate queues and a departure frontier.

    The reference re-scans the WHOLE population every tick, so an agent
    blocked by a full entry road keeps re-bidding — with a fresh
    ``SELECTED_ROAD`` read — until capacity frees (agents/base.py:247-299).
    :func:`insert_agents_windowed` reproduces those semantics by pinning
    the window pointer on blocked agents and escalating over them, which at
    a demand-OVERSATURATED peak (the official bench carries ~20-35k due-but-
    blocked agents by hour two) degenerates to ~15 full window passes/tick.

    Key structural fact (state.BacklogState docstring): with the entry rule
    ``entry = SELECTED_ROAD[origin]``, a road is only ever bid by its tail
    SRC node, and all candidates at one SRC bid the SAME road each tick.
    So EVERY due agent — blocked or not — flows through one FIFO ring per
    SRC in ascending-id order:

    1. **Frontier appends**: the departure-sorted population has a monotone
       due frontier; each tick the next ``window``-wide slice past ``ptr``
       is scanned, its due prefix appended to the SRC queues (two
       F-index scatters), and ``ptr`` advances — extra passes via a
       while_loop when more than ``window`` agents become due in one tick.
       No admission logic, no per-candidate road reads, no re-examination.
    2. **Drain**: pops ``min(qcount, remaining, P)`` entries per SRC from
       the queue front straight into the road FIFOs — admission rank IS
       the queue position — repeated while any queue still faces spare
       capacity (one pass in steady state: capacity frees by at most
       withdraw_depth + 1 per road per tick).  The whole backlog's fresh
       entry evaluation costs one ``selected_road`` row per SRC.

    BITWISE-EXACT vs the whole-population :func:`insert_agents`: per-road
    candidates are exactly the SRC queue front-to-back = ascending agent
    id = the reference's stable candidate order for a departure-sorted
    population, admitted as a capacity prefix with live-count slots and
    tick-start-occupancy departure stamps (base.py:313-325).  An agent
    due and admissible the tick it departs IS admitted that tick (appends
    run before the drain).

    REQUIRES ``sorted_population`` and the ``selected_road[origin]`` entry
    rule (policies with per-agent entry roads break the one-road-per-SRC
    invariant; ``tick`` falls back to the windowed path for those).

    The ONE bounded deviation: if an SRC queue overflows its Q slots, the
    frontier pins on the first unqueued agent and later agents (of every
    SRC) wait extra ticks — the same deviation class as the bounded
    window, flagged by the returned ``monitor`` (count of overflow stalls
    this tick; an all-zero run is bitwise reference-exact).  Size Q to the
    scenario (per-SRC peak backlog); the official bench's deepest queue
    holds ~3k of A=50k agents at Q=8192.

    Returns ``(road, agents, backlog, new_ptr, monitor)``.
    """
    import os

    R = road.num_roads
    Nmax = road.nmax
    A = agents.num_agents
    S, Q, _ = backlog.qpack.shape
    if pop_width is None:
        pop_width = int(os.environ.get("TARL_BACKLOG_POP", "4"))
    P = pop_width

    # SRC nodes sit at R, R+2, ..., R+2S-2 — a strided slice, not a gather.
    g = jax.lax.slice(selected_road, (R,), (R + 2 * S,), (2,))  # the re-bid
    gvalid = (g >= 0) & (g < R)
    g_safe = jnp.where(gvalid, g, 0)
    count0 = road.count                               # stamp snapshot
    cap_f = network.capacity
    buf = physics.congestion_buffer
    compact = _resolve_compact(
        "auto" if compact is None else compact, S * P
    )

    # --- 1. frontier appends ------------------------------------------------
    # One packed [A, 3] row table (dep/origin/dest) — loop-invariant when
    # run_episode keeps the static agent columns out of the scan carry, so
    # the stack hoists and each pass reads ONE dynamic slice instead of
    # three (int columns round-trip exactly through f32 for A, N < 2^24).
    static_tab = jnp.stack(
        [
            agents.departure,
            agents.origin.astype(jnp.float32),
            agents.dest.astype(jnp.float32),
        ],
        axis=1,
    )
    qpack, qcount, new_ptr, overflow = backlog_frontier_append(
        backlog.qpack, backlog.qcount, backlog.qhead, static_tab,
        ptr, time, R=R, window=window, escalate=escalate,
    )

    # --- 2. drain: queue front -> road FIFOs --------------------------------
    # r5 consolidation (VERDICT r4 #6, the r3 insert recipe applied to the
    # backlog tick): the per-SRC loop-invariant reads collapse into TWO row
    # gathers — one packed head/count word (both < Nmax+1) and one static
    # [R, 3] row of the hoisted road table; the per-pass ``count[g_safe]``
    # re-gather becomes a LOCAL ``cnt_s`` vector (sound because a road is
    # only ever bid by its tail SRC, so drained rows are distinct and no
    # other writer touches them inside the loop); the road.count
    # scatter-add moves OUT of the loop (one scatter of the per-SRC take
    # totals); and at S*P >= 4096 candidates the four FIFO scatters run
    # COMPACTED (stable top_k of the active flags — the insert_compact /
    # withdraw_compact trick; overflow ticks take the full scatter through
    # lax.cond, bitwise-identical either way).  Departure stamps unchanged:
    # tick-start occupancy (base.py:313-325).
    hc0 = road.head * (Nmax + 1) + count0              # [R] elementwise pack
    if (Nmax + 1) ** 2 < 2 ** 24:
        # Fold the dynamic head/count word into the static row table so ONE
        # [S, 4] row gather serves all four per-SRC reads (the packed word
        # round-trips exactly through f32 below 2^24; the [R, 4] concat is
        # a cheap per-tick vector op).
        tab4 = jnp.concatenate(
            [_road_static_tab(network), hc0.astype(jnp.float32)[:, None]],
            axis=1,
        )
        rs_g = tab4[g_safe]                            # [S, 4] one row gather
        hc_g = rs_g[:, 3].astype(jnp.int32)
    else:
        rs_g = _road_static_tab(network)[g_safe]       # [S, 3] row gather
        hc_g = hc0[g_safe]                             # + one [S] gather
    head_g = hc_g // (Nmax + 1)                        # static during insert
    c0_s = hc_g % (Nmax + 1)                           # tick-start count
    cap_g, cc_g, ff_g = rs_g[:, 0], rs_g[:, 1], rs_g[:, 2]
    tt_g = jnp.maximum(
        ff_g,
        cc_g / (cap_g + physics.congestion_softening
                - c0_s.astype(jnp.float32)),
    )
    dep_stamp_g = time + tt_g                          # [S]
    pcol = jnp.arange(P, dtype=jnp.int32)[None, :]
    rem_cap = (cap_g - buf).astype(jnp.int32)          # loop-invariant

    def drain_cond(c):
        fids, farr, fdep, fdst, cnt_s, qhead, qc, ins = c
        return jnp.any(gvalid & (qc > 0) & (rem_cap > cnt_s))

    def drain_body(c):
        fids, farr, fdep, fdst, cnt_s, qhead, qc, ins = c
        rem = rem_cap - cnt_s
        take = jnp.clip(jnp.minimum(qc, rem), 0, P)
        take = jnp.where(gvalid, take, 0)
        # NOTE (r5 negative result, measured on chip at Grid256/2M): a
        # masked one-hot row-reduction form of this front read ("the
        # _row_at ring rule") costs P*S*Q select traffic and measured
        # 12.4 ms/tick exact vs 8.8 with the gather — the 7 ns/element
        # serial gather WINS at ring width Q=256; the rule only holds for
        # narrow rings (road Nmax).
        phys = (qhead[:, None] + pcol) % Q             # [S, P]
        pk = jnp.take_along_axis(qpack, phys[:, :, None], axis=1)  # [S,P,2]
        ids_p = pk[..., 0].reshape(-1)
        dst_p = pk[..., 1].reshape(-1)
        active = (pcol < take[:, None]).reshape(-1)
        slot = ((head_g[:, None] + cnt_s[:, None] + pcol) % Nmax).reshape(-1)
        rows = jnp.where(
            active, jnp.broadcast_to(g_safe[:, None], (S, P)).reshape(-1), R
        )                                              # R -> dropped
        dep_p = jnp.broadcast_to(dep_stamp_g[:, None], (S, P)).reshape(-1)

        def _fifo_write(rws, slt, ids_v, dst_v, dep_v, ins_ids, c4):
            fids, farr, fdep, fdst, ins = c4
            fids = fids.at[rws, slt].set(ids_v, mode="drop")
            farr = farr.at[rws, slt].set(
                jnp.broadcast_to(time, ids_v.shape), mode="drop"
            )
            fdep = fdep.at[rws, slt].set(dep_v, mode="drop")
            fdst = fdst.at[rws, slt].set(dst_v, mode="drop")
            if update_inserted:
                ins = ins.at[ins_ids].set(1, mode="drop")
            return fids, farr, fdep, fdst, ins

        c4 = (fids, farr, fdep, fdst, ins)
        if compact is not None and 0 < compact < S * P:
            flags = active.astype(jnp.int32)
            topf, topi = jax.lax.top_k(flags, compact)
            selm = topf > 0
            c_rows = jnp.where(selm, rows[topi], R)
            fids, farr, fdep, fdst, ins = jax.lax.cond(
                jnp.sum(flags) <= compact,
                lambda c4: _fifo_write(
                    c_rows, slot[topi], ids_p[topi], dst_p[topi],
                    dep_p[topi],
                    jnp.where(c_rows < R, ids_p[topi], A), c4,
                ),
                lambda c4: _fifo_write(
                    rows, slot, ids_p, dst_p, dep_p,
                    jnp.where(active, ids_p, A), c4,
                ),
                c4,
            )
        else:
            fids, farr, fdep, fdst, ins = _fifo_write(
                rows, slot, ids_p, dst_p, dep_p,
                jnp.where(active, ids_p, A), c4,
            )
        cnt_s = cnt_s + take
        qhead = (qhead + take) % Q
        qc = qc - take
        return fids, farr, fdep, fdst, cnt_s, qhead, qc, ins

    ins0 = jnp.zeros((A if update_inserted else 1,), jnp.int32)
    fids, farr, fdep, fdst, cnt_s, qhead, qcount, ins = jax.lax.while_loop(
        drain_cond, drain_body,
        (road.fifo_ids, road.fifo_arrival, road.fifo_departure,
         road.fifo_dest, c0_s, backlog.qhead, qcount, ins0),
    )
    total_take = cnt_s - c0_s                          # per-SRC drain totals
    scat_rows = jnp.where(total_take > 0, g_safe, R)
    if compact is not None and 0 < compact < S:
        # The per-tick drain touches far fewer SRCs than exist at metro
        # scale — compact the [S]-index count scatter like the FIFO writes
        # (bitwise-identical; the full scatter runs on overflow ticks).
        flags = (total_take > 0).astype(jnp.int32)
        topf, topi = jax.lax.top_k(flags, compact)
        count = jax.lax.cond(
            jnp.sum(flags) <= compact,
            lambda c: c.at[jnp.where(topf > 0, g_safe[topi], R)].add(
                total_take[topi], mode="drop"),
            lambda c: c.at[scat_rows].add(total_take, mode="drop"),
            count0,
        )
    else:
        count = count0.at[scat_rows].add(total_take, mode="drop")
    road = road._replace(fifo_ids=fids, fifo_arrival=farr,
                         fifo_departure=fdep, fifo_dest=fdst, count=count)
    if update_inserted:
        agents = agents._replace(inserted=agents.inserted | (ins > 0))
    # else: the flag is maintained LAZILY — nothing inside the backlog tick
    # reads it (readiness is the frontier + queue membership; withdraw
    # stamps arrival; metrics use road.count) — and the episode drivers
    # reconstruct it exactly via `reconstruct_inserted` after the scan.
    backlog = backlog._replace(qpack=qpack, qhead=qhead, qcount=qcount)
    return road, agents, backlog, new_ptr, overflow


def reconstruct_inserted(agents: AgentState, backlog, ptr) -> AgentState:
    """Closed form of the inserted flag under backlog insertion:
    ``inserted[i] == (1 <= i <= ptr) & (i not in any SRC queue)`` — every
    frontier-consumed agent was either popped onto the network (inserted)
    or still waits in its SRC queue.  Exact and idempotent; episode
    drivers call it once per scan instead of scattering the flag per tick.
    """
    A = agents.num_agents
    S, Q, _ = backlog.qpack.shape
    iota = jnp.arange(A, dtype=jnp.int32)
    base = (iota >= 1) & (iota <= ptr)
    qpos = jnp.arange(Q, dtype=jnp.int32)[None, :]
    in_ring = ((qpos - backlog.qhead[:, None]) % Q) < backlog.qcount[:, None]
    ids = jnp.where(in_ring, backlog.qids, A)
    inq = jnp.zeros((A,), jnp.int32).at[ids.reshape(-1)].set(1, mode="drop")
    return agents._replace(inserted=base & (inq == 0))
