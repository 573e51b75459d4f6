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

# Depth above which the per-slot unroll is replaced by the vectorized gather
# form (compile-size / CPU-runtime guard; see withdraw_agents).
_SLOT_UNROLL_MAX = 16

# compact="auto": candidate-list size (R * depth) at which the arrival
# scatter switches to the top_k-compacted 256-index form.  Gated at 4x the
# budget: below that the scatter is already small and the top_k pass is pure
# overhead; both measured wins sit above it (Grid16x16 R*K=1920: official
# bench 438 -> 448M agent-steps/s; Grid64x64 R*K=32768: withdraw phase
# 179 -> 47 us/tick, scripts/ablate_roll.py).
_COMPACT_AUTO_BUDGET = 256
_COMPACT_AUTO_MIN = 4 * _COMPACT_AUTO_BUDGET


def withdraw_agents(
    road: RoadState,
    agents: AgentState,
    network: Network,
    time: jnp.ndarray,
    depth: int | None = None,
    compact: int | str | None = "auto",
    escalate: bool = False,
) -> tuple[RoadState, AgentState, jnp.ndarray]:
    """Withdraw all consecutive-from-head arrived agents.

    Parameters
    ----------
    depth:
        Maximum FIFO slots scanned per road per tick.  ``None`` scans the full
        queue (the reference semantics, base.py:364-371); a small static bound
        caps per-tick memory traffic for very deep queues at the cost of
        spreading bursts over consecutive ticks.
    escalate:
        Self-heal a bounded ``depth`` to exactness: whenever some road's pop
        run hit the depth bound this tick (``wcount == depth`` — the run MAY
        continue past the scanned slots), run additional scan passes from
        the advanced heads until no road saturates.  Passes compose exactly
        (the leading eligible run is popped in order; eligibility depends
        only on the tick clock and static ring content), so any depth
        becomes outcome-identical to the unbounded scan; non-saturated
        ticks pay one ``while_loop`` predicate
        (tests/test_core_physics.py::test_withdraw_escalation).
    compact:
        Static budget for the arrival-stamp scatter (SimConfig.
        withdraw_compact).  The ``[R*depth]`` candidate list is mostly
        sentinels — a tick pops roughly the arrival rate, tens of agents —
        while the scatter pays the TPU serial-emitter cost per INDEX.  With a
        budget, ``lax.top_k`` over the is-real flags pulls the (at most
        ``compact``) real entries to the front and the scatter shrinks to
        ``compact`` indices; a tick whose true pop count overflows the budget
        takes the full scatter through ``lax.cond`` — outcomes are
        bitwise-identical at every budget.  The default ``"auto"`` enables a
        256-index budget once the candidate list exceeds
        ``_COMPACT_AUTO_MIN`` entries (measured 179 → 47 µs/tick on the
        withdraw phase at Grid64x64/depth=2, scripts/ablate_roll.py) and
        stays on the plain scatter for small networks where the ``top_k``
        overhead is not worth it; ``None`` disables unconditionally.

    Returns ``(road, agents, withdraw_counts)`` where ``withdraw_counts`` is
    int32[R] agents popped per road this tick; ``withdraw_counts > 0`` is the
    mask the reference appends to ``withdraw_history`` (base.py:402), and its
    sum feeds the incremental DONE counter (no O(A) reduction per tick).
    """
    R = road.num_roads
    Nmax = road.nmax
    A = agents.num_agents
    K = Nmax if depth is None else min(depth, Nmax)
    if isinstance(compact, str):
        if compact != "auto":
            raise ValueError(f"withdraw compact: {compact!r} (int|None|'auto')")
        compact = _COMPACT_AUTO_BUDGET if R * K >= _COMPACT_AUTO_MIN else None

    # Ring reads as masked row-reductions over the logical-position matrix —
    # never per-row gathers (TPU's serial gather emitter costs more than the
    # whole tick at large R; see state.RoadState._row_at).  All K extractions
    # share one pass over the FIFO arrays.  For large/unbounded depth the
    # slot unroll would blow up the program (and XLA:CPU compile time), so
    # past _SLOT_UNROLL_MAX the vectorized [R, K] gather form is used
    # instead — bounded-depth TPU runs stay on the unrolled path.
    def _scan(head, count):
        if K <= _SLOT_UNROLL_MAX:
            col = jnp.arange(Nmax, dtype=jnp.int32)[None, :]
            lp = (col - head[:, None]) % Nmax  # [R, Nmax] logical position
            run = jnp.ones((R,), bool)  # consecutive-from-head run (base.py:370)
            wid_rows = []
            for k in range(K):
                at_k = lp == k
                ids_k = jnp.where(at_k, road.fifo_ids, 0).sum(axis=1)
                dep_k = jnp.where(at_k, road.fifo_departure, 0.0).sum(axis=1)
                dest_k = jnp.where(at_k, road.fifo_dest, 0).sum(axis=1)
                eligible = (
                    (dest_k == network.road_dest)
                    & (dep_k <= time)
                    & (k < count)
                )
                run = run & eligible
                wid_rows.append(jnp.where(run, ids_k, A))  # A -> dropped
            wcount = sum(r < A for r in wid_rows).astype(jnp.int32)
            wids = jnp.concatenate(wid_rows)
        else:
            logical = jnp.arange(K, dtype=jnp.int32)
            phys = (head[:, None] + logical[None, :]) % Nmax  # [R, K]
            ids = jnp.take_along_axis(road.fifo_ids, phys, axis=1)
            dep = jnp.take_along_axis(road.fifo_departure, phys, axis=1)
            dest = jnp.take_along_axis(road.fifo_dest, phys, axis=1)
            eligible = (
                (dest == network.road_dest[:, None])
                & (dep <= time)
                & (logical[None, :] < count[:, None])
            )
            cum = jnp.cumprod(eligible.astype(jnp.int32), axis=1).astype(bool)
            wcount = cum.sum(axis=1).astype(jnp.int32)
            wids = jnp.where(cum, ids, A).reshape(-1)  # A -> dropped
        return wids, wcount

    # Stamp arrival (base.py:398-400).  DONE/ON_WAY are derived from it
    # (state.AgentState), so this ONE scatter replaces the reference's three
    # agent-column writes — withdraw is the largest tick phase on TPU.
    def _stamp(arrival, wids, total):
        if compact is not None and 0 < compact < wids.size:
            import jax

            # Pull the real entries (wids < A) to the front: top_k on the
            # flags is index-stable, so topi enumerates real positions in
            # order.  All pops this tick stamp the same time, so order is
            # immaterial anyway.
            flags = (wids < A).astype(jnp.int32)
            topf, topi = jax.lax.top_k(flags, compact)
            cids = jnp.where(topf > 0, wids[topi], A)  # A -> dropped

            def _compact(arr):
                return arr.at[cids].set(
                    jnp.broadcast_to(time, cids.shape), mode="drop"
                )

            def _full(arr):
                return arr.at[wids].set(
                    jnp.broadcast_to(time, wids.shape), mode="drop"
                )

            return jax.lax.cond(total <= compact, _compact, _full, arrival)
        return arrival.at[wids].set(
            jnp.broadcast_to(time, wids.shape), mode="drop"
        )

    wids, wcount = _scan(road.head, road.count)
    arrival = _stamp(agents.arrival, wids, jnp.sum(wcount))
    # Pop: advance head pointers, nothing else moves.
    head = (road.head + wcount) % Nmax
    count = road.count - wcount

    if escalate and K < Nmax:
        import jax

        def cond_fn(c):
            return jnp.any(c[4] == K)

        def body_fn(c):
            head, count, arrival, total, _last = c
            wids_k, w_k = _scan(head, count)
            arrival = _stamp(arrival, wids_k, jnp.sum(w_k))
            return ((head + w_k) % Nmax, count - w_k, arrival,
                    total + w_k, w_k)

        head, count, arrival, wcount, _ = jax.lax.while_loop(
            cond_fn, body_fn, (head, count, arrival, wcount, wcount)
        )

    return (
        road._replace(head=head, count=count),
        agents._replace(arrival=arrival),
        wcount,
    )
