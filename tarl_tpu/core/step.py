"""Tick composition and the fused episode driver.

The reference's per-tick host loop (``TransportationSimulator.run``,
transportation_simulator.py:294-351: insert -> withdraw -> choice -> core,
then clock advance and metric appends) becomes a pure function
``tick(state) -> (state, TickLog)`` compiled once and driven by ``lax.scan``,
so a whole episode (86,400 ticks by default, main.py:12) executes on device
with zero host round-trips.

The RL environment uses a different phase order (choice -> core -> withdraw ->
insert, reinforcement_learning.py:222-254); that composition lives in
:mod:`tarl_tpu.rl.env`.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import PhysicsConfig, SimConfig, DEFAULT_PHYSICS, DEFAULT_SIM
from ..network import Network, default_selected_road
from ..state import (
    AgentState,
    MetricState,
    SimState,
    TickLog,
    init_backlog_state,
    init_metric_state,
    init_road_state,
)
from .direction import direction_step
from .insert import insert_agents
from .response import confirm_step
from .withdraw import withdraw_agents


class Policy(NamedTuple):
    """A route-choice policy as pure functions (see routing.policies).

    ``entry`` (optional) maps state -> per-agent entry road [A] used at
    insertion; ``entry_lookup`` (optional) is the O(W) variant
    ``(state, network, agent_ids) -> roads`` used by windowed insertion so
    the per-tick cost stays independent of the population size;
    ``needs_next_hop`` requests the dense next-hop table in the scan carry;
    ``table_init`` (optional) overrides how the routing scratch
    (``state.next_hop``) is initialized — e.g. the primal backend's packed
    dist/cost buffer (routing.policies.primal_table_init);
    ``learned`` (optional) carries the :class:`~tarl_tpu.rl.learned_policy.
    LearnedSpec` of a trained neural policy so parallel episode drivers can
    re-derive the forward pass shard-locally (the spec hashes by identity,
    keeping Policy usable as a static jit argument).

    ``refresh``/``lookup``/``periodic_rate`` (optional) split a periodic-
    refresh choice into its two phases so :func:`run_episode_periodic` can
    hoist the table rebuild out of the tick scan: ``refresh(state, network)
    -> buf`` unconditionally rebuilds the routing scratch from the current
    road state, ``lookup(state, network, buf) -> state`` performs the
    per-tick SELECTED_ROAD write (incrementing ``choice_count`` but NOT
    touching ``state.next_hop``), and ``choice`` must equal
    lookup∘(cond refresh) so the two drivers are bitwise-interchangeable.
    """

    choice: object                # ChoiceFn
    entry: Optional[object] = None
    entry_lookup: Optional[object] = None
    needs_next_hop: bool = False
    table_init: Optional[object] = None
    learned: Optional[object] = None
    refresh: Optional[object] = None
    lookup: Optional[object] = None
    periodic_rate: Optional[int] = None


def init_sim_state(
    network: Network,
    agents: AgentState,
    *,
    sim: SimConfig = DEFAULT_SIM,
    policy: Optional[Policy] = None,
    key: Optional[jax.Array] = None,
    next_hop: Optional[jnp.ndarray] = None,
) -> SimState:
    """Fresh :class:`SimState` at ``sim.start_time``."""
    if key is None:
        key = jax.random.PRNGKey(sim.seed)
    backlog = None
    if sim.insert_backlog is not None:
        if not (sim.sorted_population and sim.insert_window is not None):
            raise ValueError(
                "insert_backlog requires sorted_population and insert_window"
            )
        if policy is not None and (
            policy.entry is not None or policy.entry_lookup is not None
        ):
            raise ValueError(
                "insert_backlog requires the selected_road[origin] entry "
                "rule (per-SRC queue invariant); this policy supplies "
                "per-agent entry roads — use insert_escalate instead"
            )
        backlog = init_backlog_state(
            sim.insert_backlog, agents.num_agents,
            network.num_intersections,
        )
    if next_hop is None:
        if policy is not None and policy.table_init is not None:
            next_hop = policy.table_init(network)
        elif policy is not None and policy.needs_next_hop:
            from ..routing.bellman_ford import all_pairs_next_hop_nbr

            _, next_hop = all_pairs_next_hop_nbr(
                network.nbr, network.nbr_ok, network.entry_cost()
            )
        else:
            next_hop = jnp.zeros((1, 1), dtype=jnp.int32)
    # Incremental-lookup scratch for shortest-path policies: -1 == stale
    # (the first lookup takes the full pass through its over-budget cond).
    sel_dest = None
    if policy is not None and (
        policy.needs_next_hop or policy.table_init is not None
    ):
        sel_dest = jnp.full((network.num_roads,), -1, jnp.int32)
    return SimState(
        road=init_road_state(network.num_roads, network.nmax),
        agents=agents,
        selected_road=default_selected_road(network),
        time=jnp.asarray(float(sim.start_time), jnp.float32),
        key=key,
        metrics=init_metric_state(network.num_roads, sim.num_hours),
        next_hop=next_hop,
        choice_count=jnp.zeros((), jnp.int32),
        insert_order=jnp.argsort(agents.departure, stable=True).astype(jnp.int32),
        insert_ptr=jnp.zeros((), jnp.int32),
        backlog=backlog,
        sel_dest=sel_dest,
    )


def reset_sim_state(state: SimState, start_time) -> SimState:
    """Clear queues, agent progress and metric accumulators
    (TransportationSimulator.reset, ts.py:353-358 + Agents.reset,
    base.py:497-503)."""
    R, Nmax = state.road.fifo_ids.shape
    H = state.metrics.hourly_counts.shape[0]
    return state._replace(
        road=init_road_state(R, Nmax),
        agents=state.agents._replace(
            inserted=jnp.zeros_like(state.agents.inserted),
            arrival=jnp.zeros_like(state.agents.arrival),
        ),
        time=jnp.asarray(start_time, jnp.float32),
        metrics=init_metric_state(R, H),
        choice_count=jnp.zeros((), jnp.int32),
        insert_ptr=jnp.zeros((), jnp.int32),
        backlog=None if state.backlog is None else init_backlog_state(
            state.backlog.capacity, state.agents.num_agents,
            state.backlog.qpack.shape[0],
        ),
        sel_dest=None if state.sel_dest is None else jnp.full_like(
            state.sel_dest, -1
        ),
    )


def tick(
    state: SimState,
    network: Network,
    policy: Policy,
    sim: SimConfig = DEFAULT_SIM,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    choice_fn=None,
    lazy_inserted: bool = False,
) -> tuple[SimState, TickLog]:
    """One simulation tick in the classical order insert -> withdraw ->
    choice -> core (transportation_simulator.py:294-324), followed by the
    clock advance and metric updates (ts.py:342-351).

    ``choice_fn`` overrides ``policy.choice`` (same signature); used by
    :func:`run_episode_periodic` to swap in the refresh/lookup phase
    variants without rebuilding the Policy (which is a static jit arg).

    ``lazy_inserted`` (backlog mode only): skip the per-tick inserted-flag
    scatter — nothing inside the backlog tick reads the flag, and the
    episode drivers reconstruct it exactly once per scan
    (core.insert.reconstruct_inserted).  Standalone tick() keeps the flag
    live by default."""
    t = state.time

    # --- insert (agents/base.py:244-331) ---
    insert_ptr = state.insert_ptr
    backlog = state.backlog
    saturated = jnp.zeros((), jnp.float32)
    if sim.insert_window is not None:
        if policy.entry_lookup is not None:
            entry_fn = lambda ids: policy.entry_lookup(state, network, ids)  # noqa: E731
        elif policy.entry is not None:
            full_entry = policy.entry(state, network)
            entry_fn = lambda ids: full_entry[ids]  # noqa: E731
        else:
            entry_fn = None
        if sim.insert_backlog is not None and backlog is not None:
            from .insert import insert_agents_backlogged

            assert entry_fn is None, (
                "insert_backlog needs the selected_road[origin] entry rule"
            )
            road, agents, backlog, insert_ptr, sat = (
                insert_agents_backlogged(
                    state.road, state.agents, backlog, state.selected_road,
                    network, t, state.insert_ptr, sim.insert_window, physics,
                    escalate=sim.insert_escalate,
                    compact=sim.insert_compact,
                    update_inserted=not lazy_inserted,
                )
            )
        else:
            from .insert import insert_agents_windowed

            road, agents, insert_ptr, sat = insert_agents_windowed(
                state.road, state.agents, state.selected_road, network, t,
                state.insert_order, state.insert_ptr, sim.insert_window,
                physics,
                entry_lookup=entry_fn, sorted_fast=sim.sorted_population,
                escalate=sim.insert_escalate, compact=sim.insert_compact,
            )
        # Under escalation `sat` counts extra passes (run stays exact); the
        # plain window reports the saturation monitor bool.
        saturated = sat.astype(jnp.float32)
    else:
        entry_road = (
            policy.entry(state, network) if policy.entry is not None else None
        )
        # No compaction on the whole-population path: the top_k pass would
        # scan all A candidates every tick, typically costing more than the
        # scatter it replaces (this path is the small-scenario/parity one).
        road, agents = insert_agents(
            state.road, state.agents, state.selected_road, network, t, physics,
            entry_road=entry_road,
        )

    # --- withdraw (agents/base.py:334-403) ---
    road, agents, wcount = withdraw_agents(
        road, agents, network, t, depth=sim.withdraw_depth,
        compact=sim.withdraw_compact, escalate=sim.withdraw_escalate,
    )
    withdrawn = wcount > 0
    state = state._replace(road=road, agents=agents)

    # --- choice (agents/base.py:446-494 / 519-584) ---
    state, _ = (choice_fn or policy.choice)(state, network)

    # --- core: direction + response (simulation_core_model.py:41-83) ---
    key, k_dir = jax.random.split(state.key)
    want_delta = sim.record_road_optimality or sim.record_road_optimality_hourly
    if (
        sim.fused_core
        and jax.default_backend() == "tpu"  # Pallas compiles on TPU only
        # The fused kernel's one-hot Gumbel-max materializes
        # [TILE_E, r_pad] f32 tiles in VMEM; past ~4k roads that blows the
        # scoped-vmem limit (measured 63 MB at Grid64x64) and the XLA
        # direction+confirm path is faster anyway (the one-hot is O(E*R)).
        and network.num_roads <= 4096
    ):
        from .fused_core import fused_core_step

        road, popped, road_delta_tt = fused_core_step(
            state.road, state.selected_road, network, t, k_dir, physics,
            compute_delta=want_delta,
        )
    else:
        from .fused_winner import fused_winner_ok, fused_winner_tiled_ok

        if fused_winner_ok(network):
            # Metro scale: the whole roll/eligibility/winner/confirm
            # mid-section (~100 launch-bound XLA kernels, ~550 of the
            # 575 us core at Grid64x64) runs as ONE Pallas kernel —
            # bitwise-identical outputs (core/fused_winner.py).
            from .fused_winner import direction_confirm_fused

            road, road_delta_tt, _accept, _win, popped = (
                direction_confirm_fused(
                    state.road, state.selected_road, network, t, k_dir,
                    physics, compute_delta=want_delta,
                )
            )
        elif fused_winner_tiled_ok(network):
            # Opt-in (TARL_FUSED_TILED=1): rotations as static XLA rolls,
            # the columnwise remainder as two grid-tiled Pallas kernels —
            # same bitwise outputs at any R.  Measured SLOWER than the XLA
            # roll path at Grid256 (see fused_winner_tiled_ok), so the
            # default past the single-block VMEM gate stays XLA.
            from .fused_winner import direction_confirm_fused_tiled

            road, road_delta_tt, _accept, _win, popped = (
                direction_confirm_fused_tiled(
                    state.road, state.selected_road, network, t, k_dir,
                    physics, compute_delta=want_delta,
                )
            )
        else:
            road, road_delta_tt, accept, win_src = direction_step(
                state.road, state.selected_road, network, t, k_dir, physics,
                compute_delta=want_delta,
            )
            road, popped = confirm_step(road, accept, win_src, network)

    # --- clock + metrics (ts.py:342-351) ---
    new_time = t + sim.timestep
    hour = jnp.clip(
        (t / 3600.0).astype(jnp.int32), 0, sim.num_hours - 1
    )
    traversals = (withdrawn | popped).astype(jnp.int32)
    metrics = state.metrics
    hourly = metrics.hourly_counts.at[hour].add(traversals)
    delta_hourly = metrics.delta_tt_hourly
    if sim.record_road_optimality_hourly and road_delta_tt.shape[0]:
        delta_hourly = delta_hourly.at[hour].add(road_delta_tt)
    if not sim.record_road_optimality:
        # Per-tick [T, R] series not requested: keep the scan output empty.
        road_delta_tt = jnp.zeros((0,), jnp.float32)

    on_way_total = jnp.sum(road.count).astype(jnp.float32)
    # Incremental DONE counter: avoids an O(A) reduction every tick.
    done_total = metrics.done_before + jnp.sum(wcount).astype(jnp.float32)
    departures = (
        on_way_total - metrics.on_way_before + done_total - metrics.done_before
    )
    arrivals = done_total - metrics.done_before

    new_state = state._replace(
        road=road,
        agents=agents,
        time=new_time,
        key=key,
        insert_ptr=insert_ptr,
        backlog=backlog,
        metrics=MetricState(
            hourly_counts=hourly,
            on_way_before=on_way_total,
            done_before=done_total,
            delta_tt_hourly=delta_hourly,
        ),
    )
    log = TickLog(
        departures=departures,
        arrivals=arrivals,
        on_way=on_way_total,
        time=new_time,
        road_delta_tt=road_delta_tt,
        window_saturated=saturated,
    )
    return new_state, log


@functools.partial(
    jax.jit, static_argnames=("policy", "sim", "physics", "num_steps")
)
def run_episode(
    state: SimState,
    network: Network,
    policy: Policy,
    num_steps: int,
    sim: SimConfig = DEFAULT_SIM,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
) -> tuple[SimState, TickLog]:
    """Run ``num_steps`` ticks as one fused ``lax.scan`` (the reference's
    ``run_episode`` host loop, algorithms/base_runner.py:42-43, on device).

    Only the DYNAMIC agent columns (``arrival``, ``inserted``) ride the scan
    carry; the static ones (origin/dest/departure/demographics) and the
    departure-sorted ``insert_order`` are closed over as scan constants, so
    loop-invariant derived tables — e.g. windowed insertion's packed
    ``[A, 3]`` agent row (core.insert) — hoist out of the loop instead of
    being rebuilt every tick."""
    ag = state.agents
    order_const = state.insert_order

    def assemble(carry) -> SimState:
        (road, arrival, inserted, selected_road, time, key, metrics,
         next_hop, choice_count, insert_ptr, backlog, sel_dest) = carry
        return SimState(
            road=road,
            agents=ag._replace(arrival=arrival, inserted=inserted),
            selected_road=selected_road,
            time=time,
            key=key,
            metrics=metrics,
            next_hop=next_hop,
            choice_count=choice_count,
            insert_order=order_const,
            insert_ptr=insert_ptr,
            backlog=backlog,
            sel_dest=sel_dest,
        )

    def disassemble(s: SimState):
        return (s.road, s.agents.arrival, s.agents.inserted, s.selected_road,
                s.time, s.key, s.metrics, s.next_hop, s.choice_count,
                s.insert_ptr, s.backlog, s.sel_dest)

    lazy = sim.insert_backlog is not None and state.backlog is not None

    def body(carry, _):
        s, log = tick(assemble(carry), network, policy, sim, physics,
                      lazy_inserted=lazy)
        return disassemble(s), log

    carry, logs = jax.lax.scan(body, disassemble(state), length=num_steps)
    final = assemble(carry)
    if lazy:
        from .insert import reconstruct_inserted

        final = final._replace(agents=reconstruct_inserted(
            final.agents, final.backlog, final.insert_ptr
        ))
    return final, logs


@functools.partial(
    jax.jit, static_argnames=("policy", "sim", "physics", "num_steps")
)
def run_episode_periodic(
    state: SimState,
    network: Network,
    policy: Policy,
    num_steps: int,
    sim: SimConfig = DEFAULT_SIM,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
) -> tuple[SimState, TickLog]:
    """:func:`run_episode` with the routing refresh HOISTED out of the tick
    scan — bitwise-identical results, one less per-tick cost.

    The plain driver evaluates ``lax.cond(count % rate == 0, refresh, id)``
    on the routing scratch every tick; on TPU the identity arm of a cond
    whose operand is the multi-hundred-MB packed primal buffer costs a
    buffer copy per tick (~0.2-0.4 ms at Grid64x64, docs/BENCH.md).  Here
    the episode runs as ``num_steps // rate`` periods: the period's first
    tick refreshes unconditionally (``policy.refresh``), and the remaining
    ``rate - 1`` ticks run in an inner ``lax.scan`` whose body CLOSES OVER
    the fresh table — a loop-invariant input, not a carry — executing only
    ``policy.lookup``.  The big buffer rides the outer carry (once per
    period, needed for the warm start), never the inner one.

    Preconditions (checked statically where possible):

    * ``policy.refresh``/``policy.lookup``/``policy.periodic_rate`` are set
      (routing.policies attaches them to every shortest-path choice);
    * ``num_steps % periodic_rate == 0``;
    * ``state.choice_count % periodic_rate == 0`` on entry — holds
      inductively when every chunk of an episode satisfies the previous
      condition (asserted by the caller contract, not traceable here).

    Equality with :func:`run_episode` is pinned by
    tests/test_routing.py::TestPeriodicEpisode on both primal backends and
    the dual backend.
    """
    rate = policy.periodic_rate
    if not rate or policy.refresh is None or policy.lookup is None:
        raise ValueError("policy carries no periodic refresh/lookup split")
    if num_steps % rate != 0:
        raise ValueError(
            f"num_steps={num_steps} not a multiple of periodic_rate={rate}"
        )
    n_periods = num_steps // rate
    ag = state.agents
    order_const = state.insert_order

    def assemble(carry, next_hop) -> SimState:
        (road, arrival, inserted, selected_road, time, key, metrics,
         choice_count, insert_ptr, backlog, sel_dest) = carry
        return SimState(
            road=road,
            agents=ag._replace(arrival=arrival, inserted=inserted),
            selected_road=selected_road,
            time=time,
            key=key,
            metrics=metrics,
            next_hop=next_hop,
            choice_count=choice_count,
            insert_order=order_const,
            insert_ptr=insert_ptr,
            backlog=backlog,
            sel_dest=sel_dest,
        )

    def disassemble(s: SimState):
        return (s.road, s.agents.arrival, s.agents.inserted, s.selected_road,
                s.time, s.key, s.metrics, s.choice_count, s.insert_ptr,
                s.backlog, s.sel_dest)

    import inspect

    _lookup_takes_full = "force_full" in inspect.signature(
        policy.lookup
    ).parameters

    def refresh_choice(s: SimState, net: Network):
        buf = policy.refresh(s, net)
        # A fresh table invalidates every cached selection: the incremental
        # lookup must take its full pass on refresh ticks.
        if _lookup_takes_full:
            s2 = policy.lookup(s, net, buf, force_full=True)
        else:
            s2 = policy.lookup(s, net, buf)
        return s2._replace(next_hop=buf), None

    def outer(carry, _):
        nh, rest = carry
        s = assemble(rest, nh)
        # Period tick 0: the refresh fires at the CHOICE phase (after this
        # tick's insert/withdraw), exactly where the plain driver's cond
        # fires — insert still routes entrants through the previous table.
        s1, log0 = tick(s, network, policy, sim, physics,
                        choice_fn=refresh_choice)
        buf = s1.next_hop

        def lookup_choice(s2, net):
            return policy.lookup(s2, net, buf), None

        def inner(c, _):
            s2, lg = tick(assemble(c, buf), network, policy, sim, physics,
                          choice_fn=lookup_choice)
            return disassemble(s2), lg

        c2, logs = jax.lax.scan(inner, disassemble(s1), length=rate - 1)
        period_logs = jax.tree.map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), log0, logs
        )
        return (buf, c2), period_logs

    (nh_f, rest_f), logs = jax.lax.scan(
        outer, (state.next_hop, disassemble(state)), length=n_periods
    )
    logs = jax.tree.map(
        lambda x: x.reshape((num_steps,) + x.shape[2:]), logs
    )
    return assemble(rest_f, nh_f), logs


def average_travel_time(agents: AgentState) -> jnp.ndarray:
    """Mean realized travel time over DONE agents (runner.py:150-153)."""
    done = agents.done
    tt = jnp.where(done, agents.arrival - agents.departure, 0.0)
    n = jnp.maximum(jnp.sum(done.astype(jnp.float32)), 1.0)
    return jnp.sum(tt) / n
