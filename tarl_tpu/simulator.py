"""High-level simulator facade with the reference's API surface.

``TransportationSimulator`` (reference: transportation_simulator.py:17-763)
exposed ``config_network`` / ``load_network`` / ``config_parameters`` /
``set_time`` / ``run`` / ``reset`` / ``state`` plus plotting and metric
methods.  This facade keeps that surface while the actual work runs on
device:

* ``run()`` executes one tick through per-phase jitted kernels with wall-clock
  phase timers (insert/withdraw/choice/core), matching the reference's
  always-on timing breakdown (ts.py:294-324, runner.py:152-165);
* ``run_fast(n)`` executes ``n`` ticks as one fused ``lax.scan`` — the TPU
  path with zero host round-trips (the reference has no equivalent; its hot
  loop is host-driven);
* metric/plot methods consume the on-device accumulators and per-tick logs.
"""
from __future__ import annotations

import dataclasses
import os
import time as _time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import (
    DEFAULT_PHYSICS,
    DEFAULT_ROUTING,
    PhysicsConfig,
    RoutingConfig,
    SimConfig,
)
from .core.step import (
    Policy,
    average_travel_time,
    init_sim_state,
    reset_sim_state,
    run_episode,
)
from .io.cache import load_or_build_network, load_or_build_population
from .network import Network
from .routing.policies import make_shortest_path_choice, random_choice
from .schema import FeatureHelpers, pack_state
from .state import SimState, TickLog


@dataclasses.dataclass
class PhaseTimers:
    """Per-phase wall-clock accumulators (ts.py:44-48)."""

    inserting_time: float = 0.0
    withdraw_time: float = 0.0
    choice_time: float = 0.0
    core_time: float = 0.0

    @property
    def total(self) -> float:
        return (
            self.inserting_time + self.withdraw_time + self.choice_time + self.core_time
        )


def make_policy(
    algo: str,
    routing: RoutingConfig = DEFAULT_ROUTING,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    network=None,
    dest_inters=None,
) -> Policy:
    """Policy factory for the classical algorithms (runner.py:36-42).

    With ``routing.strict_compat`` the dijkstra policy reproduces the
    reference's exact behaviour: entrants follow the origin SRC node's
    SELECTED_ROAD (driven by the dummy agent's destination, base.py:573-579)
    instead of per-agent entry roads, under the reference's edge-cost form
    (base.py:541-549).

    ``routing.backend`` selects the shortest-path table representation:
    the reference-shaped dense dual [N, N] table, or the O(I^2) primal
    backend for large networks ("auto" switches when the dual table would
    exceed ~64M entries; pass ``network`` to enable auto-selection).
    """
    if algo == "random":
        return Policy(choice=random_choice)
    if algo == "so":
        # System-optimal routing: the shortest-path machinery on MARGINAL
        # social costs (tt + n*dtt/dn, bellman_ford.marginal_road_costs).
        # Internalizing the congestion externality diverts traffic before a
        # queue binds — reaches the system optimum where travel-time routing
        # oscillates (Bottleneck: 68.2 s vs dijkstra's 80.5; docs/LEARNING.md).
        # No reference equivalent; the routing-policy face of the PoA metrics.
        import dataclasses as _dc

        if routing.strict_compat:
            raise ValueError("--algo so is incompatible with strict_compat")
        return make_policy(
            "dijkstra", _dc.replace(routing, cost_mode="marginal"),
            physics, network=network, dest_inters=dest_inters,
        )
    if algo == "dijkstra":
        backend = routing.backend
        if backend == "auto":
            big = network is not None and network.num_nodes ** 2 > 64_000_000
            backend = "primal" if (big and not routing.strict_compat) else "dual"
        if backend == "primal":
            if routing.strict_compat:
                raise ValueError(
                    "strict_compat requires the dual routing backend"
                )
            if dest_inters is not None:
                # Destination-restricted tables: O(I*D) — for metropolitan
                # networks with concentrated commuting destinations.
                from .routing.policies import make_primal_dest_parts

                choice, entry_lookup, table_init = make_primal_dest_parts(
                    dest_inters, routing, physics, network=network
                )
                return Policy(
                    choice=choice,
                    entry=lambda s, n: entry_lookup(s, n),
                    entry_lookup=entry_lookup,
                    table_init=table_init,
                    **_periodic_fields(choice, routing),
                )
            from .routing.policies import (
                make_shortest_path_choice_primal,
                primal_entry_lookup,
                primal_table_init,
            )
            import functools

            sp_choice = make_shortest_path_choice_primal(
                routing, physics, network=network
            )
            return Policy(
                choice=sp_choice,
                entry=lambda s, n: primal_entry_lookup(s, n),
                entry_lookup=primal_entry_lookup,
                # Init must be exact; only refreshes honor max_bf_iters.
                table_init=functools.partial(
                    primal_table_init, max_iters=None
                ),
                **_periodic_fields(sp_choice, routing),
            )
        choice = make_shortest_path_choice(routing, physics)
        if routing.strict_compat:
            # No per-agent entry roads: insertion falls back to
            # selected_road[origin] exactly like the reference.
            return Policy(choice=choice, needs_next_hop=True)
        from .routing.policies import shortest_path_entry

        return Policy(
            choice=choice,
            entry=lambda s, n: shortest_path_entry(s, n),
            entry_lookup=shortest_path_entry,
            needs_next_hop=True,
            **_periodic_fields(choice, routing),
        )
    raise ValueError(f"Unknown classical algorithm {algo!r}")


def _periodic_fields(choice, routing: RoutingConfig) -> dict:
    """Policy kwargs for the refresh-hoisted episode driver
    (core.step.run_episode_periodic): the refresh/lookup split the choice
    factory attached, and the static refresh cadence.  Empty for policies
    without a periodic split or with refreshes disabled (the static-table
    fast path already skips the per-tick cond)."""
    from .routing.policies import _NEVER_REFRESH

    refresh = getattr(choice, "refresh_fn", None)
    lookup = getattr(choice, "lookup_fn", None)
    if refresh is None or lookup is None:
        return {}
    if routing.refresh_rate >= _NEVER_REFRESH:
        return {}
    return {
        "refresh": refresh,
        "lookup": lookup,
        "periodic_rate": int(routing.refresh_rate),
    }


class TransportationSimulator:
    """Facade mirroring the reference simulator's public interface."""

    def __init__(
        self,
        *,
        physics: PhysicsConfig = DEFAULT_PHYSICS,
        sim: SimConfig = SimConfig(),
        data_root: str = "data",
        save_root: str = "save",
    ):
        self.physics = physics
        self.sim = sim
        self.data_root = data_root
        self.save_root = save_root
        self.network: Optional[Network] = None
        self.state: Optional[SimState] = None
        self.policy: Policy = Policy(choice=random_choice)
        self.timers = PhaseTimers()
        # Per-tick host-side logs (filled by eager run(); run_fast returns
        # them as arrays).  Layout matches TickLog.
        self.leg_histogram_values: list = []
        self.road_optimality_values: list = []
        # Full-resolution per-tick road-optimality on BIG networks
        # (reference keeps raw per-tick series unconditionally,
        # response_mpnn.py:125 / ts.py:453-514; a dense [T, R] host log
        # does not scale past ~2e8 elements).  store == "sparse" keeps the
        # per-tick series as (time, nonzero road idx, value) triplets —
        # exact, O(nnz) host memory — and falls back to the O(H*R) hourly
        # accumulator only if even the nonzeros blow their budget.
        self.road_optimality_store: str = "dense"
        self.road_optimality_sparse: list = []  # [(t, int32[nnz], f32[nnz])]
        self._sparse_nnz = 0
        self._sparse_nnz_budget = int(
            os.environ.get("TARL_SPARSE_NNZ_BUDGET", 5 * 10 ** 7)
        )
        self._sparse_road_total = None  # np.float64[R] |delta| mass per road
        self._jitted_tick = None

    # ------------------------------------------------------------------
    # Configuration (ts.py:246-292,368-384)
    # ------------------------------------------------------------------
    def load_network(self, scenario: str) -> None:
        self.network = load_or_build_network(scenario, self.data_root, self.save_root)
        self.scenario = scenario

    def load_population(self, scenario: str) -> None:
        self.agents0 = load_or_build_population(scenario, self.data_root, self.save_root)

    def config_parameters(
        self,
        timestep_size: int = 1,
        start_time: int = 0,
        end_time: Optional[int] = None,
        **overrides,
    ) -> None:
        self.sim = dataclasses.replace(
            self.sim,
            timestep=timestep_size,
            start_time=start_time,
            end_time=end_time if end_time is not None else self.sim.end_time,
            **overrides,
        )
        self._init_state()

    def set_policy(self, policy: Policy) -> None:
        self.policy = policy
        self._init_state()

    def _init_state(self) -> None:
        if self.network is None or not hasattr(self, "agents0"):
            return
        self.state = init_sim_state(
            self.network, self.agents0, sim=self.sim, policy=self.policy
        )
        self._jitted_tick = None

    @property
    def time(self) -> float:
        return float(self.state.time)

    def set_time(self, t) -> None:
        self.state = self.state._replace(time=jnp.asarray(float(t), jnp.float32))

    def reset(self) -> None:
        """Clear queues + agent progress (ts.py:353-358, base.py:497-503)."""
        self.state = reset_sim_state(self.state, self.sim.start_time)
        self.timers = PhaseTimers()
        self.leg_histogram_values = []
        self.road_optimality_values = []
        self.road_optimality_sparse = []
        self._sparse_nnz = 0
        self._sparse_road_total = None

    # ------------------------------------------------------------------
    # Stepping
    # ------------------------------------------------------------------
    def run(self) -> None:
        """One tick, eager, with phase timing (ts.py:294-351).

        Phase timers here measure one fused device call each; the split is
        coarser than the reference's (which syncs the device per phase) but
        covers the same four phases.
        """
        if self._jitted_tick is None:
            from .core.insert import insert_agents
            from .core.withdraw import withdraw_agents
            from .core.direction import direction_step
            from .core.response import confirm_step

            physics, simc, policy = self.physics, self.sim, self.policy

            @jax.jit
            def phase_insert(state):
                entry = policy.entry(state, self.network) if policy.entry else None
                if simc.insert_window is not None:
                    from .core.insert import insert_agents_windowed

                    road, agents, ptr, _ = insert_agents_windowed(
                        state.road, state.agents, state.selected_road,
                        self.network, state.time, state.insert_order,
                        state.insert_ptr, simc.insert_window, physics,
                        entry_road=entry, sorted_fast=simc.sorted_population,
                        escalate=simc.insert_escalate,
                    )
                    return state._replace(road=road, agents=agents, insert_ptr=ptr)
                road, agents = insert_agents(
                    state.road, state.agents, state.selected_road, self.network,
                    state.time, physics, entry_road=entry,
                )
                return state._replace(road=road, agents=agents)

            @jax.jit
            def phase_withdraw(state):
                road, agents, wcount = withdraw_agents(
                    state.road, state.agents, self.network, state.time,
                    depth=simc.withdraw_depth, compact=simc.withdraw_compact,
                    escalate=simc.withdraw_escalate,
                )
                return state._replace(road=road, agents=agents), wcount > 0

            @jax.jit
            def phase_choice(state):
                state, _ = policy.choice(state, self.network)
                return state

            @jax.jit
            def phase_core(state, withdrawn):
                key, k_dir = jax.random.split(state.key)
                road, delta, accept, win_src = direction_step(
                    state.road, state.selected_road, self.network, state.time,
                    k_dir, physics,
                )
                road, popped = confirm_step(road, accept, win_src,
                                            self.network)
                hour = jnp.clip(
                    (state.time / 3600.0).astype(jnp.int32), 0, simc.num_hours - 1
                )
                m = state.metrics
                hourly = m.hourly_counts.at[hour].add(
                    (withdrawn | popped).astype(jnp.int32)
                )
                delta_hourly = m.delta_tt_hourly
                if simc.record_road_optimality_hourly:
                    delta_hourly = delta_hourly.at[hour].add(delta)
                on_way_total = jnp.sum(road.count).astype(jnp.float32)
                done_total = jnp.sum(state.agents.done).astype(jnp.float32)
                # (eager path keeps the exact reduction; it is not hot)
                log = (
                    on_way_total - m.on_way_before + done_total - m.done_before,
                    done_total - m.done_before,
                    on_way_total,
                    state.time + simc.timestep,
                    delta,
                )
                new_state = state._replace(
                    road=road,
                    key=key,
                    time=state.time + simc.timestep,
                    metrics=m._replace(
                        hourly_counts=hourly,
                        on_way_before=on_way_total,
                        done_before=done_total,
                        delta_tt_hourly=delta_hourly,
                    ),
                )
                return new_state, log

            self._phases = (phase_insert, phase_withdraw, phase_choice, phase_core)
            self._jitted_tick = True

        p_ins, p_wd, p_ch, p_core = self._phases
        b = _time.time()
        state = p_ins(self.state)
        jax.block_until_ready(state.road.count)
        e = _time.time()
        self.timers.inserting_time += e - b

        b = e
        state, withdrawn = p_wd(state)
        jax.block_until_ready(state.road.count)
        e = _time.time()
        self.timers.withdraw_time += e - b

        b = e
        state = p_ch(state)
        jax.block_until_ready(state.selected_road)
        e = _time.time()
        self.timers.choice_time += e - b

        b = e
        state, log = p_core(state, withdrawn)
        jax.block_until_ready(state.road.count)
        e = _time.time()
        self.timers.core_time += e - b

        self.state = state
        dep, arr, on_way, t, delta = log
        self.leg_histogram_values.append(
            [float(dep), float(arr), float(on_way), float(t)]
        )
        if self.sim.record_road_optimality:
            self._record_delta(
                np.asarray([float(t)]), np.asarray(delta)[None, :]
            )

    # ------------------------------------------------------------------
    def _record_delta(self, ts: np.ndarray, delta: np.ndarray) -> None:
        """Append a chunk's per-tick road-delta rows ([Tc], [Tc, R]) to the
        host store.  "dense" keeps full rows (small networks); "sparse"
        keeps per-tick (idx, val) nonzero triplets — exact at O(nnz) host
        memory — and degrades to the always-on hourly accumulator only if
        the accumulated nonzeros exceed TARL_SPARSE_NNZ_BUDGET."""
        if self.road_optimality_store == "dense":
            for i in range(delta.shape[0]):
                self.road_optimality_values.append((float(ts[i]), delta[i]))
            return
        if self.road_optimality_store != "sparse":
            return  # "hourly": per-tick series dropped after blowout
        rows, cols = np.nonzero(delta)  # C-order: sorted by row
        vals = delta[rows, cols].astype(np.float32)
        self._sparse_nnz += vals.size
        if self._sparse_nnz > self._sparse_nnz_budget:
            print(
                f"ℹ️  | per-tick road-optimality nonzeros exceed "
                f"{self._sparse_nnz_budget:.0e}: stopping per-tick "
                f"collection at t={float(ts[0]):.0f} — the "
                f"{len(self.road_optimality_sparse)}-tick prefix collected "
                "so far is retained (road_optimality_series); full-episode "
                "plots fall back to the hourly accumulator "
                "(TARL_SPARSE_NNZ_BUDGET raises the cap)"
            )
            self.road_optimality_store = "hourly"
            return
        if self._sparse_road_total is None:
            self._sparse_road_total = np.zeros(delta.shape[1], np.float64)
        self._sparse_road_total += np.bincount(
            cols, weights=np.abs(vals), minlength=delta.shape[1]
        )
        counts = np.bincount(rows, minlength=delta.shape[0])
        offs = np.concatenate([[0], np.cumsum(counts)])
        for i in range(delta.shape[0]):
            lo, hi = offs[i], offs[i + 1]
            self.road_optimality_sparse.append(
                (float(ts[i]), cols[lo:hi].astype(np.int32), vals[lo:hi])
            )

    def road_optimality_series(self, road_ids) -> tuple:
        """(times [T], mat [T, len(road_ids)]) reconstructed from whichever
        per-tick store is active — exact in both modes."""
        ids = np.asarray(list(road_ids), dtype=np.int64)
        if self.road_optimality_store == "sparse" or self.road_optimality_sparse:
            # Also reached after an nnz-budget blowout flipped the store to
            # "hourly": the per-tick prefix collected before the blowout is
            # retained and still reconstructable.
            entries = self.road_optimality_sparse
            times = np.asarray([t for t, _, _ in entries])
            order = np.argsort(ids)
            sorted_ids = ids[order]
            mat = np.zeros((len(entries), ids.size), np.float32)
            for i, (_, idx, val) in enumerate(entries):
                pos = np.searchsorted(sorted_ids, idx)
                pos_c = np.minimum(pos, ids.size - 1)
                hit = sorted_ids[pos_c] == idx
                mat[i, order[pos_c[hit]]] = val[hit]
            return times, mat
        values = self.road_optimality_values
        times = np.asarray([t for t, _ in values])
        mat = np.stack([np.asarray(v) for _, v in values], axis=0)[:, ids] \
            if values else np.zeros((0, ids.size), np.float32)
        return times, mat

    def run_fast(self, num_steps: int) -> TickLog:
        """``num_steps`` ticks as one fused on-device scan; appends the
        resulting logs to the host-side records and returns them.

        When the policy carries the periodic refresh/lookup split and this
        chunk is refresh-aligned, the refresh-hoisted nested-scan driver
        runs instead — bitwise-identical (core.step.run_episode_periodic),
        minus the per-tick cond copy of the routing scratch."""
        rate = self.policy.periodic_rate
        runner = run_episode
        if (rate and num_steps % rate == 0
                and int(self.state.choice_count) % rate == 0):
            from .core.step import run_episode_periodic as runner
        self.state, logs = runner(
            self.state, self.network, self.policy, num_steps,
            sim=self.sim, physics=self.physics,
        )
        jax.block_until_ready(self.state.road.count)
        dep = np.asarray(logs.departures)
        arr = np.asarray(logs.arrivals)
        on = np.asarray(logs.on_way)
        ts = np.asarray(logs.time)
        for i in range(num_steps):
            self.leg_histogram_values.append(
                [float(dep[i]), float(arr[i]), float(on[i]), float(ts[i])]
            )
        if self.sim.record_road_optimality and logs.road_delta_tt.size:
            self._record_delta(ts, np.asarray(logs.road_delta_tt))
        return logs

    # ------------------------------------------------------------------
    # Observation (ts.py:360-366)
    # ------------------------------------------------------------------
    def observe(self):
        """(node_features [N,7], edge_features [Ef,1], edge_index [2,Ef],
        agent_index [N]) — the reference ``state()`` contract."""
        from .rl.observation import observe

        return observe(self.state, self.network)

    def packed_x(self) -> jnp.ndarray:
        """Reference-layout packed node matrix (for interop/debug)."""
        return pack_state(self.state.road, self.network, self.state.selected_road)

    @property
    def h(self) -> FeatureHelpers:
        return FeatureHelpers(Nmax=self.network.nmax)

    # ------------------------------------------------------------------
    # Metrics / plots — delegated to tarl_tpu.metrics.reporting
    # ------------------------------------------------------------------
    def average_travel_time(self) -> float:
        return float(average_travel_time(self.state.agents))

    def plot_computation_time(self, output_dir: str = "data/outputs"):
        from .metrics.reporting import plot_computation_time

        return plot_computation_time(self.timers, output_dir)

    def plot_leg_histogram(self, output_dir: Optional[str] = "data/outputs"):
        from .metrics.reporting import plot_leg_histogram

        return plot_leg_histogram(
            self.leg_histogram_values, self.sim.timestep, output_dir
        )

    def plot_road_optimality(self, output_dir: Optional[str] = "data/outputs",
                             road_ids: Optional[list] = None):
        from .metrics.reporting import plot_road_optimality

        if self.road_optimality_store == "sparse" and self.road_optimality_sparse:
            # Full per-tick resolution without a dense [T, R] host matrix:
            # reconstruct only the plotted columns (default: the 20 roads
            # carrying the most congestion-delay mass).
            if road_ids is None:
                tot = self._sparse_road_total
                k = min(20, tot.size)
                road_ids = [int(r) for r in np.argsort(-tot)[:k]]
            times, mat = self.road_optimality_series(road_ids)
            from .metrics.reporting import plot_road_optimality_columns

            return plot_road_optimality_columns(
                times, {rid: mat[:, j] for j, rid in enumerate(road_ids)},
                output_dir,
            )
        values = self.road_optimality_values
        if not values and self.sim.record_road_optimality_hourly:
            # Long runs keep only the O(H*R) on-device hourly accumulator
            # (state.MetricState.delta_tt_hourly); plot at hour resolution.
            mat = np.asarray(self.state.metrics.delta_tt_hourly)
            hours = np.nonzero(mat.sum(axis=1))[0]
            last = int(hours[-1]) + 1 if hours.size else 0
            values = [(h * 3600.0, mat[h]) for h in range(last)]
        return plot_road_optimality(values, output_dir, road_ids)

    def compute_node_metrics(self, output_dir: Optional[str] = "data/outputs"):
        from .metrics.reporting import compute_node_metrics

        return compute_node_metrics(
            np.asarray(self.state.metrics.hourly_counts),
            np.asarray(self.network.max_flow),
            output_dir,
        )

    def plot_daily_counts(self, expected_counts: dict,
                          output_dir: Optional[str] = "data/outputs"):
        from .metrics.reporting import plot_daily_counts

        return plot_daily_counts(
            np.asarray(self.state.metrics.hourly_counts),
            expected_counts,
            output_dir,
        )

    def get_info(self, road_id: int) -> str:
        """Debug summary of one road (ts.py:749-760)."""
        ids, _, dep = self.state.road.logical_view()
        cnt = int(self.state.road.count[road_id])
        cap = float(self.network.capacity[road_id])
        next_dep = float(dep[road_id, 0]) - self.time
        sel = int(self.state.selected_road[road_id])
        return (
            f"Road {road_id}: {cnt} / {cap:.0f}\n"
            f"Queue: {np.asarray(ids[road_id, :15])}\n"
            f"Next departure in {next_dep:.0f}s toward road {sel}\n"
            f"Current time: {self.time:.0f}"
        )
