"""Headline benchmark: agent-steps/sec of the fused episode scan on TPU.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Definition: one agent-step = one agent advanced through one simulation tick;
the simulator is fully vectorized, so every tick processes the whole
population (insert scan, queue dynamics, choice).  Throughput =
``num_agents * num_ticks / wall_seconds`` over a large-scale scenario,
matching the BASELINE.json north star "≥10^6 agent-steps/sec on TPU";
``vs_baseline`` is the ratio against that 10^6 target (the reference itself
publishes no numbers, BASELINE.md).

Scenario: 16x16 Manhattan grid (960 roads) with 50,000 commuters, random
route choice, 2 h of simulated time at 1 s ticks.  Compile time is excluded
(one warmup chunk); wall time covers the full on-device scan including all
metric accumulators (hourly traffic counts AND hourly road-optimality).

Fidelity of the bounded knobs (measured on CPU, bitwise agent-arrival
comparison against the unbounded reference semantics):

* withdraw depth 2 — outcome-identical at depths 1/2/4/8/None on this
  exact workload and on Grid8x8/5k;
* insert window 1024 — outcome-identical up to Grid8x8/5k (all of
  W in {256, 512, 1024} bitwise-equal to exact); at THIS workload the
  2 h demand peak exceeds any practical window (W=2048 still deviates),
  so windowed insertion is a documented bounded-entry deviation here:
  done-count delta < 0.6% at the 2 h mark for W in [512, 2048].  The
  per-tick ``TickLog.window_saturated`` monitor flags exactly the ticks
  where the deviation can be active (all-zero == bitwise-exact run).

The headline row runs this fast bounded mode (``insert_escalate=False``
and ``withdraw_escalate=False``, explicit — the SimConfig DEFAULTS escalate
saturated ticks to exactness); the ``exact_*`` keys measure the SAME
workload with both escalations ON, i.e. bitwise reference-exact
whole-population insert AND unbounded-withdraw semantics.  The
gap is the honest price of exactness here: the peak keeps a multi-thousand
agent capacity-blocked backlog saturated, and exact insertion re-scans that
backlog every tick (escalation passes at ptr + k*W) while the bounded mode
delays overflow entrants a few ticks (done-count delta < 0.6%).

The core runs the slot-major XLA path (core/direction.py) — measured faster
than the Pallas fused kernel at every size since the gather-free redesign.

A secondary congested shortest-path row (Grid64x64 / 200k, primal backend,
refresh every 10 ticks capped at 8 warm sweeps) is appended to the same
JSON line as ``sp_*`` keys on TPU (TARL_BENCH_SP=0 skips) — the realistic
routing workload VERDICT r2 asked to pin alongside the headline.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import jax


# Overridable for smoke tests / small machines (TARL_BENCH_* env vars).
ROWS = COLS = int(os.environ.get("TARL_BENCH_GRID", "16"))
NUM_AGENTS = int(os.environ.get("TARL_BENCH_AGENTS", "50000"))
SIM_SECONDS = int(os.environ.get("TARL_BENCH_SECONDS", "7200"))
TIMESTEP = 1
CHUNK = int(os.environ.get("TARL_BENCH_CHUNK", "1024"))
WINDOW = int(os.environ.get("TARL_BENCH_WINDOW", "1024"))
DEPTH = int(os.environ.get("TARL_BENCH_DEPTH", "2"))
# Arrival-scatter budget (SimConfig.withdraw_compact): bitwise-identical at
# every value (overflow ticks take the full scatter through lax.cond); 0
# disables.  Measured 179 -> 47 us/tick on the withdraw phase at Grid64x64.
COMPACT = int(os.environ.get("TARL_BENCH_COMPACT", "256")) or None


def main() -> None:
    from tarl_tpu.config import SimConfig
    from tarl_tpu.core.step import Policy, init_sim_state, run_episode
    from tarl_tpu.io.matsim import load_network, load_population
    from tarl_tpu.io.scenarios import grid_scenario
    from tarl_tpu.routing.policies import random_choice

    cache = os.environ.get("TARL_BENCH_DIR") or os.path.join(
        tempfile.gettempdir(), "tarl_bench_scen"
    )
    name = f"BenchGrid{ROWS}x{COLS}_{NUM_AGENTS}"
    base = os.path.join(cache, name)
    if not os.path.exists(os.path.join(base, "network.xml")):
        grid_scenario(cache, name, rows=ROWS, cols=COLS, num_agents=NUM_AGENTS,
                      peak_start=6 * 3600, peak_spread=2 * 3600)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    # Departure-relabeled population: activates the gather-free windowed
    # insert (same run up to the agent-id permutation; see
    # state.sort_agents_by_departure).
    from tarl_tpu.state import sort_agents_by_departure

    agents = sort_agents_by_departure(agents)

    def measure(insert_escalate: bool) -> float:
        sim_cfg = SimConfig(
            timestep=TIMESTEP,
            start_time=6 * 3600,
            end_time=6 * 3600 + SIM_SECONDS,
            record_road_optimality=False,
            insert_window=WINDOW,
            withdraw_depth=DEPTH,
            withdraw_compact=COMPACT,
            sorted_population=True,
            insert_escalate=insert_escalate,
            withdraw_escalate=insert_escalate,
        )
        policy = Policy(choice=random_choice)
        state = init_sim_state(net, agents, sim=sim_cfg, policy=policy)

        # One chunk size -> one compile; first chunk is the warmup.
        chunk = CHUNK
        num_chunks = max(SIM_SECONDS // TIMESTEP // chunk, 2)
        state, _ = run_episode(state, net, policy, chunk, sim=sim_cfg)
        jax.block_until_ready(state.road.count)

        t0 = time.time()
        final = state
        for _ in range(num_chunks - 1):
            final, logs = run_episode(final, net, policy, chunk, sim=sim_cfg)
        jax.block_until_ready(final.road.count)
        wall = time.time() - t0

        measured_ticks = (num_chunks - 1) * chunk
        return agents.num_agents * measured_ticks / wall

    value = measure(insert_escalate=False)
    result = {
        "metric": "agent_steps_per_sec",
        "value": round(value, 1),
        "unit": "agent-steps/s",
        "vs_baseline": round(value / 1e6, 3),
    }
    if os.environ.get("TARL_BENCH_EXACT", "1") == "1":
        try:
            exact = measure(insert_escalate=True)
            result["exact_metric"] = "exact_semantics_agent_steps_per_sec"
            result["exact_value"] = round(exact, 1)
        except Exception as e:  # fail-soft: keep the headline row
            result["exact_error"] = f"{type(e).__name__}: {e}"[:200]
    sp_default = "1" if jax.default_backend() == "tpu" else "0"
    if os.environ.get("TARL_BENCH_SP", sp_default) == "1":
        try:
            result.update(_sp_bench(cache))
        except Exception as e:  # fail-soft: keep the headline row
            result["sp_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(result))


def _sp_bench(cache: str) -> dict:
    """Secondary row: congested shortest-path routing at Grid64x64/200k
    (VERDICT r2 next-step #4 — the realistic workload the random-policy
    headline does not cover).  Primal backend, refresh every 10 ticks
    capped at 8 warm-started sweeps, refresh-time next-road table.  Keys
    are merged into the same single JSON line."""
    from tarl_tpu.config import RoutingConfig, SimConfig
    from tarl_tpu.core.step import init_sim_state, run_episode
    from tarl_tpu.io.matsim import load_network, load_population
    from tarl_tpu.io.scenarios import grid_scenario
    from tarl_tpu.simulator import make_policy

    grid = int(os.environ.get("TARL_BENCH_SP_GRID", "64"))
    n_agents = int(os.environ.get("TARL_BENCH_SP_AGENTS", "200000"))
    # Refresh-aligned tick count (multiple of refresh_rate=10) so the whole
    # run uses the hoisted periodic driver (core.step.run_episode_periodic).
    ticks = int(os.environ.get("TARL_BENCH_SP_TICKS", "1020"))
    name = f"RouteGrid{grid}_{n_agents}"
    base = os.path.join(cache, name)
    if not os.path.exists(os.path.join(base, "network.xml")):
        grid_scenario(cache, name, rows=grid, cols=grid,
                      num_agents=n_agents,
                      peak_start=6 * 3600, peak_spread=2 * 3600)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    from tarl_tpu.state import sort_agents_by_departure

    agents = sort_agents_by_departure(agents)
    routing = RoutingConfig(refresh_rate=10, max_bf_iters=8, backend="primal")
    # W=1024 / depth=2 measured ARRIVAL-IDENTICAL to W=4096 / depth=8 on
    # this workload (scripts/ablate_routing.py); sorted population is the
    # unsorted run up to the agent-id relabeling (state.
    # sort_agents_by_departure) — same physics, fast insert path.
    sim = SimConfig(timestep=1, start_time=6 * 3600,
                    record_road_optimality=False,
                    insert_window=1024, withdraw_depth=2,
                    withdraw_compact=COMPACT,
                    sorted_population=True,
                    insert_escalate=False, withdraw_escalate=False)
    policy = make_policy("dijkstra", routing, network=net)
    from tarl_tpu.core.step import run_episode_periodic

    runner = run_episode_periodic if (
        policy.periodic_rate and ticks % policy.periodic_rate == 0
    ) else run_episode
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    jax.block_until_ready(state.next_hop)
    state, _ = runner(state, net, policy, ticks, sim=sim)
    jax.block_until_ready(state.road.count)
    t0 = time.time()
    state, _ = runner(state, net, policy, ticks, sim=sim)
    jax.block_until_ready(state.road.count)
    wall = time.time() - t0
    return {
        "sp_metric": "sp_agent_steps_per_sec",
        "sp_grid": grid,
        "sp_value": round(agents.num_agents * ticks / wall, 1),
        "sp_per_tick_ms": round(wall / ticks * 1e3, 3),
        "sp_done": int(jax.device_get(state.agents.done[1:].sum())),
    }


def _main_with_retry() -> None:
    """The tunneled-TPU backend occasionally fails its one-per-process
    registration handshake (e.g. right after another TPU process exits).
    Registration happens at interpreter start, so recovery requires a fresh
    process: re-exec up to 3 times with a cooldown."""
    attempt = int(os.environ.get("TARL_BENCH_ATTEMPT", "0"))
    try:
        main()
    except RuntimeError as e:
        if "backend" not in str(e).lower() or attempt >= 3:
            raise
        sys.stderr.write(
            f"bench: backend init failed (attempt {attempt + 1}/3), retrying: {e}\n"
        )
        time.sleep(30 * (attempt + 1))
        os.environ["TARL_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    _main_with_retry()
