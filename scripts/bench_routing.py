"""Shortest-path (congested refresh) throughput at metropolitan scale.

Measures the realistic routing workload the official random-policy bench
does not cover (VERDICT r2 weak #7): Grid64x64 / 200k agents under the full
DijkstraAgents semantics — primal O(I^2) backend, host scipy free-flow
init, warm-started congested refreshes with the sweep cap of
``RoutingConfig(max_bf_iters=8)`` (docs/BENCH.md).  Prints one JSON line.

Run from /root/repo in the default (axon) environment, one TPU process at
a time.  TARL_ROUTE_GRID / _AGENTS / _TICKS / _ZONES override the shape
(_ZONES switches to the destination-restricted dist[I, D] backend).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

GRID = int(os.environ.get("TARL_ROUTE_GRID", "64"))
NUM_AGENTS = int(os.environ.get("TARL_ROUTE_AGENTS", "200000"))
# Refresh-aligned default (multiple of refresh_rate=10) -> periodic driver.
TICKS = int(os.environ.get("TARL_ROUTE_TICKS", "1020"))
ZONES = int(os.environ.get("TARL_ROUTE_ZONES", "0"))  # 0 = all-pairs


def main() -> None:
    from tarl_tpu.config import RoutingConfig, SimConfig
    from tarl_tpu.core.step import init_sim_state, run_episode
    from tarl_tpu.io.matsim import load_network, load_population
    from tarl_tpu.io.scenarios import grid_scenario
    from tarl_tpu.simulator import make_policy

    cache = os.environ.get("TARL_BENCH_DIR") or os.path.join(
        tempfile.gettempdir(), "tarl_bench_scen"
    )
    name = f"RouteGrid{GRID}_{NUM_AGENTS}" + (f"_z{ZONES}" if ZONES else "")
    base = os.path.join(cache, name)
    if not os.path.exists(os.path.join(base, "network.xml")):
        grid_scenario(
            cache, name, rows=GRID, cols=GRID, num_agents=NUM_AGENTS,
            peak_start=6 * 3600, peak_spread=2 * 3600,
            num_dest_zones=ZONES or None,
        )
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )

    routing = RoutingConfig(refresh_rate=10, max_bf_iters=8, backend="primal")
    sim = SimConfig(
        timestep=1, start_time=6 * 3600, record_road_optimality=False,
        # Bounded-entry mode like bench.py's sp row (per-agent entry roads
        # are incompatible with the per-SRC exact backlog, and default-on
        # escalation over an oversaturated peak adds many window passes).
        insert_escalate=False, withdraw_escalate=False,
        insert_window=4096, withdraw_depth=8,
    )
    if ZONES:
        import numpy as np

        from tarl_tpu.routing.policies import _dest_inter

        dest_inters = np.asarray(_dest_inter(net, agents.dest))
        policy = make_policy("dijkstra", routing, network=net,
                             dest_inters=dest_inters)
    else:
        policy = make_policy("dijkstra", routing, network=net)
    from tarl_tpu.core.step import run_episode_periodic

    runner = run_episode_periodic if (
        policy.periodic_rate and TICKS % policy.periodic_rate == 0
    ) else run_episode
    t_init = time.time()
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    jax.block_until_ready(state.next_hop)
    init_s = time.time() - t_init

    state, _ = runner(state, net, policy, TICKS, sim=sim)
    jax.block_until_ready(state.road.count)
    t0 = time.time()
    state, _ = runner(state, net, policy, TICKS, sim=sim)
    jax.block_until_ready(state.road.count)
    wall = time.time() - t0

    value = agents.num_agents * TICKS / wall
    print(json.dumps({
        "metric": "sp_agent_steps_per_sec",
        "grid": GRID, "agents": agents.num_agents, "zones": ZONES,
        "value": round(value, 1), "unit": "agent-steps/s",
        "per_tick_ms": round(wall / TICKS * 1e3, 3),
        "table_init_s": round(init_s, 1),
        "done": int(jax.device_get(state.agents.done[1:].sum())),
    }))


if __name__ == "__main__":
    main()
