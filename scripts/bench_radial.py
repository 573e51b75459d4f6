"""Congested shortest-path throughput on the NON-GRID radial metro.

The delta-bucketed multisweep kernels exploit Manhattan-grid regularity
(few distinct turn-edge offsets); a ring-and-spoke city
(io.scenarios.radial_scenario: ring wrap + centre spurs + CBD-concentrated
demand) has an irregular offset structure, so this measures the honest
fallback path (gather sweeps) of the same primal backend — the generality
datapoint for docs/BENCH.md.  Prints one JSON line.

Run from /root/repo in the default (axon) environment, one TPU process at
a time.  TARL_RAD_RINGS / _SPOKES / _AGENTS / _TICKS / _ZONED override.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

RINGS = int(os.environ.get("TARL_RAD_RINGS", "64"))
SPOKES = int(os.environ.get("TARL_RAD_SPOKES", "128"))
NUM_AGENTS = int(os.environ.get("TARL_RAD_AGENTS", "200000"))
# Refresh-aligned (multiple of refresh_rate=10) -> periodic driver.
TICKS = int(os.environ.get("TARL_RAD_TICKS", "1020"))
ZONED = os.environ.get("TARL_RAD_ZONED", "1") == "1"


def main() -> None:
    import numpy as np

    from tarl_tpu.config import RoutingConfig, SimConfig
    from tarl_tpu.core.step import (
        init_sim_state,
        run_episode,
        run_episode_periodic,
    )
    from tarl_tpu.io.matsim import load_network, load_population
    from tarl_tpu.io.scenarios import radial_scenario
    from tarl_tpu.routing.policies import _dest_inter
    from tarl_tpu.simulator import make_policy
    from tarl_tpu.state import sort_agents_by_departure

    cache = os.environ.get("TARL_BENCH_DIR") or "/tmp/tarl_bench_scen"
    name = f"RadialBench{RINGS}x{SPOKES}_{NUM_AGENTS}"
    base = os.path.join(cache, name)
    if not os.path.exists(os.path.join(base, "network.xml")):
        # cbd_fraction=1.0: the classic morning commute — every trip ends
        # in the CBD zone (centre + innermost ring), so the zoned backend
        # gets genuinely concentrated destination columns (D = spokes + 1).
        radial_scenario(cache, name, rings=RINGS, spokes=SPOKES,
                        num_agents=NUM_AGENTS, cbd_fraction=1.0,
                        peak_start=6 * 3600, peak_spread=2 * 3600)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    agents = sort_agents_by_departure(agents)

    routing = RoutingConfig(refresh_rate=10, max_bf_iters=8, backend="primal")
    sim = SimConfig(timestep=1, start_time=6 * 3600,
                    record_road_optimality=False,
                    # Bounded-entry mode like bench.py's sp row (the zoned
                    # policy's per-agent entry roads are incompatible with
                    # the per-SRC exact backlog; default-on escalation over
                    # this oversaturated peak costs ~10 ms/tick here).
                    insert_escalate=False, withdraw_escalate=False,
                    insert_window=1024, withdraw_depth=2,
                    sorted_population=True)
    kwargs = {}
    if ZONED:
        kwargs["dest_inters"] = np.unique(
            np.asarray(_dest_inter(net, agents.dest))
        )
    policy = make_policy("dijkstra", routing, network=net, **kwargs)
    runner = run_episode_periodic if (
        policy.periodic_rate and TICKS % policy.periodic_rate == 0
    ) else run_episode

    t0 = time.time()
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    jax.block_until_ready(state.next_hop)
    init_s = time.time() - t0
    state, _ = runner(state, net, policy, TICKS, sim=sim)
    jax.block_until_ready(state.road.count)
    t0 = time.time()
    state, _ = runner(state, net, policy, TICKS, sim=sim)
    jax.block_until_ready(state.road.count)
    wall = time.time() - t0

    done = int(jax.device_get(state.agents.done[1:].sum()))
    on_way = int(jax.device_get(state.road.count.sum()))
    out = {
        "metric": "radial_sp_agent_steps_per_sec",
        "rings": RINGS, "spokes": SPOKES,
        "roads": net.num_roads, "intersections": net.num_intersections,
        "agents": agents.num_agents, "zoned": ZONED, "ticks": TICKS,
        "value": round(agents.num_agents * TICKS / wall, 1),
        "per_tick_ms": round(wall / TICKS * 1e3, 3),
        "init_s": round(init_s, 1), "done": done, "on_way": on_way,
    }

    if os.environ.get("TARL_RAD_EXACT", "1") == "1":
        # Exact-semantics row (VERDICT r4 #3): the zoned policy's per-agent
        # entry roads are incompatible with the per-SRC backlog, so exact =
        # windowed escalation (r3's outcome-identical self-healing passes).
        sim_ex = SimConfig(timestep=1, start_time=6 * 3600,
                           record_road_optimality=False,
                           insert_escalate=True, withdraw_escalate=True,
                           insert_window=1024, withdraw_depth=2,
                           sorted_population=True)
        state = init_sim_state(net, agents, sim=sim_ex, policy=policy)
        state, _ = runner(state, net, policy, TICKS, sim=sim_ex)
        jax.block_until_ready(state.road.count)
        t0 = time.time()
        state, _ = runner(state, net, policy, TICKS, sim=sim_ex)
        jax.block_until_ready(state.road.count)
        wall_ex = time.time() - t0
        out.update({
            "exact_value": round(agents.num_agents * TICKS / wall_ex, 1),
            "exact_per_tick_ms": round(wall_ex / TICKS * 1e3, 3),
            "exact_done": int(jax.device_get(state.agents.done[1:].sum())),
        })

    print(json.dumps(out))


if __name__ == "__main__":
    main()
