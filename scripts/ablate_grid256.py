"""Grid256x256 / 2M-agent congested shortest-path phase ablation
(VERDICT r3 #6: "dissect and cut the Grid256 tail").

Rows (each timed after a full warm invocation, one compile per program):

1. base tick        — random policy, same sim knobs (insert/withdraw/core).
2. sp static table  — zoned policy, refresh disabled (lookup cost only).
3. sp full          — zoned policy, refresh every 10 ticks (periodic driver).
4. one refresh      — the zoned congested refresh invoked alone.

Run from /root/repo in the default (axon) environment, nothing else on the
TPU.  TARL_G256_TICKS / _ZONES / _AGENTS override.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

GRID = int(os.environ.get("TARL_G256_GRID", "256"))
NUM_AGENTS = int(os.environ.get("TARL_G256_AGENTS", "2000000"))
TICKS = int(os.environ.get("TARL_G256_TICKS", "510"))
ZONES = int(os.environ.get("TARL_G256_ZONES", "256"))


def main() -> None:
    import numpy as np

    from tarl_tpu.config import RoutingConfig, SimConfig
    from tarl_tpu.core.step import (
        Policy,
        init_sim_state,
        run_episode,
        run_episode_periodic,
    )
    from tarl_tpu.io.matsim import load_network, load_population
    from tarl_tpu.io.scenarios import grid_scenario
    from tarl_tpu.routing.policies import _NEVER_REFRESH, _dest_inter
    from tarl_tpu.routing.policies import random_choice
    from tarl_tpu.simulator import make_policy
    from tarl_tpu.state import sort_agents_by_departure
    import dataclasses

    cache = os.environ.get("TARL_BENCH_DIR") or os.path.join(
        tempfile.gettempdir(), "tarl_bench_scen"
    )
    name = f"RouteGrid{GRID}_{NUM_AGENTS}_z{ZONES}"
    base = os.path.join(cache, name)
    if not os.path.exists(os.path.join(base, "network.xml")):
        grid_scenario(cache, name, rows=GRID, cols=GRID,
                      num_agents=NUM_AGENTS, peak_start=6 * 3600,
                      peak_spread=2 * 3600, num_dest_zones=ZONES)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    agents = sort_agents_by_departure(agents)
    sim = SimConfig(timestep=1, start_time=6 * 3600,
                    record_road_optimality=False,
                    insert_escalate=False, withdraw_escalate=False,
                    insert_window=1024, withdraw_depth=2,
                    withdraw_compact=256, sorted_population=True)
    routing = RoutingConfig(refresh_rate=10, max_bf_iters=8,
                            backend="primal")
    dest_inters = np.unique(np.asarray(_dest_inter(net, agents.dest)))

    rows = {}

    def timed_episode(label, policy, use_periodic, my_sim=sim):
        runner = run_episode_periodic if (
            use_periodic and policy.periodic_rate
            and TICKS % policy.periodic_rate == 0
        ) else run_episode
        state = init_sim_state(net, agents, sim=my_sim, policy=policy)
        jax.block_until_ready(state.next_hop)
        state, logs = runner(state, net, policy, TICKS, sim=my_sim)
        jax.block_until_ready(state.road.count)
        t0 = time.time()
        state, logs = runner(state, net, policy, TICKS, sim=my_sim)
        jax.block_until_ready(state.road.count)
        ms = (time.time() - t0) / TICKS * 1e3
        rows[label] = round(ms, 3)
        if label.startswith("exact_") and state.backlog is not None:
            monitor = float(jax.device_get(logs.window_saturated.sum()))
            rows[f"{label}_monitor"] = monitor
            assert monitor == 0.0, (
                f"backlog overflow fired ({monitor}); raise the queue depth"
            )
        print(f"{label:28s} {ms:8.3f} ms/tick", flush=True)
        return state

    # 1. base tick (random policy, no routing)
    timed_episode("base_random", Policy(choice=random_choice), False)

    # 1b. EXACT random (VERDICT r4 #3): the per-SRC backlog at S=I SRC
    # queues — asserts overflow 0 (bitwise reference-exact) and reports the
    # queue memory.  TARL_G256_BACKLOG sizes Q (agents/SRC is ~30 here).
    if os.environ.get("TARL_G256_EXACT", "1") == "1":
        q_depth = int(os.environ.get("TARL_G256_BACKLOG", "128"))
        sim_exact = SimConfig(timestep=1, start_time=6 * 3600,
                              record_road_optimality=False,
                              insert_window=64, insert_backlog=q_depth,
                              insert_escalate=True, withdraw_escalate=True,
                              withdraw_depth=2, withdraw_compact=256,
                              sorted_population=True)
        st_ex = timed_episode("exact_random_backlog",
                              Policy(choice=random_choice), False,
                              my_sim=sim_exact)
        rows["exact_backlog_mb"] = round(
            st_ex.backlog.qpack.size * 4 / 2 ** 20, 1
        )

    # 2. sp with a STATIC table (lookup only)
    routing_static = dataclasses.replace(routing,
                                         refresh_rate=_NEVER_REFRESH)
    pol_static = make_policy("dijkstra", routing_static, network=net,
                             dest_inters=dest_inters)
    timed_episode("sp_static_table", pol_static, False)

    # 3. sp full (periodic refresh)
    pol = make_policy("dijkstra", routing, network=net,
                      dest_inters=dest_inters)
    state = timed_episode("sp_full_refresh10", pol, True)

    # 4. one refresh alone, on the warmed congested state
    refresh = jax.jit(lambda s: pol.refresh(s, net))
    buf = refresh(state)
    jax.block_until_ready(buf)
    t0 = time.time()
    for _ in range(5):
        buf = refresh(state)
    jax.block_until_ready(buf)
    rows["one_refresh_ms"] = round((time.time() - t0) / 5 * 1e3, 3)
    print(f"{'one_refresh':28s} {rows['one_refresh_ms']:8.3f} ms", flush=True)

    rows["refresh_amortized_ms"] = round(rows["one_refresh_ms"] / 10, 3)
    rows["lookup_ms"] = round(rows["sp_static_table"] - rows["base_random"],
                              3)
    print(json.dumps({"metric": "grid256_sp_ablation", "grid": GRID,
                      "agents": NUM_AGENTS, "zones": ZONES, "ticks": TICKS,
                      **rows}))


if __name__ == "__main__":
    main()
