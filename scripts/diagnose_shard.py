"""Bisect the shard(1)-vs-serial episode overhead at Grid64 random
(scripts/bench_parallel.py measured 12.3x with the exact backlog).

Times run_episode_shard_map on a 1-device mesh under several configs to
attribute the overhead: exact backlog vs bounded windowed insert, fused
shard winner kernel on/off, roll plan on/off.  One TPU process at a time.

TARL_DIAG_CONFIGS comma-list from
{serial_bounded,serial_backlog,shard_backlog,shard_bounded} to subset.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

TICKS = int(os.environ.get("TARL_DIAG_TICKS", "510"))
GRID = int(os.environ.get("TARL_DIAG_GRID", "64"))
AGENTS = int(os.environ.get("TARL_DIAG_AGENTS", "200000"))
CONFIGS = os.environ.get(
    "TARL_DIAG_CONFIGS",
    "serial_bounded,serial_backlog,shard_bounded,shard_backlog",
).split(",")


def main() -> None:
    from tarl_tpu.config import SimConfig
    from tarl_tpu.core.step import Policy, init_sim_state, run_episode
    from tarl_tpu.io.matsim import load_network, load_population
    from tarl_tpu.io.scenarios import grid_scenario
    from tarl_tpu.parallel.shard_map_episode import (
        make_road_mesh,
        run_episode_shard_map,
    )
    from tarl_tpu.routing.policies import random_choice
    from tarl_tpu.state import sort_agents_by_departure

    cache = os.environ.get("TARL_BENCH_DIR") or "/tmp/tarl_bench_scen"
    name = ("ParGrid64_200k" if (GRID, AGENTS) == (64, 200000)
            else f"DiagGrid{GRID}_{AGENTS}")
    base = os.path.join(cache, name)
    if not os.path.exists(os.path.join(base, "network.xml")):
        grid_scenario(cache, name, rows=GRID, cols=GRID, num_agents=AGENTS,
                      peak_start=6 * 3600, peak_spread=3 * 3600)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    agents = sort_agents_by_departure(agents)
    mesh = make_road_mesh(1)
    pol = Policy(choice=random_choice)

    sim_backlog = SimConfig(timestep=1, start_time=6 * 3600,
                            record_road_optimality=False,
                            insert_window=64, insert_backlog=4096,
                            insert_escalate=True, withdraw_escalate=True,
                            withdraw_depth=2, sorted_population=True)
    sim_bounded = SimConfig(timestep=1, start_time=6 * 3600,
                            record_road_optimality=False,
                            insert_window=1024, insert_backlog=None,
                            insert_escalate=False, withdraw_escalate=False,
                            withdraw_depth=2, sorted_population=True)

    def timed(run, sim, *extra):
        st = init_sim_state(net, agents, sim=sim, policy=pol)
        s, _ = run(st, net, pol, TICKS, *extra, sim=sim)
        jax.block_until_ready(s.road.count)
        t0 = time.time()
        s, _ = run(st, net, pol, TICKS, *extra, sim=sim)
        jax.block_until_ready(s.road.count)
        return round((time.time() - t0) / TICKS * 1e3, 3)

    out = {"metric": "shard_overhead_bisect", "ticks": TICKS}
    for cfg in CONFIGS:
        sim = sim_backlog if cfg.endswith("backlog") else sim_bounded
        if cfg.startswith("serial"):
            ms = timed(run_episode, sim)
        else:
            ms = timed(run_episode_shard_map, sim, mesh)
        out[cfg + "_ms"] = ms
        print(f"{cfg}: {ms} ms/tick", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
