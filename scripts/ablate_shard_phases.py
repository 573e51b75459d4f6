"""Per-phase cost attribution for the shard_map episode tick.

Times run_episode_shard_map on a 1-device mesh with successive phases
DISABLED via the trace-time TARL_SHARD_SKIP hook in
parallel/shard_map_episode.py (diagnostic only — skipping breaks physics;
the runs here are for wall-clock attribution, not outcomes).  Differences
between configs approximate per-phase cost.  One compile per config
(~3-6 min each over this tunnel), so subset with TARL_ABL_CONFIGS.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TICKS = int(os.environ.get("TARL_ABL_TICKS", "510"))
GRID = int(os.environ.get("TARL_ABL_GRID", "64"))
AGENTS = int(os.environ.get("TARL_ABL_AGENTS", "200000"))
BACKLOG = os.environ.get("TARL_ABL_BACKLOG", "1") == "1"
# Each config: label -> comma skip list (cumulative attribution).
DEFAULT = (
    "full:|no_core:core|no_core_wd:core,withdraw|"
    "no_core_wd_ins:core,withdraw,insert|"
    "no_core_wd_ins_choice:core,withdraw,insert,choice|"
    "shell:core,withdraw,insert,choice,halo"
)
CONFIGS = [
    c.split(":") for c in os.environ.get("TARL_ABL_CONFIGS", DEFAULT).split("|")
]


def main() -> None:
    import jax

    from tarl_tpu.config import SimConfig
    from tarl_tpu.core.step import Policy, init_sim_state
    from tarl_tpu.io.matsim import load_network, load_population
    from tarl_tpu.io.scenarios import grid_scenario
    from tarl_tpu.parallel import shard_map_episode as sme
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
    mesh = sme.make_road_mesh(1)
    pol = Policy(choice=random_choice)
    if BACKLOG:
        sim = SimConfig(timestep=1, start_time=6 * 3600,
                        record_road_optimality=False,
                        insert_window=64, insert_backlog=4096,
                        insert_escalate=True, withdraw_escalate=True,
                        withdraw_depth=2, sorted_population=True)
    else:
        sim = SimConfig(timestep=1, start_time=6 * 3600,
                        record_road_optimality=False,
                        insert_window=1024, insert_escalate=False,
                        withdraw_escalate=False, withdraw_depth=2,
                        sorted_population=True)

    st = init_sim_state(net, agents, sim=sim, policy=pol)
    out = {"metric": "shard_phase_ablation", "ticks": TICKS,
           "grid": GRID, "agents": AGENTS, "backlog": BACKLOG}
    prev = None
    for label, skip in CONFIGS:
        os.environ["TARL_SHARD_SKIP"] = skip
        s, _ = sme.run_episode_shard_map(st, net, pol, TICKS, mesh, sim=sim)
        jax.block_until_ready(s.road.count)
        t0 = time.time()
        s, _ = sme.run_episode_shard_map(st, net, pol, TICKS, mesh, sim=sim)
        jax.block_until_ready(s.road.count)
        ms = round((time.time() - t0) / TICKS * 1e3, 3)
        delta = None if prev is None else round(prev - ms, 3)
        prev = ms
        out[label + "_ms"] = ms
        print(f"{label} (skip={skip!r}): {ms} ms/tick"
              + (f"  [phase ~{delta} ms]" if delta is not None else ""),
              flush=True)
    os.environ.pop("TARL_SHARD_SKIP", None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
