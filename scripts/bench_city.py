"""Real-city datapoint: irregular OSM-like network end to end (VERDICT r4 #2).

Every other benchmark network is a template (grids, one radial); this one
ingests the procedurally-synthesized irregular city (io.city.city_scenario:
blue-noise mesh, arterial hierarchy, river + bridges, one-way locals,
OSM-style degree-2 segmentation, opaque node ids that scramble ALL locality
in sorted-id order) through the full path — gz XML parse -> build_network
(renumbering search incl. the Hilbert candidate) -> random (EXACT per-SRC
backlog) and zoned congested shortest-path episodes — and reports
throughput next to the roll-plan/renumbering structure stats.

Run from /root/repo in the default (axon) environment, one TPU process at
a time.  TARL_CITY_INTERS / _AGENTS / _TICKS / _SECTIONS override.
Prints one JSON line; also writes runs/city/report.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

INTERS = int(os.environ.get("TARL_CITY_INTERS", "9000"))
NUM_AGENTS = int(os.environ.get("TARL_CITY_AGENTS", "250000"))
TICKS = int(os.environ.get("TARL_CITY_TICKS", "1020"))
SECTIONS = os.environ.get("TARL_CITY_SECTIONS", "random,sp").split(",")


def main() -> None:
    import numpy as np

    from tarl_tpu.config import RoutingConfig, SimConfig
    from tarl_tpu.core.step import (
        init_sim_state,
        run_episode,
        run_episode_periodic,
    )
    from tarl_tpu.io.city import city_scenario
    from tarl_tpu.io.matsim import load_network, load_population
    from tarl_tpu.routing.policies import _dest_inter, random_choice
    from tarl_tpu.simulator import make_policy
    from tarl_tpu.state import sort_agents_by_departure

    cache = os.environ.get("TARL_BENCH_DIR") or "/tmp/tarl_bench_scen"
    name = f"CityBench{INTERS}_{NUM_AGENTS}"
    base = os.path.join(cache, name)
    if not os.path.exists(os.path.join(base, "network.xml.gz")):
        t0 = time.time()
        city_scenario(cache, name, num_intersections=INTERS,
                      num_agents=NUM_AGENTS, num_dest_zones=256,
                      peak_start=6 * 3600, peak_spread=2 * 3600)
        print(f"generated in {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    net = load_network(os.path.join(base, "network"))
    ingest_net_s = time.time() - t0
    t0 = time.time()
    agents, stats = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    ingest_pop_s = time.time() - t0
    agents = sort_agents_by_departure(agents)

    city_stats = json.load(open(os.path.join(base, "city_stats.json")))
    out = {
        "metric": "city_datapoint",
        "intersections": net.num_intersections,
        "roads": net.num_roads,
        "agents": agents.num_agents,
        "ticks": TICKS,
        "ingest_network_s": round(ingest_net_s, 1),
        "ingest_population_s": round(ingest_pop_s, 1),
        "nmax": int(net.capacity.max()) + 1,
        "renumbered": bool(net.renumbered),
        "roll_buckets": len(net.in_roll_shift_t),
        "roll_exceptions": (
            int(net.in_roll_exc_src.shape[0])
            if net.in_roll_shift_t else None
        ),
        "one_way_links": city_stats["one_way_links"],
        "bridges": city_stats["bridges"],
        "mean_degree": round(city_stats["mean_degree"], 2),
        "coord_plans": city_stats["coord_plans"],
        "selected_agents": stats.selected_agents,
    }

    def run(policy, sim, label):
        runner = run_episode_periodic if (
            getattr(policy, "periodic_rate", None)
            and TICKS % policy.periodic_rate == 0
        ) else run_episode
        t0 = time.time()
        state = init_sim_state(net, agents, sim=sim, policy=policy)
        jax.block_until_ready(state.road.count)
        init_s = time.time() - t0
        state, log = runner(state, net, policy, TICKS, sim=sim)
        jax.block_until_ready(state.road.count)
        t0 = time.time()
        state, log = runner(state, net, policy, TICKS, sim=sim)
        jax.block_until_ready(state.road.count)
        wall = time.time() - t0
        out[f"{label}_steps_per_sec"] = round(
            agents.num_agents * TICKS / wall, 1
        )
        out[f"{label}_per_tick_ms"] = round(wall / TICKS * 1e3, 3)
        out[f"{label}_init_s"] = round(init_s, 1)
        out[f"{label}_done"] = int(jax.device_get(state.agents.done[1:].sum()))
        out[f"{label}_on_way"] = int(jax.device_get(state.road.count.sum()))
        if log is not None and getattr(log, "window_saturated", None) is not None:
            sat = float(jax.device_get(log.window_saturated.sum()))
            out[f"{label}_overflow"] = sat

    if "random" in SECTIONS:
        # EXACT per-SRC backlog semantics (the headline mode) on the
        # irregular network; overflow 0 == bitwise reference-exact.
        sim = SimConfig(timestep=1, start_time=6 * 3600,
                        record_road_optimality=False,
                        sorted_population=True,
                        insert_window=32, insert_backlog=8192,
                        withdraw_depth=2, withdraw_escalate=True,
                        withdraw_compact=256)
        run(make_policy("random", RoutingConfig()), sim, "random")
        if out.get("random_overflow") == 0.0:
            out["random_exact"] = True

    if "sp" in SECTIONS:
        routing = RoutingConfig(refresh_rate=10, max_bf_iters=8,
                                backend="primal")
        sim = SimConfig(timestep=1, start_time=6 * 3600,
                        record_road_optimality=False,
                        insert_escalate=False, withdraw_escalate=False,
                        insert_window=1024, withdraw_depth=2,
                        sorted_population=True)
        dest_inters = np.unique(np.asarray(_dest_inter(net, agents.dest)))
        out["dest_zones"] = int(dest_inters.shape[0])
        policy = make_policy("dijkstra", routing, network=net,
                             dest_inters=dest_inters)
        run(policy, sim, "sp")

    os.makedirs("runs/city", exist_ok=True)
    with open("runs/city/report.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
