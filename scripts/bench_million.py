"""Million-agent datapoint (VERDICT r2 next-step #9): Grid128x128, 1M
agents, zoned destination-restricted congested shortest-path routing.

Times, on the real chip, with the native C++ MATSim parser:

* ingest        — network + population XML parse (io.native fast path);
* table init    — free-flow dist[I, D] (host scipy) + upload;
* episode       — ticks/s over TICKS ticks after warmup, shortest-path
                  (primal dest-restricted backend, refresh 10 / cap 8) AND
                  the random-policy base;
* conservation  — sum(road.count) == #on-way, done+on-way+waiting == A-1.

Writes one JSON line, and a copy to runs/million/report.json.

Run from /root/repo in the default (axon) environment, one TPU process at
a time, nothing CPU-heavy concurrent (single-core host starves the tunnel).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

GRID = int(os.environ.get("TARL_M_GRID", "128"))
NUM_AGENTS = int(os.environ.get("TARL_M_AGENTS", "1000000"))
ZONES = int(os.environ.get("TARL_M_ZONES", "256"))
# Refresh-aligned (multiple of refresh_rate=10) so the shortest-path pass
# uses the hoisted periodic driver (core.step.run_episode_periodic).
TICKS = int(os.environ.get("TARL_M_TICKS", "1020"))
# Comma-separated subset of {sp, random} — lets a kernel A/B re-measure one
# policy without paying the other's table init / compile.
ALGOS = os.environ.get("TARL_M_ALGOS", "sp,random").split(",")
# Exact-semantics rows (VERDICT r4 #3): for the random policy the per-SRC
# backlog (bitwise reference-exact, asserts overflow == 0); for the zoned
# shortest-path policy (per-agent entry roads — incompatible with the
# per-SRC queues) exactness = windowed escalation, measured as its own row.
# Queue depth: agents/SRC here is ~NUM_AGENTS/I (~60 at Grid128/1M), so a
# modest Q bounds memory — S*Q*2 int32 (reported as exact_backlog_mb).
EXACT = os.environ.get("TARL_M_EXACT", "1") == "1"
BACKLOG_Q = int(os.environ.get("TARL_M_BACKLOG", "256"))
EXACT_WINDOW = int(os.environ.get("TARL_M_EXACT_WINDOW", "64"))


def main() -> None:
    import numpy as np

    from tarl_tpu.config import RoutingConfig, SimConfig
    from tarl_tpu.core.step import init_sim_state, run_episode
    from tarl_tpu.io.matsim import load_network, load_population
    from tarl_tpu.io.scenarios import grid_scenario
    from tarl_tpu.routing.policies import _dest_inter
    from tarl_tpu.simulator import make_policy
    from tarl_tpu.state import sort_agents_by_departure

    cache = os.environ.get("TARL_BENCH_DIR") or "/tmp/tarl_bench_scen"
    name = f"MillionGrid{GRID}_{NUM_AGENTS}_z{ZONES}"
    base = os.path.join(cache, name)
    if not os.path.exists(os.path.join(base, "network.xml")):
        t0 = time.time()
        grid_scenario(cache, name, rows=GRID, cols=GRID,
                      num_agents=NUM_AGENTS,
                      peak_start=6 * 3600, peak_spread=3 * 3600,
                      num_dest_zones=ZONES)
        print(f"scenario generated in {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    net = load_network(os.path.join(base, "network"))
    t_net = time.time() - t0
    t0 = time.time()
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    t_pop = time.time() - t0
    agents = sort_agents_by_departure(agents)
    print(f"ingest: network {t_net:.1f}s, population {t_pop:.1f}s "
          f"(R={net.num_roads}, I={net.num_intersections}, "
          f"A={agents.num_agents})", flush=True)

    routing = RoutingConfig(refresh_rate=10, max_bf_iters=8, backend="primal")
    sim = SimConfig(timestep=1, start_time=6 * 3600,
                    record_road_optimality=False,
                    insert_window=4096, withdraw_depth=2,
                    sorted_population=True)
    dest_inters = np.unique(np.asarray(_dest_inter(net, agents.dest)))

    report = {
        "metric": "million_agent_datapoint",
        "grid": GRID, "agents": agents.num_agents, "zones": ZONES,
        "roads": net.num_roads, "ticks": TICKS,
        "ingest_network_s": round(t_net, 1),
        "ingest_population_s": round(t_pop, 1),
    }
    rows = []
    for label, algo in (("sp", "dijkstra"), ("random", "random")):
        if label not in ALGOS:
            continue
        rows.append((label, algo, sim))
        if EXACT and algo == "random":
            rows.append((f"exact_{label}", algo, SimConfig(
                timestep=1, start_time=6 * 3600,
                record_road_optimality=False,
                insert_window=EXACT_WINDOW, insert_backlog=BACKLOG_Q,
                insert_escalate=True, withdraw_escalate=True,
                withdraw_depth=2, sorted_population=True,
            )))
        elif EXACT and algo == "dijkstra":
            rows.append((f"exact_{label}", algo, SimConfig(
                timestep=1, start_time=6 * 3600,
                record_road_optimality=False,
                insert_window=4096, insert_escalate=True,
                withdraw_escalate=True, withdraw_depth=2,
                sorted_population=True,
            )))
    for label, algo, simr in rows:
        if algo == "dijkstra":
            policy = make_policy(algo, routing, network=net,
                                 dest_inters=dest_inters)
        else:
            policy = make_policy(algo, network=net)
        from tarl_tpu.core.step import run_episode_periodic

        runner = run_episode_periodic if (
            policy.periodic_rate and TICKS % policy.periodic_rate == 0
        ) else run_episode
        t0 = time.time()
        state = init_sim_state(net, agents, sim=simr, policy=policy)
        jax.block_until_ready(state.next_hop)
        init_s = time.time() - t0
        state, logs = runner(state, net, policy, TICKS, sim=simr)
        jax.block_until_ready(state.road.count)
        t0 = time.time()
        state, logs = runner(state, net, policy, TICKS, sim=simr)
        jax.block_until_ready(state.road.count)
        wall = time.time() - t0

        a = state.agents
        done = int(jax.device_get(a.done[1:].sum()))
        on_way = int(jax.device_get(a.on_way[1:].sum()))
        queued = int(jax.device_get(state.road.count.sum()))
        waiting = (agents.num_agents - 1) - done - on_way
        assert queued == on_way, f"conservation: queues {queued} != on_way {on_way}"
        assert waiting >= 0
        report.update({
            f"{label}_steps_per_sec": round(agents.num_agents * TICKS / wall, 1),
            f"{label}_per_tick_ms": round(wall / TICKS * 1e3, 3),
            f"{label}_init_s": round(init_s, 1),
            f"{label}_done": done, f"{label}_on_way": on_way,
        })
        if label.startswith("exact_"):
            monitor = float(jax.device_get(logs.window_saturated.sum()))
            report[f"{label}_monitor"] = monitor
            if state.backlog is not None:
                report["exact_backlog_mb"] = round(
                    state.backlog.qpack.size * 4 / 2 ** 20, 1
                )
                # overflow 0 == bitwise reference-exact (insert.py docstring)
                assert monitor == 0.0, (
                    f"backlog overflow fired ({monitor}); raise TARL_M_BACKLOG"
                )
        print(f"{label}: {report[f'{label}_per_tick_ms']} ms/tick, "
              f"{report[f'{label}_steps_per_sec'] / 1e6:.1f}M agent-steps/s, "
              f"done {done}, on_way {on_way} (== queued {queued})", flush=True)

    os.makedirs("runs/million", exist_ok=True)
    # Per-shape report file so re-runs at other scales don't clobber the
    # recorded Grid128/1M datapoint (runs/million/report.json).
    out = ("runs/million/report.json" if (GRID, NUM_AGENTS) == (128, 1000000)
           else f"runs/million/report_grid{GRID}_{NUM_AGENTS // 10**6}m.json")
    if set(ALGOS) != {"sp", "random"}:  # partial run: don't clobber the record
        out = out.replace(".json", f"_{'_'.join(ALGOS)}.json")
    os.makedirs("runs/million", exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
