"""Phase ablation for congested shortest-path routing at Grid64x64/200k.

Times three configurations over 1024 ticks (after warmup), printing the
implied per-tick cost of (a) the base simulation, (b) the per-tick next-road
lookups, and (c) the amortized congested refresh:

  random  — random policy (base tick);
  sp-norf — shortest-path, refresh_rate > episode (init table only);
  sp-full — shortest-path, refresh_rate=10, max_bf_iters=8 (the bench row).

Run from /root/repo on the TPU, one axon process at a time.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

GRID = int(os.environ.get("TARL_ROUTE_GRID", "64"))
NUM_AGENTS = int(os.environ.get("TARL_ROUTE_AGENTS", "200000"))
TICKS = 1024


def main() -> None:
    from tarl_tpu.config import RoutingConfig, SimConfig
    from tarl_tpu.core.step import init_sim_state, run_episode
    from tarl_tpu.io.matsim import load_network, load_population
    from tarl_tpu.io.scenarios import grid_scenario
    from tarl_tpu.simulator import make_policy

    cache = os.path.join("/tmp", "tarl_bench_scen")
    name = f"RouteGrid{GRID}_{NUM_AGENTS}"
    base = os.path.join(cache, name)
    if not os.path.exists(os.path.join(base, "network.xml")):
        grid_scenario(cache, name, rows=GRID, cols=GRID,
                      num_agents=NUM_AGENTS,
                      peak_start=6 * 3600, peak_spread=2 * 3600)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    sim = SimConfig(timestep=1, start_time=6 * 3600,
                    record_road_optimality=False,
                    insert_window=4096, withdraw_depth=8)

    import jax.numpy as jnp

    sim_small = SimConfig(timestep=1, start_time=6 * 3600,
                          record_road_optimality=False,
                          insert_window=1024, withdraw_depth=2)
    sim_d1 = SimConfig(timestep=1, start_time=6 * 3600,
                       record_road_optimality=False,
                       insert_window=1024, withdraw_depth=1)

    results, finals = {}, {}
    for label, algo, rr, cfg in [
        ("random", "random", None, sim),
        ("sp-nocond", "dijkstra", 10**9, sim),     # static no-refresh path
        ("sp-cond", "dijkstra", 10**9 - 1, sim),   # same, via per-tick cond
        ("sp-full", "dijkstra", 10, sim),
        ("sp-full-w1k", "dijkstra", 10, sim_small),
        ("sp-full-w1k-d1", "dijkstra", 10, sim_d1),
    ]:
        routing = (RoutingConfig(refresh_rate=rr, max_bf_iters=8,
                                 backend="primal") if rr else None)
        policy = (make_policy(algo, routing, network=net) if routing
                  else make_policy(algo, network=net))
        t0 = time.time()
        state = init_sim_state(net, agents, sim=cfg, policy=policy)
        jax.block_until_ready(state.next_hop)
        init_s = time.time() - t0
        state, _ = run_episode(state, net, policy, TICKS, sim=cfg)
        jax.block_until_ready(state.road.count)
        t0 = time.time()
        state, _ = run_episode(state, net, policy, TICKS, sim=cfg)
        jax.block_until_ready(state.road.count)
        ms = (time.time() - t0) / TICKS * 1e3
        results[label] = ms
        finals[label] = state
        print(f"{label:12} {ms:7.3f} ms/tick  (init {init_s:.1f}s, "
              f"done {int(jax.device_get(state.agents.done[1:].sum()))})",
              flush=True)

    print(f"\nlookup cost/tick:  {results['sp-nocond'] - results['random']:.3f} ms")
    print(f"cond cost/tick:    {results['sp-cond'] - results['sp-nocond']:.3f} ms")
    print(f"refresh cost/tick: {results['sp-full'] - results['sp-cond']:.3f} ms")
    a = finals["sp-full"].agents
    b = finals["sp-full-w1k"].agents
    same = bool(jnp.array_equal(a.arrival, b.arrival))
    print(f"W=4096/d=8 vs W=1024/d=2 arrivals identical: {same}")
    if not same:
        d = int(jnp.sum(a.arrival != b.arrival))
        print(f"  mismatched arrivals: {d} / {a.arrival.shape[0]}")
    c = finals["sp-full-w1k-d1"].agents
    same1 = bool(jnp.array_equal(a.arrival, c.arrival))
    print(f"W=4096/d=8 vs W=1024/d=1 arrivals identical: {same1}")
    if not same1:
        d = int(jnp.sum(a.arrival != c.arrival))
        print(f"  mismatched arrivals: {d} / {a.arrival.shape[0]}")


if __name__ == "__main__":
    main()
