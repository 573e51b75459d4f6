"""Radial-metro shortest-path phase ablation (the VERDICT r3 #2 tail).

Same row structure as scripts/ablate_grid256.py, on the renumbered
ring-and-spoke metro (64 rings x 128 spokes, 200k CBD commuters):

1. base tick        — random policy, same sim knobs (insert/withdraw/core).
2. sp static table  — zoned policy, refresh disabled (lookup cost only).
3. sp full          — zoned policy, refresh every 10 ticks (periodic driver).
4. one refresh      — the zoned congested refresh invoked alone.

Run from /root/repo in the default (axon) environment, nothing else on
the TPU.  TARL_RAD_RINGS / _SPOKES / _AGENTS / _TICKS override.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

RINGS = int(os.environ.get("TARL_RAD_RINGS", "64"))
SPOKES = int(os.environ.get("TARL_RAD_SPOKES", "128"))
NUM_AGENTS = int(os.environ.get("TARL_RAD_AGENTS", "200000"))
TICKS = int(os.environ.get("TARL_RAD_TICKS", "510"))


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
    from tarl_tpu.io.scenarios import radial_scenario
    from tarl_tpu.routing.policies import _NEVER_REFRESH, _dest_inter
    from tarl_tpu.routing.policies import random_choice
    from tarl_tpu.simulator import make_policy
    from tarl_tpu.state import sort_agents_by_departure

    cache = os.environ.get("TARL_BENCH_DIR") or "/tmp/tarl_bench_scen"
    name = f"RadialBench{RINGS}x{SPOKES}_{NUM_AGENTS}"
    base = os.path.join(cache, name)
    if not os.path.exists(os.path.join(base, "network.xml")):
        radial_scenario(cache, name, rings=RINGS, spokes=SPOKES,
                        num_agents=NUM_AGENTS, cbd_fraction=1.0,
                        peak_start=6 * 3600, peak_spread=2 * 3600)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    agents = sort_agents_by_departure(agents)
    dest_inters = np.unique(np.asarray(_dest_inter(net, agents.dest)))
    sim = SimConfig(timestep=1, start_time=6 * 3600,
                    record_road_optimality=False,
                    insert_escalate=False, withdraw_escalate=False,
                    insert_window=1024, withdraw_depth=2,
                    sorted_population=True)
    out = {"metric": "radial_sp_ablation", "rings": RINGS, "spokes": SPOKES,
           "roads": net.num_roads, "agents": agents.num_agents,
           "zones": int(dest_inters.shape[0]), "ticks": TICKS}

    def timed(tag, policy, use_periodic=False):
        runner = run_episode_periodic if (
            use_periodic and policy.periodic_rate
            and TICKS % policy.periodic_rate == 0
        ) else run_episode
        state = init_sim_state(net, agents, sim=sim, policy=policy)
        jax.block_until_ready(state.next_hop)
        state, _ = runner(state, net, policy, TICKS, sim=sim)
        jax.block_until_ready(state.road.count)
        t0 = time.time()
        state, _ = runner(state, net, policy, TICKS, sim=sim)
        jax.block_until_ready(state.road.count)
        ms = (time.time() - t0) / TICKS * 1e3
        out[tag] = round(ms, 3)
        print(f"{tag:28} {ms:10.3f} ms/tick", flush=True)
        return state

    timed("base_random", Policy(choice=random_choice))

    static_routing = RoutingConfig(refresh_rate=_NEVER_REFRESH,
                                   max_bf_iters=8, backend="primal")
    timed("sp_static_table",
          make_policy("dijkstra", static_routing, network=net,
                      dest_inters=dest_inters))

    routing = RoutingConfig(refresh_rate=10, max_bf_iters=8,
                            backend="primal")
    pol = make_policy("dijkstra", routing, network=net,
                      dest_inters=dest_inters)
    state = timed("sp_full_refresh10", pol, use_periodic=True)

    # One refresh alone, on the warmed congested state.
    refresh = jax.jit(lambda s: pol.refresh(s, net))
    buf = refresh(state)
    jax.block_until_ready(buf)
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        buf = refresh(state)
    jax.block_until_ready(buf)
    one = (time.time() - t0) / reps * 1e3
    out["one_refresh_ms"] = round(one, 3)
    out["refresh_amortized_ms"] = round(one / routing.refresh_rate, 3)
    out["lookup_ms"] = round(out["sp_static_table"] - out["base_random"], 3)
    print(f"{'one_refresh':28} {one:10.3f} ms", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
