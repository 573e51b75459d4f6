"""On-chip A/B of the multisweep refresh tile width (TARL_SWEEP_TILE_D).

The Grid64 shortest-path tick is now refresh-dominated (the fused winner
kernel removed the core cost); the refresh kernel runs a per-tile
early-exiting while_loop over [I, tile_d] column tiles.  This times the
FULL policy.refresh at several tile widths in one axon registration
(fresh jit + cleared caches per width, so each traces its own program).

Run from /root/repo, default env, nothing else on the TPU.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

REPS = 10


def main():
    from tarl_tpu.config import RoutingConfig, SimConfig
    from tarl_tpu.core.step import Policy, init_sim_state, run_episode
    from tarl_tpu.io.matsim import load_network, load_population
    from tarl_tpu.routing.policies import random_choice
    from tarl_tpu.simulator import make_policy
    from tarl_tpu.state import sort_agents_by_departure

    base = "/tmp/tarl_bench_scen/RouteGrid64_200000"
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    agents = sort_agents_by_departure(agents)
    routing = RoutingConfig(refresh_rate=10, max_bf_iters=8, backend="primal")
    sim = SimConfig(timestep=1, start_time=6 * 3600,
                    record_road_optimality=False, insert_window=1024,
                    withdraw_depth=2, sorted_population=True,
                    insert_escalate=False, withdraw_escalate=False)
    policy = make_policy("dijkstra", routing, network=net)
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    jax.block_until_ready(state.next_hop)
    # Warm into the peak so the refresh does real (congested) work.
    warm_pol = Policy(choice=random_choice)
    state2 = init_sim_state(net, agents, sim=sim, policy=warm_pol)
    state2, _ = run_episode(state2, net, warm_pol, 2048, sim=sim)
    state = state._replace(road=state2.road, agents=state2.agents,
                           time=state2.time, insert_ptr=state2.insert_ptr)
    jax.block_until_ready(state.road.count)
    print("warmup done", flush=True)

    for tile in (128, 256, 512, 1024):
        os.environ["TARL_SWEEP_TILE_D"] = str(tile)
        jax.clear_caches()

        @jax.jit
        def refresh(s):
            return policy.refresh(s, net)

        buf = refresh(state)
        jax.block_until_ready(buf)
        t0 = time.time()
        for _ in range(REPS):
            buf = refresh(state)
        jax.block_until_ready(buf)
        ms = (time.time() - t0) / REPS * 1e3
        print(f"tile_d={tile:5d}: {ms:8.2f} ms/refresh", flush=True)


if __name__ == "__main__":
    main()
