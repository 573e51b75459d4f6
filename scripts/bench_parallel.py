"""Parallel-path performance story on the real chip (VERDICT r4 #5).

Three measurements, all single-chip (multi-chip hardware is not reachable
from this host — the point is the OVERHEAD of the sharded formulations, not
scaling):

(a) ``run_episode_shard_map`` on a 1-device mesh vs serial ``run_episode``
    at Grid64x64 / 200k agents — random (exact backlog insert on BOTH
    sides) and congested shortest-path (whole-population insert on both
    sides, primal backend, refresh 10 / cap 8);
(b) one SpatialPPO train iteration (1-device mesh) vs unsharded
    ``PPO.train_iteration`` at Grid8x8 / 5k agents;
(c) the in-graph PPO north star re-measured on the current core:
    env-steps/s while training (rollout_steps * iterations / wall).

Writes runs/parallel/report.json and prints one JSON line.

Run from /root/repo in the default (axon) environment; one TPU process at
a time, nothing CPU-heavy concurrent.  TARL_PAR_SECTIONS selects a comma
subset of {episode,ppo} for partial re-runs.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

TICKS = int(os.environ.get("TARL_PAR_TICKS", "510"))
SECTIONS = os.environ.get("TARL_PAR_SECTIONS", "episode,ppo").split(",")


def _episode_section(report):
    import numpy as np

    from tarl_tpu.config import RoutingConfig, SimConfig
    from tarl_tpu.core.step import (
        Policy,
        init_sim_state,
        run_episode,
    )
    from tarl_tpu.io.matsim import load_network, load_population
    from tarl_tpu.io.scenarios import grid_scenario
    from tarl_tpu.parallel.shard_map_episode import (
        make_road_mesh,
        run_episode_shard_map,
    )
    from tarl_tpu.routing.policies import random_choice
    from tarl_tpu.simulator import make_policy
    from tarl_tpu.state import sort_agents_by_departure

    cache = os.environ.get("TARL_BENCH_DIR") or os.path.join(
        tempfile.gettempdir(), "tarl_bench_scen"
    )
    name = "ParGrid64_200k"
    base = os.path.join(cache, name)
    if not os.path.exists(os.path.join(base, "network.xml")):
        grid_scenario(cache, name, rows=64, cols=64, num_agents=200000,
                      peak_start=6 * 3600, peak_spread=3 * 3600)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    agents = sort_agents_by_departure(agents)
    A = agents.num_agents
    mesh = make_road_mesh(1)
    routing = RoutingConfig(refresh_rate=10, max_bf_iters=8,
                            backend="primal")

    def timed(run, *args, **kw):
        s, _ = run(*args, **kw)
        jax.block_until_ready(s.road.count)
        t0 = time.time()
        s, _ = run(*args, **kw)
        jax.block_until_ready(s.road.count)
        return (time.time() - t0) / TICKS * 1e3  # ms/tick

    # -- random, exact backlog on both sides ------------------------------
    sim_r = SimConfig(timestep=1, start_time=6 * 3600,
                      record_road_optimality=False,
                      insert_window=64, insert_backlog=4096,
                      insert_escalate=True, withdraw_escalate=True,
                      withdraw_depth=2, sorted_population=True)
    pol_r = Policy(choice=random_choice)
    st = init_sim_state(net, agents, sim=sim_r, policy=pol_r)
    ms = timed(run_episode, st, net, pol_r, TICKS, sim=sim_r)
    report["ep_random_serial_ms"] = round(ms, 3)
    ms = timed(run_episode_shard_map, st, net, pol_r, TICKS, mesh, sim=sim_r)
    report["ep_random_shard1_ms"] = round(ms, 3)
    report["ep_random_overhead_x"] = round(
        report["ep_random_shard1_ms"] / report["ep_random_serial_ms"], 2
    )
    print(f"episode random: serial {report['ep_random_serial_ms']} ms/tick, "
          f"shard(1) {report['ep_random_shard1_ms']} ms/tick "
          f"({report['ep_random_overhead_x']}x)", flush=True)

    # -- shortest path, whole-population insert on both sides -------------
    sim_s = SimConfig(timestep=1, start_time=6 * 3600,
                      record_road_optimality=False,
                      insert_window=None, withdraw_depth=2,
                      sorted_population=True)
    pol_s = make_policy("dijkstra", routing, network=net)
    st = init_sim_state(net, agents, sim=sim_s, policy=pol_s)
    jax.block_until_ready(st.next_hop)
    ms = timed(run_episode, st, net, pol_s, TICKS, sim=sim_s)
    report["ep_sp_serial_ms"] = round(ms, 3)
    ms = timed(run_episode_shard_map, st, net, pol_s, TICKS, mesh,
               sim=sim_s, routing=routing)
    report["ep_sp_shard1_ms"] = round(ms, 3)
    report["ep_sp_overhead_x"] = round(
        report["ep_sp_shard1_ms"] / report["ep_sp_serial_ms"], 2
    )
    report["ep_agents"] = A
    print(f"episode sp: serial {report['ep_sp_serial_ms']} ms/tick, "
          f"shard(1) {report['ep_sp_shard1_ms']} ms/tick "
          f"({report['ep_sp_overhead_x']}x)", flush=True)


def _ppo_section(report):
    from tarl_tpu.config import RLConfig
    from tarl_tpu.core.step import Policy, init_sim_state
    from tarl_tpu.io.matsim import load_network, load_population
    from tarl_tpu.io.scenarios import ensure_scenario
    from tarl_tpu.models.mpnn import MPNNPolicyNet, MPNNValueNetSimple
    from tarl_tpu.parallel.spatial_ppo import SpatialPPO, make_spatial_mesh
    from tarl_tpu.rl.ppo import PPO
    from tarl_tpu.routing.policies import random_choice

    cache = os.environ.get("TARL_BENCH_DIR") or os.path.join(
        tempfile.gettempdir(), "tarl_bench_scen"
    )
    base = ensure_scenario(cache, "Grid8x8")
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    from tarl_tpu.config import SimConfig
    from tarl_tpu.state import sort_agents_by_departure

    agents = sort_agents_by_departure(agents)
    rl = RLConfig(rollout_steps=256, minibatch_size=128, num_epochs=5)

    def make_ppo(sim_cfg):
        return PPO(
            net,
            MPNNPolicyNet(num_nodes=net.num_nodes,
                          num_node_embeddings=net.num_roads + 1,
                          use_distance_prior=True, prior_scale=30.0),
            MPNNValueNetSimple(),
            rl=rl,
            sim_cfg=sim_cfg,
        )

    def timed_iter(step, ts, n=3):
        ts, m = step(ts)          # compile + warm
        jax.block_until_ready(m.loss_total)
        t0 = time.time()
        for _ in range(n):
            ts, m = step(ts)
        jax.block_until_ready(m.loss_total)
        return (time.time() - t0) / n

    # (c) the r2-comparable north star (docs/BENCH.md:286-291): windowed
    # insert, default reward mode, 256-step rollout, 5x2 minibatch epochs.
    sim_w = SimConfig(insert_window=1024, sorted_population=True)
    ppo_w = make_ppo(sim_w)
    state = init_sim_state(net, agents, sim=sim_w,
                           policy=Policy(choice=random_choice))
    it_s = timed_iter(ppo_w.train_iteration,
                      ppo_w.init(state, jax.random.PRNGKey(0)))
    report["ppo_iter_s"] = round(it_s, 4)
    report["ppo_env_steps_per_sec"] = round(rl.rollout_steps / it_s, 1)
    print(f"PPO unsharded (windowed): {it_s * 1e3:.1f} ms/iteration "
          f"({report['ppo_env_steps_per_sec']:,.0f} env-steps/s while "
          "training)", flush=True)

    # (b) SpatialPPO overhead, matched configs (whole-population insert —
    # the env formulation SpatialPPO mirrors).
    sim_wp = SimConfig()
    ppo_wp = make_ppo(sim_wp)
    state_wp = init_sim_state(net, agents, sim=sim_wp,
                              policy=Policy(choice=random_choice))
    ts_wp = ppo_wp.init(state_wp, jax.random.PRNGKey(0))
    it_wp = timed_iter(ppo_wp.train_iteration, ts_wp)
    report["ppo_wholepop_iter_s"] = round(it_wp, 4)
    spat = SpatialPPO(ppo_wp, make_spatial_mesh(1))
    it_sp = timed_iter(spat.train_iteration, ts_wp)
    report["spatial_ppo_iter_s"] = round(it_sp, 4)
    report["spatial_ppo_overhead_x"] = round(it_sp / it_wp, 2)
    print(f"PPO unsharded (whole-pop): {it_wp * 1e3:.1f} ms/iteration; "
          f"SpatialPPO(1): {it_sp * 1e3:.1f} ms/iteration "
          f"({report['spatial_ppo_overhead_x']}x matched)", flush=True)


def main() -> None:
    report = {"metric": "parallel_path_overhead", "ticks": TICKS,
              "backend": jax.default_backend()}
    if "episode" in SECTIONS:
        _episode_section(report)
    if "ppo" in SECTIONS:
        _ppo_section(report)
    os.makedirs("runs/parallel", exist_ok=True)
    with open("runs/parallel/report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
