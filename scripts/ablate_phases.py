"""Per-phase tick-cost ablation on the bench workload (TPU).

Times lax.scan over successive phase compositions; differences approximate
per-phase cost.  Run from /root/repo with the default (axon) environment,
one process at a time (CLAUDE.md).
"""
from __future__ import annotations

import functools
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tarl_tpu.config import SimConfig, DEFAULT_PHYSICS
from tarl_tpu.core.insert import insert_agents_windowed
from tarl_tpu.core.step import Policy, init_sim_state, run_episode
from tarl_tpu.core.withdraw import withdraw_agents
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import grid_scenario
from tarl_tpu.routing.policies import random_choice

ROWS = COLS = int(os.environ.get("TARL_BENCH_GRID", "16"))
NUM_AGENTS = int(os.environ.get("TARL_BENCH_AGENTS", "50000"))
CHUNK = int(os.environ.get("TARL_BENCH_CHUNK", "1024"))
REPS = 6


def timed(name, fn, state, *args):
    out = fn(state, *args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(REPS):
        out = fn(state, *args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    us = (time.time() - t0) / REPS / CHUNK * 1e6
    print(f"{name:28} {us:9.1f} us/tick", flush=True)
    return us


def main():
    cache = os.environ.get("TARL_BENCH_DIR") or os.path.join(
        tempfile.gettempdir(), "tarl_bench_scen"
    )
    name = f"BenchGrid{ROWS}x{COLS}_{NUM_AGENTS}"
    base = os.path.join(cache, name)
    if not os.path.exists(os.path.join(base, "network.xml")):
        grid_scenario(cache, name, rows=ROWS, cols=COLS, num_agents=NUM_AGENTS,
                      peak_start=6 * 3600, peak_spread=2 * 3600)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    sim = SimConfig(timestep=1, start_time=6 * 3600,
                    record_road_optimality=False, insert_window=1024,
                    withdraw_depth=8)
    policy = Policy(choice=random_choice)
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    physics = DEFAULT_PHYSICS
    # Warm the state into the demand window so phases do real work.
    state, _ = run_episode(state, net, policy, 600, sim=sim)
    jax.block_until_ready(state.road.count)

    @jax.jit
    def scan_insert(state):
        def body(s, _):
            road, ag, ptr, _ = insert_agents_windowed(
                s.road, s.agents, s.selected_road, net, s.time,
                s.insert_order, s.insert_ptr, sim.insert_window, physics,
            )
            return s._replace(road=road, agents=ag, insert_ptr=ptr,
                              time=s.time + 1.0), None
        return jax.lax.scan(body, state, length=CHUNK)[0]

    @jax.jit
    def scan_withdraw(state):
        def body(s, _):
            road, ag, w = withdraw_agents(s.road, s.agents, net, s.time,
                                          depth=sim.withdraw_depth)
            return s._replace(road=road, agents=ag, time=s.time + 1.0), None
        return jax.lax.scan(body, state, length=CHUNK)[0]

    @jax.jit
    def scan_choice(state):
        def body(s, _):
            s2, _ = random_choice(s, net)
            return s2._replace(time=s2.time + 1.0), None
        return jax.lax.scan(body, state, length=CHUNK)[0]

    @jax.jit
    def scan_core(state):
        from tarl_tpu.core.fused_core import fused_core_step
        def body(s, _):
            key, k = jax.random.split(s.key)
            road, popped, _ = fused_core_step(
                s.road, s.selected_road, net, s.time, k, physics,
                compute_delta=False,
            )
            return s._replace(road=road, key=key, time=s.time + 1.0), None
        return jax.lax.scan(body, state, length=CHUNK)[0]

    @jax.jit
    def scan_core_xla(state):
        from tarl_tpu.core.direction import direction_step
        from tarl_tpu.core.response import confirm_step
        def body(s, _):
            key, k = jax.random.split(s.key)
            road, _, accept, win_src = direction_step(
                s.road, s.selected_road, net, s.time, k, physics,
                compute_delta=False,
            )
            road, popped = confirm_step(road, accept, win_src, net)
            return s._replace(road=road, key=key, time=s.time + 1.0), None
        return jax.lax.scan(body, state, length=CHUNK)[0]

    @jax.jit
    def scan_direction_only(state):
        from tarl_tpu.core.direction import direction_step
        def body(s, _):
            key, k = jax.random.split(s.key)
            road, _, accept, win_src = direction_step(
                s.road, s.selected_road, net, s.time, k, physics,
                compute_delta=False,
            )
            return s._replace(road=road, key=key, time=s.time + 1.0), None
        return jax.lax.scan(body, state, length=CHUNK)[0]

    @jax.jit
    def scan_core_delta(state):
        from tarl_tpu.core.fused_core import fused_core_step
        def body(s, _):
            key, k = jax.random.split(s.key)
            road, popped, delta = fused_core_step(
                s.road, s.selected_road, net, s.time, k, physics,
                compute_delta=True,
            )
            hour = jnp.clip((s.time / 3600.0).astype(jnp.int32), 0,
                            sim.num_hours - 1)
            m = s.metrics._replace(
                delta_tt_hourly=s.metrics.delta_tt_hourly.at[hour].add(delta)
            )
            return s._replace(road=road, key=key, metrics=m,
                              time=s.time + 1.0), None
        return jax.lax.scan(body, state, length=CHUNK)[0]

    full = functools.partial(run_episode, network=net, policy=policy,
                             num_steps=CHUNK, sim=sim)

    timed("insert (W=1024)", scan_insert, state)
    timed("withdraw (depth=8)", scan_withdraw, state)
    timed("choice (random)", scan_choice, state)
    if os.environ.get("TARL_ABLATE_XLA", "0") != "0" or net.num_roads > 4096:
        timed("core xla dir+confirm", scan_core_xla, state)
        timed("core xla direction only", scan_direction_only, state)
    else:
        timed("core fused (no delta)", scan_core, state)
        timed("core fused (+delta+hourly)", scan_core_delta, state)
    timed("FULL tick", lambda s: full(s)[0], state)


if __name__ == "__main__":
    main()
