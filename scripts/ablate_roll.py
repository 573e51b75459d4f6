"""Roll-plan A/B ablation at metro scale (TPU, one process).

Times the direction+confirm core and the FULL tick with the roll-plan
evaluation ON vs OFF (TARL_NO_ROLL trace-time gate, flipped between
freshly-wrapped jits so each mode traces its own program), plus withdraw at
several depths — everything the roll work and the withdraw-depth question
need, in ONE axon registration.

Run from /root/repo with the default (axon) env, nothing else on the TPU.
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
from tarl_tpu.core.step import Policy, init_sim_state, run_episode
from tarl_tpu.core.withdraw import withdraw_agents
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import grid_scenario
from tarl_tpu.routing.policies import random_choice

ROWS = COLS = int(os.environ.get("TARL_BENCH_GRID", "64"))
NUM_AGENTS = int(os.environ.get("TARL_BENCH_AGENTS", "200000"))
CHUNK = int(os.environ.get("TARL_BENCH_CHUNK", "512"))
REPS = 6


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    us = (time.time() - t0) / REPS / CHUNK * 1e6
    print(f"{name:36} {us:9.1f} us/tick", flush=True)
    return us


def core_scan(net, physics, sim):
    """Freshly-wrapped jit so each TARL_NO_ROLL mode traces its own
    program (jit caches would otherwise reuse the first trace)."""
    from tarl_tpu.core.direction import direction_step
    from tarl_tpu.core.response import confirm_step

    @jax.jit
    def run(state):
        def body(s, _):
            key, k = jax.random.split(s.key)
            road, _, accept, win_src = direction_step(
                s.road, s.selected_road, net, s.time, k, physics,
                compute_delta=False,
            )
            road, popped = confirm_step(road, accept, win_src, net)
            return s._replace(road=road, key=key, time=s.time + 1.0), None
        return jax.lax.scan(body, state, length=CHUNK)[0]

    return run


def withdraw_scan(net, depth, compact=None):
    @jax.jit
    def run(state):
        def body(s, _):
            road, ag, w = withdraw_agents(s.road, s.agents, net, s.time,
                                          depth=depth, compact=compact)
            return s._replace(road=road, agents=ag, time=s.time + 1.0), None
        return jax.lax.scan(body, state, length=CHUNK)[0]

    return run


def main():
    cache = os.environ.get("TARL_BENCH_DIR") or os.path.join(
        tempfile.gettempdir(), "tarl_bench_scen"
    )
    name = f"BenchGrid{ROWS}x{COLS}_{NUM_AGENTS}"
    base = os.path.join(cache, name)
    if not os.path.exists(os.path.join(base, "network.xml")):
        grid_scenario(cache, name, rows=ROWS, cols=COLS,
                      num_agents=NUM_AGENTS,
                      peak_start=6 * 3600, peak_spread=2 * 3600)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    print(f"R={net.num_roads} in_roll B={net.in_roll_shift.shape[0]} "
          f"out_roll B={net.out_roll_shift.shape[0]}", flush=True)
    sim = SimConfig(timestep=1, start_time=6 * 3600,
                    record_road_optimality=False, insert_window=1024,
                    withdraw_depth=2)
    policy = Policy(choice=random_choice)
    physics = DEFAULT_PHYSICS
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    state, _ = run_episode(state, net, policy, 600, sim=sim)
    jax.block_until_ready(state.road.count)
    print("warmup done", flush=True)

    # The undecorated episode body: run_episode's own jit cache is keyed on
    # shapes/statics only, so flipping the trace-time env var would otherwise
    # silently reuse the first mode's program.
    episode_raw = getattr(run_episode, "__wrapped__", run_episode)
    full = functools.partial(episode_raw, network=net, policy=policy,
                             num_steps=CHUNK, sim=sim)

    os.environ["TARL_NO_ROLL"] = "1"
    timed("core dir+confirm (gather)", core_scan(net, physics, sim), state)
    os.environ["TARL_NO_ROLL"] = "0"
    timed("core dir+confirm (ROLL)", core_scan(net, physics, sim), state)

    for d in (8, 2, 1):
        timed(f"withdraw depth={d}", withdraw_scan(net, d), state)
    for c in (256, 1024):
        timed(f"withdraw d=2 compact={c}", withdraw_scan(net, 2, c), state)

    # FULL tick both modes: a fresh jax.jit(lambda ...) per mode over the
    # UNDECORATED episode body, so each mode traces its own program (any
    # cached-jit re-entry would silently reuse the first mode's trace).
    os.environ["TARL_NO_ROLL"] = "1"
    f1 = jax.jit(lambda s: full(s)[0])
    timed("FULL tick (gather)", f1, state)
    os.environ["TARL_NO_ROLL"] = "0"
    f2 = jax.jit(lambda s: full(s)[0])
    timed("FULL tick (ROLL)", f2, state)

    import dataclasses
    sim_c = dataclasses.replace(sim, withdraw_compact=256)
    full_c = functools.partial(episode_raw, network=net, policy=policy,
                               num_steps=CHUNK, sim=sim_c)
    f3 = jax.jit(lambda s: full_c(s)[0])
    timed("FULL tick (ROLL + compact256)", f3, state)


if __name__ == "__main__":
    main()
