"""Sub-phase ablation of the metro-scale direction+confirm core (TPU).

Times, at Grid64x64/200k with the roll plan active:

  a. heads+pack only — the [R, Nmax] masked head extractions + the packed
     upstream word (the row-local prologue a fused kernel would own);
  b. direction_step only;
  c. direction_step + confirm_step (the production core pair);
  d. the FIFO push alone (dense [R, Nmax] selects) driven by fixed winners.

Differences localise the launch-bound cost: (b) - (a) - (d) ~ the roll/
winner mid-section, (c) - (b) ~ confirm's out-roll check.  One axon
registration, run from /root/repo with the default env, nothing else on
the TPU.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tarl_tpu.config import SimConfig, DEFAULT_PHYSICS
from tarl_tpu.core.direction import direction_step, pack_upstream, upstream_pack_layout
from tarl_tpu.core.response import confirm_step
from tarl_tpu.core.step import Policy, init_sim_state, run_episode
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
    print(f"{name:40} {us:9.1f} us/tick", flush=True)
    return us


def main():
    import tempfile

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
    from tarl_tpu.state import sort_agents_by_departure

    agents = sort_agents_by_departure(agents)
    sim = SimConfig(start_time=6 * 3600, record_road_optimality=False,
                    insert_window=1024, withdraw_depth=2,
                    insert_escalate=False, withdraw_escalate=False,
                    sorted_population=True)
    physics = DEFAULT_PHYSICS
    policy = Policy(choice=random_choice)
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    print(f"R={net.num_roads} roll B={net.in_roll_shift.shape[0]}", flush=True)
    # Warm into the demand window so queues are populated.
    state, _ = run_episode(state, net, policy, 3 * 1024, sim=sim)
    jax.block_until_ready(state.road.count)
    print("warmup done", flush=True)

    R = net.num_roads
    Nmax = state.road.nmax

    @jax.jit
    def heads_pack(state):
        def body(s, _):
            road = s.road
            hd = road.head_departure()
            hi = road.head_ids()
            hde = road.head_dests()
            ha = road.head_arrival()
            sel = s.selected_road[:R]
            sel_enc = jnp.where((sel >= 0) & (sel < R), sel, R).astype(jnp.int32)
            pack = pack_upstream(hd, road.count, net.capacity, sel_enc,
                                 s.time, physics, R, Nmax)
            # fold outputs into the carry so nothing is dead-code-eliminated
            mix = (pack.astype(jnp.float32) + hi + hde + ha).sum()
            return s._replace(time=s.time + 1.0 + 0.0 * mix), None
        return jax.lax.scan(body, state, length=CHUNK)[0]

    @jax.jit
    def dir_only(state):
        def body(s, _):
            key, k = jax.random.split(s.key)
            road, _, accept, win_src = direction_step(
                s.road, s.selected_road, net, s.time, k, physics,
                compute_delta=False,
            )
            return s._replace(road=road, key=key, time=s.time + 1.0), None
        return jax.lax.scan(body, state, length=CHUNK)[0]

    @jax.jit
    def dir_confirm(state):
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
    def push_only(state):
        accept0 = (jnp.arange(R) % 7) == 0
        agent0 = jnp.where(accept0, 5, 0)
        dest0 = jnp.where(accept0, 3, 0)

        def body(s, _):
            road = s.road
            slot = (road.head + road.count) % Nmax
            tt = jnp.maximum(
                net.free_flow,
                net.congestion_constant
                / (net.capacity + 10.0 - road.count.astype(jnp.float32)),
            )
            col = jnp.arange(Nmax, dtype=jnp.int32)[None, :]
            hit = (col == slot[:, None]) & accept0[:, None]
            road = road._replace(
                fifo_ids=jnp.where(hit, agent0[:, None], road.fifo_ids),
                fifo_arrival=jnp.where(hit, s.time, road.fifo_arrival),
                fifo_departure=jnp.where(
                    hit, (s.time + tt)[:, None], road.fifo_departure
                ),
                fifo_dest=jnp.where(hit, dest0[:, None], road.fifo_dest),
            )
            return s._replace(road=road, time=s.time + 1.0), None
        return jax.lax.scan(body, state, length=CHUNK)[0]

    from tarl_tpu.core.fused_winner import (
        direction_confirm_fused, direction_confirm_fused_tiled,
        fused_winner_ok, fused_winner_tiled_ok,
    )

    @jax.jit
    def dir_confirm_fused(state):
        def body(s, _):
            key, k = jax.random.split(s.key)
            road, _, _acc, _win, _pop = direction_confirm_fused(
                s.road, s.selected_road, net, s.time, k, physics,
                compute_delta=False,
            )
            return s._replace(road=road, key=key, time=s.time + 1.0), None
        return jax.lax.scan(body, state, length=CHUNK)[0]

    @jax.jit
    def dir_confirm_tiled(state):
        def body(s, _):
            key, k = jax.random.split(s.key)
            road, _, _acc, _win, _pop = direction_confirm_fused_tiled(
                s.road, s.selected_road, net, s.time, k, physics,
                compute_delta=False,
            )
            return s._replace(road=road, key=key, time=s.time + 1.0), None
        return jax.lax.scan(body, state, length=CHUNK)[0]

    timed("a. heads+pack", heads_pack, state)
    timed("b. direction_step", dir_only, state)
    timed("c. direction+confirm", dir_confirm, state)
    timed("d. fifo push (fixed winners)", push_only, state)
    if fused_winner_ok(net):
        e = timed("e. FUSED direction+confirm kernel", dir_confirm_fused, state)
    else:
        print("e. fused kernel gated off", flush=True)
    if fused_winner_tiled_ok(net):
        timed("f. TILED fused direction+confirm", dir_confirm_tiled, state)
    else:
        print("f. tiled kernel gated off", flush=True)


if __name__ == "__main__":
    main()
