"""Isolate the direction sample's cost: gumbel PRNG vs score gathers.

Variants of the slot-loop winner pick on the Grid64x64 bench state:
  a) gathers only (scores precomputed constant)
  b) threefry gumbel only (no gathers)
  c) full, with the rbg PRNG (hardware RNG) instead of threefry
  d) slot-major scores: logits laid out [KIN, R] so slots are static rows

Run from /root/repo with the default (axon) environment.
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tarl_tpu.config import SimConfig
from tarl_tpu.core.step import Policy, init_sim_state, run_episode
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import grid_scenario
from tarl_tpu.routing.policies import random_choice

ROWS = COLS = 64
NUM_AGENTS = 200000
CHUNK = 1024
REPS = 4


def timed(name, fn, state):
    out = fn(state)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(REPS):
        out = fn(state)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    us = (time.time() - t0) / REPS / CHUNK * 1e6
    print(f"{name:40} {us:9.1f} us/tick", flush=True)
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
                    withdraw_depth=8, fused_core=False)
    policy = Policy(choice=random_choice)
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    state, _ = run_episode(state, net, policy, 600, sim=sim)
    jax.block_until_ready(state.road.count)

    R = net.num_roads
    E = net.num_turn_edges
    KIN = net.in_src_tab.shape[0]
    NEG_INF = jnp.float32(-jnp.inf)
    rng = np.random.default_rng(0)
    const_scores = jnp.asarray(rng.random(E), jnp.float32)
    # slot-major constant index map [KIN, R] -> position in a [KIN*R] layout
    slot_scores_const = jnp.asarray(rng.random((KIN, R)), jnp.float32)

    def scanned(body):
        @jax.jit
        def run(state):
            return jax.lax.scan(body, state, length=CHUNK)[0]
        return run

    def loop_from(scores_fn):
        def body(s, _):
            key, k = jax.random.split(s.key)
            scores = scores_fn(s, k)
            best = jnp.full((R,), NEG_INF, jnp.float32)
            win_edge = jnp.full((R,), E, jnp.int32)
            for kk in range(KIN):
                e_k = net.in_src_tab[kk]  # stand-in unsorted index
                s_k = jnp.where(net.in_edge_ok[kk], scores[e_k % E], NEG_INF)
                take = s_k > best
                best = jnp.where(take, s_k, best)
                win_edge = jnp.where(take, e_k, win_edge)
            return s._replace(key=key, time=s.time + 0 * best[0] + 1.0), None
        return body

    timed("a) gathers only (const scores)",
          scanned(loop_from(lambda s, k: const_scores + s.time * 0)), state)

    def gumbel_only(s, _):
        key, k = jax.random.split(s.key)
        g = jax.random.gumbel(k, (E,), jnp.float32)
        return s._replace(key=key, time=s.time + 0 * g[0] + 1.0), None

    timed("b) threefry gumbel only", scanned(gumbel_only), state)

    def rbg_gumbel_only(s, _):
        key, k = jax.random.split(s.key)
        kd = jax.random.key_data(k)
        kr = jax.random.wrap_key_data(jnp.concatenate([kd, kd]), impl="rbg")
        g = jax.random.gumbel(kr, (E,), jnp.float32)
        return s._replace(key=key, time=s.time + 0 * g[0] + 1.0), None

    timed("c) rbg gumbel only", scanned(rbg_gumbel_only), state)

    def slot_major(s, _):
        key, k = jax.random.split(s.key)
        g = jax.random.gumbel(k, (KIN, R), jnp.float32)
        scores = slot_scores_const + g
        best = jnp.full((R,), NEG_INF, jnp.float32)
        win_slot = jnp.full((R,), KIN, jnp.int32)
        for kk in range(KIN):
            s_k = jnp.where(net.in_edge_ok[kk], scores[kk], NEG_INF)
            take = s_k > best
            best = jnp.where(take, s_k, best)
            win_slot = jnp.where(take, kk, win_slot)
        return s._replace(key=key, time=s.time + 0 * best[0] + 1.0), None

    timed("d) slot-major (no gathers, tf gumbel)", scanned(slot_major), state)


if __name__ == "__main__":
    main()
