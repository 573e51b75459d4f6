"""Sub-phase decomposition of direction/withdraw on the bench workload (TPU).

Times cumulative pieces of the tick phases to locate the cost inside them
(the gather/scatter emitter behavior is hard to predict — measure, don't
guess).  Run from /root/repo with the default (axon) environment.
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tarl_tpu.config import SimConfig, DEFAULT_PHYSICS
from tarl_tpu.core.step import Policy, init_sim_state, run_episode
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import grid_scenario
from tarl_tpu.routing.policies import random_choice

ROWS = COLS = int(os.environ.get("TARL_BENCH_GRID", "64"))
NUM_AGENTS = int(os.environ.get("TARL_BENCH_AGENTS", "200000"))
CHUNK = int(os.environ.get("TARL_BENCH_CHUNK", "1024"))
REPS = 4


def timed(name, fn, state):
    out = fn(state)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(REPS):
        out = fn(state)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    us = (time.time() - t0) / REPS / CHUNK * 1e6
    print(f"{name:36} {us:9.1f} us/tick", flush=True)
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
    physics = DEFAULT_PHYSICS
    state, _ = run_episode(state, net, policy, 600, sim=sim)
    jax.block_until_ready(state.road.count)

    R = net.num_roads
    Nmax = net.nmax
    u = net.edge_src
    v = net.edge_dst
    E = net.num_turn_edges
    iota = jnp.arange(R, dtype=jnp.int32)
    NEG_INF = jnp.float32(-jnp.inf)

    def scanned(body):
        @jax.jit
        def run(state):
            return jax.lax.scan(body, state, length=CHUNK)[0]
        return run

    # --- direction pieces -------------------------------------------------
    def heads_only(s, _):
        road = s.road
        h = road.head_ids() + road.head_arrival().astype(jnp.int32) \
            + road.head_departure().astype(jnp.int32)
        return s._replace(time=s.time + 0 * h[0] + 1.0), None

    def mask_only(s, _):
        road = s.road
        head_departure = road.head_departure()
        count_f = road.count.astype(jnp.float32)
        cap = net.capacity
        dep_ok = head_departure[u] <= s.time
        space_ok = count_f[v] < cap[v] - physics.congestion_buffer
        wants_v = s.selected_road[:R][u] == v
        nonempty = road.count[u] > 0
        mask = dep_ok & space_ok & wants_v & nonempty
        prob = net.edge_attr * mask.astype(jnp.float32)
        return s._replace(time=s.time + 0 * prob[0] + 1.0), None

    def sample_only(s, _):
        key, k = jax.random.split(s.key)
        KIN = net.in_src_tab.shape[0]
        g = jax.random.gumbel(k, (KIN, R), jnp.float32)
        best = jnp.full((R,), NEG_INF, jnp.float32)
        win_slot = jnp.zeros((R,), jnp.int32)
        for kk in range(KIN):
            s_k = jnp.where(net.in_edge_ok[kk], net.in_logit_tab[kk] + g[kk],
                            NEG_INF)
            take = s_k > best
            best = jnp.where(take, s_k, best)
            win_slot = jnp.where(take, kk, win_slot)
        return s._replace(key=key, time=s.time + 0 * best[0] + 1.0), None

    def push_only(s, _):
        road = s.road
        slot = (road.head + road.count) % Nmax
        accept = (iota % 3) == 0
        col = jnp.arange(Nmax, dtype=jnp.int32)[None, :]
        hit = (col == slot[:, None]) & accept[:, None]
        fifo_ids = jnp.where(hit, iota[:, None], road.fifo_ids)
        fifo_arrival = jnp.where(hit, s.time, road.fifo_arrival)
        fifo_departure = jnp.where(hit, s.time + 1.0, road.fifo_departure)
        return s._replace(
            road=road._replace(fifo_ids=fifo_ids, fifo_arrival=fifo_arrival,
                               fifo_departure=fifo_departure),
            time=s.time + 1.0,
        ), None

    timed("dir: head gathers only", scanned(heads_only), state)
    timed("dir: + mask chain (edge gathers)", scanned(mask_only), state)
    timed("dir: slot-loop sample only", scanned(sample_only), state)
    timed("dir: dense-select push only", scanned(push_only), state)

    # --- withdraw pieces ---------------------------------------------------
    K = 8
    A = agents.num_agents

    def w_gathers(s, _):
        road = s.road
        run = jnp.ones((R,), bool)
        acc = jnp.zeros((R,), jnp.float32)
        for k in range(K):
            phys_k = (road.head + k) % Nmax
            ids_k = road.fifo_ids[iota, phys_k]
            dep_k = road.fifo_departure[iota, phys_k]
            eligible = (
                (s.agents.dest[ids_k] == net.road_dest)
                & (dep_k <= s.time) & (k < road.count)
            )
            run = run & eligible
            acc = acc + jnp.where(run, 1.0, 0.0)
        return s._replace(time=s.time + 0 * acc[0] + 1.0), None

    def w_scatter(s, _):
        wids = jnp.where((iota % 50) == 0, iota, A)
        wids = jnp.concatenate([wids] * K)
        arrival = s.agents.arrival.at[wids].set(
            jnp.broadcast_to(s.time, wids.shape), mode="drop"
        )
        return s._replace(agents=s.agents._replace(arrival=arrival),
                          time=s.time + 1.0), None

    timed("wd: slot-loop gathers only", scanned(w_gathers), state)
    timed("wd: agent scatter only (K rows)", scanned(w_scatter), state)


if __name__ == "__main__":
    main()
