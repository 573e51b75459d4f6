"""Microbenchmark the congested-refresh components at Grid64x64.

Times, on the real chip:
  relax-gather   — 8 warm sweeps via the gather while_loop (TARL_MULTISWEEP=0)
  relax-msweep   — 8 warm sweeps via the static-shift multisweep Pallas kernel
  next_roads     — the refresh-time next-road table derivation (K row-gather passes)
  full-refresh   — cost + warm-start + relax + next_roads + pack, jitted together

Run from /root/repo with the default (axon) environment, nothing else on the TPU.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

GRID = int(os.environ.get("TARL_ROUTE_GRID", "64"))
NUM_AGENTS = int(os.environ.get("TARL_ROUTE_AGENTS", "200000"))
REPS = 20


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / REPS * 1e3


def main() -> None:
    from tarl_tpu.io.matsim import load_network
    from tarl_tpu.io.scenarios import grid_scenario
    from tarl_tpu.routing import bellman_ford as bf
    from tarl_tpu.routing.policies import primal_table_init, _primal_unpack

    cache = os.path.join("/tmp", "tarl_bench_scen")
    name = f"RouteGrid{GRID}_{NUM_AGENTS}"
    base = os.path.join(cache, name)
    if not os.path.exists(os.path.join(base, "network.xml")):
        grid_scenario(cache, name, rows=GRID, cols=GRID,
                      num_agents=NUM_AGENTS,
                      peak_start=6 * 3600, peak_spread=2 * 3600)
    net = load_network(os.path.join(base, "network"))
    i_n = net.num_intersections
    print(f"I={i_n} R={net.num_roads} K={net.inter_out_road.shape[1]}",
          flush=True)

    buf = primal_table_init(net)
    dist, cost, _ = _primal_unpack(buf, i_n, i_n, net.num_roads)
    jax.block_until_ready(dist)
    # Mildly congested costs + a warm start that needs real sweeps.
    cost_c = cost * (1.0 + 0.3 * jnp.sin(jnp.arange(cost.shape[0]) * 0.37) ** 2)
    dist0 = jnp.minimum(dist * 1.3, bf.BIG)

    shifts, slot, perm, inv = bf.primal_delta_buckets(
        net.inter_out_road, net.inter_out_ok, net.road_to,
        coords=(net.inter_x, net.inter_y),
    ) or (None, None, None, None)
    print(f"delta buckets: {None if shifts is None else len(shifts)} "
          f"(row-permuted: {perm is not None})", flush=True)

    relax_g = jax.jit(lambda c, d0: bf.primal_all_pairs_dist(
        c, net.inter_out_road, net.inter_out_ok, net.road_to,
        max_iters=8, dist0=d0))
    print(f"relax-gather : {timeit(relax_g, cost_c, dist0):8.2f} ms", flush=True)

    if shifts is not None and bf._multisweep_ok(i_n, len(shifts), 8):
        relax_m = jax.jit(lambda c, d0: bf.primal_all_pairs_dist(
            c, net.inter_out_road, net.inter_out_ok, net.road_to,
            max_iters=8, dist0=d0, delta_shifts=shifts, delta_slot=slot,
            delta_perm=perm, delta_inv=inv))
        ms = timeit(relax_m, cost_c, dist0)
        eq = bool(jnp.array_equal(relax_g(cost_c, dist0),
                                  relax_m(cost_c, dist0)))
        print(f"relax-msweep : {ms:8.2f} ms   (equal to gather: {eq})",
              flush=True)
    else:
        print("relax-msweep : gate off", flush=True)

    nr = jax.jit(lambda d, c: bf.primal_next_roads(
        d, c, net.inter_out_road, net.inter_out_ok, net.road_to))
    print(f"next_roads   : {timeit(nr, dist, cost_c):8.2f} ms", flush=True)

    def full(buf_in, tick_cost):
        prev_dist, prev_cost, _ = _primal_unpack(buf_in, i_n, i_n, net.num_roads)
        ratio = jnp.max(tick_cost / jnp.maximum(prev_cost, 1e-6))
        d0 = jnp.minimum(prev_dist * jnp.maximum(ratio, 1.0), bf.BIG)
        d = bf.primal_all_pairs_dist(
            tick_cost, net.inter_out_road, net.inter_out_ok, net.road_to,
            max_iters=8, dist0=d0, delta_shifts=shifts, delta_slot=slot,
            delta_perm=perm, delta_inv=inv)
        road = bf.primal_next_roads(
            d, tick_cost, net.inter_out_road, net.inter_out_ok, net.road_to)
        return jnp.concatenate([d.ravel(), tick_cost, road.ravel()])

    print(f"full-refresh : {timeit(jax.jit(full), buf, cost_c):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
