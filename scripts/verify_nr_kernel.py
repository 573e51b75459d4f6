"""Hardware verification of the fused relax+next-road multisweep kernel
(bellman_ford.primal_relax_next_roads): dist AND road table must equal the
two-step gather path bitwise on the chip, for random and tie-heavy costs.

Run from /root/repo in the default (axon) environment.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

GRID = int(os.environ.get("TARL_NR_GRID", "64"))


def main() -> None:
    import numpy as np

    from tarl_tpu.io.matsim import load_network
    from tarl_tpu.io.scenarios import grid_scenario
    from tarl_tpu.routing import bellman_ford as bf

    base = os.path.join("/tmp/tarl_bench_scen", f"VerifyGrid{GRID}")
    if not os.path.exists(os.path.join(base, "network.xml")):
        grid_scenario("/tmp/tarl_bench_scen", f"VerifyGrid{GRID}",
                      rows=GRID, cols=GRID, num_agents=100)
    net = load_network(os.path.join(base, "network"))
    i_n = net.num_intersections
    buckets = bf.primal_delta_buckets(
        net.inter_out_road, net.inter_out_ok, net.road_to,
        coords=(net.inter_x, net.inter_y),
    )
    epi = bf.epilogue_slot_tables(
        net.inter_out_road, net.inter_out_ok, net.road_to, buckets
    )
    print(f"I={i_n} buckets={len(buckets[0])} permuted={buckets[2] is not None}"
          f" kernel_gate={bf._multisweep_nr_ok(i_n, len(buckets[0]), 8)}",
          flush=True)

    ff = bf.primal_all_pairs_dist(
        net.free_flow, net.inter_out_road, net.inter_out_ok, net.road_to
    )
    eye = jnp.eye(i_n, dtype=bool)
    rng_cost = net.free_flow * (
        1.0 + 0.4 * jnp.sin(jnp.arange(net.num_roads) * 0.61) ** 2
    )
    for label, cost in (("random-ish", rng_cost),
                        ("tie-heavy", jnp.full_like(net.free_flow, 14.39))):
        dist0 = jnp.where(eye, 0.0, jnp.minimum(ff * 1.4, bf.BIG))

        fused = jax.jit(lambda c, d0: bf.primal_relax_next_roads(
            c, net.inter_out_road, net.inter_out_ok, net.road_to, d0, 8,
            buckets=buckets, epi_tables=epi))
        d_f, r_f = fused(cost, dist0)
        jax.block_until_ready(r_f)
        t0 = time.time()
        for _ in range(10):
            d_f, r_f = fused(cost, dist0)
        jax.block_until_ready(r_f)
        t_fused = (time.time() - t0) / 10

        def two_step(c, d0):
            d = bf._primal_relax(d0, c, net.inter_out_road,
                                 net.inter_out_ok, net.road_to, 8,
                                 buckets=buckets)
            r = bf.primal_next_roads(d, c, net.inter_out_road,
                                     net.inter_out_ok, net.road_to)
            return d, r

        two = jax.jit(two_step)
        d_t, r_t = two(cost, dist0)
        jax.block_until_ready(r_t)
        t0 = time.time()
        for _ in range(10):
            d_t, r_t = two(cost, dist0)
        jax.block_until_ready(r_t)
        t_two = (time.time() - t0) / 10

        eq_d = bool(jnp.array_equal(d_f, d_t))
        eq_r = bool(jnp.array_equal(r_f, r_t))
        print(f"{label:10}: fused {t_fused*1e3:7.2f} ms  two-step "
              f"{t_two*1e3:7.2f} ms  dist_equal={eq_d} road_equal={eq_r}",
              flush=True)
        if not (eq_d and eq_r):
            nd = int(jnp.sum(d_f != d_t))
            nr = int(jnp.sum(r_f != r_t))
            print(f"  MISMATCH: dist {nd}, road {nr} elements", flush=True)
            raise SystemExit(1)
    print("VERIFY NR KERNEL OK", flush=True)


if __name__ == "__main__":
    main()
