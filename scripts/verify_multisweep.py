"""Hardware check: static-shift multi-sweep kernel vs gather sweep.

Bitwise equality on a congested Grid64x64 cost vector (warm-started, capped
at 8 sweeps — the refresh configuration of scripts/bench_routing.py) plus
wall-clock per refresh.  Run from /root/repo on the TPU (default env), one
axon process at a time.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tarl_tpu.io.matsim import load_network
from tarl_tpu.io.scenarios import grid_scenario
from tarl_tpu.routing import bellman_ford as bf

GRID = int(os.environ.get("TARL_ROUTE_GRID", "64"))


def main() -> None:
    base = os.path.join("/tmp/tarl_bench_scen", f"VerifyGrid{GRID}")
    if not os.path.exists(os.path.join(base, "network.xml")):
        grid_scenario("/tmp/tarl_bench_scen", f"VerifyGrid{GRID}",
                      rows=GRID, cols=GRID, num_agents=100)
    net = load_network(os.path.join(base, "network"))
    i_n = net.num_intersections

    b = bf.primal_delta_buckets(net.inter_out_road, net.inter_out_ok,
                                net.road_to)
    assert b is not None, "grid should bucket"
    shifts, slot, perm, inv = b
    print("deltas:", len(shifts))

    # Congested-ish costs + a warm-start upper bound (free-flow * 1.3).
    key = jax.random.PRNGKey(0)
    cost = net.free_flow * (1.0 + jax.random.uniform(key, net.free_flow.shape))
    ff_dist = bf.primal_all_pairs_dist(
        net.free_flow, net.inter_out_road, net.inter_out_ok, net.road_to
    )
    dist0 = jnp.minimum(ff_dist * 2.0, bf.BIG)
    jax.block_until_ready(dist0)

    def run(use_kernel: bool):
        os.environ["TARL_MULTISWEEP"] = "1" if use_kernel else "0"
        fn = jax.jit(lambda c, d0: bf.primal_all_pairs_dist(
            c, net.inter_out_road, net.inter_out_ok, net.road_to,
            max_iters=8, dist0=d0,
            delta_shifts=shifts if use_kernel else None,
            delta_slot=slot if use_kernel else None,
            delta_perm=perm if use_kernel else None,
            delta_inv=inv if use_kernel else None,
        ))
        out = jax.block_until_ready(fn(cost, dist0))
        t0 = time.time()
        for _ in range(10):
            out = jax.block_until_ready(fn(cost, dist0))
        dt = (time.time() - t0) / 10
        return out, dt

    d_gather, t_gather = run(False)
    d_kernel, t_kernel = run(True)
    eq = bool(jnp.all(d_gather == d_kernel))
    print(f"bitwise equal: {eq}")
    print(f"cold refresh gather (8 sweeps): {t_gather*1e3:.1f} ms")
    print(f"cold refresh multisweep kernel: {t_kernel*1e3:.1f} ms")
    if not eq:
        diff = jnp.sum(d_gather != d_kernel)
        print("mismatched entries:", int(diff),
              float(jnp.max(jnp.abs(d_gather - d_kernel))))
        sys.exit(1)

    # Realistic warm refresh: previous table = the CONVERGED congested
    # table, costs moved ~2% — the production cadence (refresh every 10
    # ticks; congestion moves slowly).  Early exit should fire fast.
    cost2 = cost * (1.0 + 0.02 * jax.random.uniform(
        jax.random.PRNGKey(1), cost.shape))
    ratio = jnp.max(cost2 / jnp.maximum(cost, 1e-6))
    warm0 = jnp.minimum(d_gather * jnp.maximum(ratio, 1.0), bf.BIG)
    jax.block_until_ready(warm0)

    def run_warm(use_kernel: bool):
        fn = jax.jit(lambda c, d0: bf.primal_all_pairs_dist(
            c, net.inter_out_road, net.inter_out_ok, net.road_to,
            max_iters=8, dist0=d0,
            delta_shifts=shifts if use_kernel else None,
            delta_slot=slot if use_kernel else None,
        ))
        out = jax.block_until_ready(fn(cost2, warm0))
        t0 = time.time()
        for _ in range(10):
            out = jax.block_until_ready(fn(cost2, warm0))
        dt = (time.time() - t0) / 10
        return out, dt

    w_gather, tw_gather = run_warm(False)
    w_kernel, tw_kernel = run_warm(True)
    eq2 = bool(jnp.all(w_gather == w_kernel))
    print(f"warm bitwise equal: {eq2}")
    print(f"warm refresh gather: {tw_gather*1e3:.1f} ms")
    print(f"warm refresh multisweep kernel: {tw_kernel*1e3:.1f} ms")
    sys.exit(0 if eq2 else 1)


if __name__ == "__main__":
    main()
