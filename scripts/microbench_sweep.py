"""Microbench: min-plus sweep formulations on the TPU (Grid64-sized).

Compares, per 8-sweep refresh on a [4096, 4096] f32 table with 18 delta
buckets:
  a) XLA gather sweep (the production fallback);
  b) Pallas multisweep, SUBLANE rolls (tile [I, T], roll axis 0);
  c) Pallas multisweep, LANE rolls (tile [T, I], roll axis 1, operands
     pre-transposed).
Run from /root/repo on the TPU, one axon process at a time.
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tarl_tpu.io.matsim import load_network
from tarl_tpu.io.scenarios import grid_scenario
from tarl_tpu.routing import bellman_ford as bf

GRID = 64
SWEEPS = 8
TILE = 128


def lane_kernel(w_ref, dist_ref, out_ref, *, shifts, num_sweeps):
    from jax.experimental.pallas import tpu as pltpu

    w_all = w_ref[...]  # [B_pad, I] — row b broadcasts over the tile rows

    def sweep(_, tile):
        new = tile
        for b, sh in enumerate(shifts):
            new = jnp.minimum(new, w_all[b:b + 1, :] + pltpu.roll(tile, sh, 1))
        return new

    out_ref[...] = jax.lax.fori_loop(0, num_sweeps, sweep, dist_ref[...])


def lane_multisweep(dist_t, w_rows, shifts):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d_p, i_n = dist_t.shape
    b_pad = w_rows.shape[0]
    return pl.pallas_call(
        partial(lane_kernel, shifts=shifts, num_sweeps=SWEEPS),
        grid=(d_p // TILE,),
        in_specs=[
            pl.BlockSpec((b_pad, i_n), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, i_n), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, i_n), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_p, i_n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(w_rows, dist_t)


def main() -> None:
    base = os.path.join("/tmp/tarl_bench_scen", f"VerifyGrid{GRID}")
    if not os.path.exists(os.path.join(base, "network.xml")):
        grid_scenario("/tmp/tarl_bench_scen", f"VerifyGrid{GRID}",
                      rows=GRID, cols=GRID, num_agents=100)
    net = load_network(os.path.join(base, "network"))
    i_n = net.num_intersections
    deltas, slot, _perm, _inv = bf.primal_delta_buckets(
        net.inter_out_road, net.inter_out_ok, net.road_to)
    b_n = len(deltas)
    print("deltas:", b_n)

    key = jax.random.PRNGKey(0)
    cost = net.free_flow * (1.0 + jax.random.uniform(key, net.free_flow.shape))
    ff = bf.primal_all_pairs_dist(
        net.free_flow, net.inter_out_road, net.inter_out_ok, net.road_to)
    dist0 = jnp.minimum(ff * 2.0, bf.BIG)
    jax.block_until_ready(dist0)

    w_flat = jnp.full((b_n * i_n + 1,), bf.BIG).at[slot].min(cost)[: b_n * i_n]
    b_pad = ((b_n + 127) // 128) * 128
    shifts = tuple((i_n - int(d)) % i_n for d in deltas)

    def timed(fn, *args):
        out = jax.block_until_ready(fn(*args))
        t0 = time.time()
        for _ in range(10):
            out = jax.block_until_ready(fn(*args))
        return out, (time.time() - t0) / 10

    # a) gather
    ga = jax.jit(lambda c, d0: bf.primal_all_pairs_dist(
        c, net.inter_out_road, net.inter_out_ok, net.road_to,
        max_iters=SWEEPS, dist0=d0))
    d_a, t_a = timed(ga, cost, dist0)
    print(f"gather sweep x8:      {t_a*1e3:7.1f} ms")

    # b) sublane multisweep (the committed kernel)
    w_cols = jnp.full((i_n, b_pad), bf.BIG).at[:, :b_n].set(
        w_flat.reshape(b_n, i_n).T)
    sb = jax.jit(lambda d0, w: bf._multisweep_pallas(
        d0, w, shifts, SWEEPS, bf._SWEEP_TILE_D))
    d_b, t_b = timed(sb, dist0, w_cols)
    print(f"sublane multisweep:   {t_b*1e3:7.1f} ms  "
          f"equal={bool(jnp.all(d_a == d_b))}")

    # c) lane multisweep on transposed operands (transposes included)
    # b_pad rows must be sublane-aligned (8), not lane-aligned.
    b_pad8 = ((b_n + 7) // 8) * 8
    w_rows = jnp.full((b_pad8, i_n), bf.BIG).at[:b_n, :].set(
        w_flat.reshape(b_n, i_n))
    ln = jax.jit(lambda d0, w: lane_multisweep(d0.T, w, shifts).T)
    d_c, t_c = timed(ln, dist0, w_rows)
    print(f"lane multisweep (+T): {t_c*1e3:7.1f} ms  "
          f"equal={bool(jnp.all(d_a == d_c))}")


if __name__ == "__main__":
    main()
