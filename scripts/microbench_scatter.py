"""Microbenchmarks for the per-tick scatter/segment strategies on TPU.

The Grid64x64 phase ablation (scripts/ablate_phases.py) shows the tick is
dominated by XLA scatters and segment reductions that scale with R:
withdraw 4.3 ms (R*K-index scatter into the agent array), direction 4.1 ms
(segment sample + three [R, Nmax] scatters), choice 2.1 ms (segment sample
over the choice-edge list).  This script times the candidate replacements
in isolation inside a lax.scan (the same execution context as the episode):

  withdraw  : plain scatter  vs  unique-padded scatter  (distinct dummy
              indices into a padded target let XLA assume uniqueness)
  fifo push : row-scatter with dropped rows  vs  unique/sorted no-op-write
              scatter  vs  dense [R, Nmax] select
  seg sum   : edge-list segment_sum  vs  sorted-edges segment_sum  vs
              dense in-edge-table gather+sum ([R, Kin], the BF nbr trick)
  seg argmax: edge-list segment argmax (3 scatters)  vs  dense in-table
              argmax over the incoming-edge axis

Run from /root/repo on the TPU (one axon process at a time, CLAUDE.md).
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

R = int(os.environ.get("MB_R", "16384"))
E = int(os.environ.get("MB_E", str(3 * 16384)))
A = int(os.environ.get("MB_A", "200000"))
NMAX = int(os.environ.get("MB_NMAX", "28"))
K = int(os.environ.get("MB_K", "8"))      # withdraw depth
KIN = int(os.environ.get("MB_KIN", "4"))  # max in-degree
STEPS = int(os.environ.get("MB_STEPS", "200"))


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    us = (time.time() - t0) / STEPS * 1e6
    print(f"{name:42} {us:9.1f} us/step", flush=True)
    return us


def scanned(body):
    @jax.jit
    def run(carry, keys):
        return jax.lax.scan(body, carry, keys)[0]
    return run


def main():
    rng = np.random.default_rng(0)
    keys = jax.random.split(jax.random.PRNGKey(0), STEPS)

    # --- withdraw-style scatter: ~R*K indices into [A] ------------------
    ids0 = jnp.asarray(rng.integers(1, A, size=(R, K)), jnp.int32)
    mask0 = jnp.asarray(rng.random((R, K)) < 0.02)

    def w_plain(arr, key):
        ids = jnp.where(mask0, ids0, A).reshape(-1)
        return arr.at[ids].set(1.0, mode="drop"), None

    def w_unique(arr_pad, key):
        dummy = A + jnp.arange(R * K, dtype=jnp.int32)
        ids = jnp.where(mask0.reshape(-1), ids0.reshape(-1), dummy)
        return arr_pad.at[ids].set(1.0, mode="drop", unique_indices=True), None

    timed("withdraw scatter plain", scanned(w_plain), jnp.zeros((A,)), keys)
    timed("withdraw scatter unique-padded",
          scanned(w_unique), jnp.zeros((A + R * K,)), keys)

    # --- fifo push: one write per row at a dynamic column ---------------
    slot0 = jnp.asarray(rng.integers(0, NMAX, size=R), jnp.int32)
    accept0 = jnp.asarray(rng.random(R) < 0.3)
    iota = jnp.arange(R, dtype=jnp.int32)

    def f_plain(fifo, key):
        rows = jnp.where(accept0, iota, R)
        return fifo.at[rows, slot0].set(1.0, mode="drop"), None

    def f_noop(fifo, key):
        old = fifo[iota, slot0]
        val = jnp.where(accept0, 1.0, old)
        return fifo.at[iota, slot0].set(
            val, unique_indices=True, indices_are_sorted=True
        ), None

    def f_dense(fifo, key):
        col = jnp.arange(NMAX, dtype=jnp.int32)[None, :]
        hit = (col == slot0[:, None]) & accept0[:, None]
        return jnp.where(hit, 1.0, fifo), None

    z = jnp.zeros((R, NMAX))
    timed("fifo push row-scatter (dropped rows)", scanned(f_plain), z, keys)
    timed("fifo push unique/sorted no-op write", scanned(f_noop), z, keys)
    timed("fifo push dense select", scanned(f_dense), z, keys)

    # --- segment sum over E edges -> R segments -------------------------
    seg = np.sort(rng.integers(0, R, size=E)).astype(np.int32)
    seg_unsorted = rng.permutation(seg).astype(np.int32)
    seg_s = jnp.asarray(seg)
    seg_u = jnp.asarray(seg_unsorted)
    data0 = jnp.asarray(rng.random(E), jnp.float32)

    # dense in-edge table: for each segment, up to KIN member edge ids
    in_tab = np.zeros((R, KIN), np.int32)
    in_ok = np.zeros((R, KIN), bool)
    fill = np.zeros(R, np.int64)
    for e, s in enumerate(seg):
        if fill[s] < KIN:
            in_tab[s, fill[s]] = e
            in_ok[s, fill[s]] = True
            fill[s] += 1
    in_tab = jnp.asarray(in_tab)
    in_ok = jnp.asarray(in_ok)

    def s_unsorted(acc, key):
        out = jax.ops.segment_sum(data0 + acc[0], seg_u, num_segments=R)
        return out, None

    def s_sorted(acc, key):
        out = jax.ops.segment_sum(data0 + acc[0], seg_s, num_segments=R,
                                  indices_are_sorted=True)
        return out, None

    def s_table(acc, key):
        d = (data0 + acc[0])[in_tab]
        out = jnp.where(in_ok, d, 0.0).sum(axis=1)
        return out, None

    z_r = jnp.zeros((R,))
    timed("segment_sum edge-list unsorted", scanned(s_unsorted), z_r, keys)
    timed("segment_sum edge-list sorted+hint", scanned(s_sorted), z_r, keys)
    timed("segment_sum dense in-table", scanned(s_table), z_r, keys)

    # --- segment argmax (gumbel sample) ---------------------------------
    from tarl_tpu.ops.segment import no_pallas, segment_sample

    def a_seglist(acc, key):
        with no_pallas():
            arg = segment_sample(key, data0 + acc[0], seg_u, R)
        return arg.astype(jnp.float32), None

    def a_table(acc, key):
        d = (data0 + acc[0])[in_tab]
        g = jax.random.gumbel(key, (R, KIN), jnp.float32)
        scores = jnp.where(in_ok, d + g, -jnp.inf)
        k = jnp.argmax(scores, axis=1)
        arg = in_tab[iota, k]
        return arg.astype(jnp.float32), None

    timed("segment_sample edge-list (XLA)", scanned(a_seglist), z_r, keys)
    timed("segment_sample dense in-table", scanned(a_table), z_r, keys)


if __name__ == "__main__":
    main()
