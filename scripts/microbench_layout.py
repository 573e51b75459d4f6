"""Layout microbenchmarks: minor-dim padding on the per-tick hot arrays.

TPU tiles f32 arrays as (8 sublanes, 128 lanes); a [R, 4] table pads its
minor dim 4 -> 128 (32x wasted lanes), [R, 8] 16x, [R, Nmax=28] 4.6x.
Times the transposed forms ([K, R] with R on the lane axis) against the
row-major forms measured in microbench_scatter.py.

Run from /root/repo on the TPU (one axon process at a time).
"""
from __future__ import annotations

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
K = int(os.environ.get("MB_K", "8"))
KIN = int(os.environ.get("MB_KIN", "4"))
STEPS = int(os.environ.get("MB_STEPS", "200"))


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    us = (time.time() - t0) / STEPS * 1e6
    print(f"{name:44} {us:9.1f} us/step", flush=True)
    return us


def scanned(body):
    @jax.jit
    def run(carry, keys):
        return jax.lax.scan(body, carry, keys)[0]
    return run


def main():
    rng = np.random.default_rng(0)
    keys = jax.random.split(jax.random.PRNGKey(0), STEPS)
    iota = jnp.arange(R, dtype=jnp.int32)

    # in-edge table, transposed [KIN, R]
    seg = np.sort(rng.integers(0, R, size=E)).astype(np.int32)
    data0 = jnp.asarray(rng.random(E), jnp.float32)
    in_tab = np.zeros((R, KIN), np.int32)
    in_ok = np.zeros((R, KIN), bool)
    fill = np.zeros(R, np.int64)
    for e, s in enumerate(seg):
        if fill[s] < KIN:
            in_tab[s, fill[s]] = e
            in_ok[s, fill[s]] = True
            fill[s] += 1
    in_tab_t = jnp.asarray(in_tab.T)  # [KIN, R]
    in_ok_t = jnp.asarray(in_ok.T)

    def sample_t(acc, key):
        d = (data0 + acc[0])[in_tab_t]                       # [KIN, R]
        g = jax.random.gumbel(key, (KIN, R), jnp.float32)
        scores = jnp.where(in_ok_t, d + g, -jnp.inf)
        k = jnp.argmax(scores, axis=0)                        # [R]
        arg = in_tab_t[k, iota]
        return arg.astype(jnp.float32), None

    def sum_t(acc, key):
        d = (data0 + acc[0])[in_tab_t]
        out = jnp.where(in_ok_t, d, 0.0).sum(axis=0)
        return out, None

    z_r = jnp.zeros((R,))
    timed("segment_sum in-table [KIN, R]", scanned(sum_t), z_r, keys)
    timed("segment_sample in-table [KIN, R]", scanned(sample_t), z_r, keys)

    # fifo dense select, transposed [NMAX, R]
    slot0 = jnp.asarray(rng.integers(0, NMAX, size=R), jnp.int32)
    accept0 = jnp.asarray(rng.random(R) < 0.3)

    def f_dense_t(fifo, key):
        row = jnp.arange(NMAX, dtype=jnp.int32)[:, None]
        hit = (row == slot0[None, :]) & accept0[None, :]
        return jnp.where(hit, 1.0, fifo), None

    timed("fifo push dense select [NMAX, R]",
          scanned(f_dense_t), jnp.zeros((NMAX, R)), keys)

    # withdraw-style: eligibility over [K, R] + head-run + agent scatter
    ids_t = jnp.asarray(rng.integers(1, A, size=(K, R)), jnp.int32)
    dep_t = jnp.asarray(rng.random((K, R)) * 2, jnp.float32)

    def w_full_t(arr, key):
        eligible = dep_t <= 1.0
        cum = jnp.cumprod(eligible.astype(jnp.int32), axis=0).astype(bool)
        wids = jnp.where(cum, ids_t, A).reshape(-1)
        return arr.at[wids].set(1.0, mode="drop"), None

    timed("withdraw eligibility+scatter [K, R]",
          scanned(w_full_t), jnp.zeros((A,)), keys)

    # gather from [NMAX, R] fifo at per-road dynamic row (head lookup)
    fifo_t0 = jnp.zeros((NMAX, R))

    def head_gather_t(acc, key):
        out = fifo_t0[slot0, iota] + acc[0]
        return out, None

    timed("head gather fifo[slot, iota] [NMAX, R]",
          scanned(head_gather_t), z_r, keys)

    # 1-D elementwise baseline on [R] (per-op overhead probe)
    def ew(acc, key):
        return acc * 1.000001 + 0.5, None

    timed("elementwise [R] x1", scanned(ew), z_r, keys)

    # chained 10 elementwise on [R]
    def ew10(acc, key):
        x = acc
        for _ in range(10):
            x = x * 1.000001 + 0.5
        return x, None

    timed("elementwise [R] x10", scanned(ew10), z_r, keys)

    # gather [R] from [A] (agent-array lookup baseline)
    arrA = jnp.asarray(rng.random(A), jnp.float32)
    gidx = jnp.asarray(rng.integers(0, A, size=R), jnp.int32)

    def gA(acc, key):
        return arrA[gidx] + acc, None

    timed("gather [R] from [A]", scanned(gA), z_r, keys)


if __name__ == "__main__":
    main()
