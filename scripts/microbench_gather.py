"""Gather-form microbenchmarks: find the fast way to gather [K, R] tables.

microbench_layout.py showed a [KIN, R]-indexed gather from a 1-D [E] array
costs ~490 us while a [R]-indexed gather from [A] is free — XLA picks a slow
gather emitter for some index shapes.  Times the candidate forms.

Run from /root/repo on the TPU.
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
KIN = int(os.environ.get("MB_KIN", "4"))
STEPS = int(os.environ.get("MB_STEPS", "2000"))


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    us = (time.time() - t0) / STEPS * 1e6
    print(f"{name:48} {us:9.1f} us/step", flush=True)
    return us


def scanned(body):
    @jax.jit
    def run(carry, keys):
        return jax.lax.scan(body, carry, keys)[0]
    return run


def main():
    rng = np.random.default_rng(0)
    keys = jax.random.split(jax.random.PRNGKey(0), STEPS)
    data0 = jnp.asarray(rng.random(E), jnp.float32)
    idx2d = jnp.asarray(rng.integers(0, E, size=(KIN, R)), jnp.int32)
    idx_flat = idx2d.reshape(-1)
    idx_rows = [jnp.asarray(np.asarray(idx2d)[k]) for k in range(KIN)]
    z_r = jnp.zeros((R,))
    z_kr = jnp.zeros((KIN, R))

    def g_2d(acc, key):
        return (data0 + acc[0, 0])[idx2d], None

    def g_flat(acc, key):
        d = (data0 + acc[0, 0])[idx_flat]
        return d.reshape(KIN, R), None

    def g_take(acc, key):
        d = jnp.take(data0 + acc[0, 0], idx_flat)
        return d.reshape(KIN, R), None

    def g_rows(acc, key):
        d = data0 + acc[0, 0]
        return jnp.stack([d[ix] for ix in idx_rows]), None

    timed("gather [KIN,R] 2-D index", scanned(g_2d), z_kr, keys)
    timed("gather flat index + reshape", scanned(g_flat), z_kr, keys)
    timed("jnp.take flat + reshape", scanned(g_take), z_kr, keys)
    timed("KIN separate [R] gathers + stack", scanned(g_rows), z_kr, keys)

    # gather [K,R] from an [R]-sized source (direction mask building)
    src_r = jnp.asarray(rng.random(R), jnp.float32)
    idxr2d = jnp.asarray(rng.integers(0, R, size=(KIN, R)), jnp.int32)
    idxr_rows = [jnp.asarray(np.asarray(idxr2d)[k]) for k in range(KIN)]

    def gr_2d(acc, key):
        return (src_r + acc[0, 0])[idxr2d], None

    def gr_rows(acc, key):
        d = src_r + acc[0, 0]
        return jnp.stack([d[ix] for ix in idxr_rows]), None

    timed("gather [KIN,R] from [R] 2-D index", scanned(gr_2d), z_kr, keys)
    timed("KIN separate [R]-from-[R] gathers", scanned(gr_rows), z_kr, keys)

    # scatter [R] bool via out-edge win comparison (confirm without scatter)
    win = jnp.asarray(rng.integers(0, E, size=R), jnp.int32)

    def popped_table(acc, key):
        hits = [(win[ix % R] == ix).astype(jnp.float32) for ix in idxr_rows]
        return sum(hits) + 0 * acc, None

    timed("confirm via KIN compares (no scatter)",
          scanned(popped_table), z_r, keys)


if __name__ == "__main__":
    main()
