"""Isolate the shard_map-of-scan overhead seen as the ~2.25 ms/tick
'shell' floor of the shard episode tick (scripts/ablate_shard_phases.py).

Times a 510-iteration lax.scan whose body does nearly nothing, over a
carry shaped like the episode state (ring buffers + agent arrays), in
four forms: plain jit(scan); shard_map(scan) with the road axis sharded
on a 1-device mesh; + scalar psums; + the metrics row-scatter and
6-scalar ys.  One TPU process at a time.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import jax, jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P
import numpy as np

R, NMAX, A, H = 16128, 28, 200001, 31
TICKS = 510
AXIS = "roads"

def make_carry():
    return {
        "fifo_ids": jnp.zeros((R, NMAX), jnp.int32),
        "fifo_arr": jnp.zeros((R, NMAX), jnp.float32),
        "fifo_dep": jnp.zeros((R, NMAX), jnp.float32),
        "fifo_dst": jnp.zeros((R, NMAX), jnp.int32),
        "head": jnp.zeros((R,), jnp.int32),
        "count": jnp.zeros((R,), jnp.int32),
        "arrival": jnp.zeros((A,), jnp.float32),
        "inserted": jnp.zeros((A,), bool),
        "dep": jnp.zeros((A,), jnp.float32),
        "origin": jnp.zeros((A,), jnp.int32),
        "dest": jnp.zeros((A,), jnp.int32),
        "hourly": jnp.zeros((H, R), jnp.int32),
        "time": jnp.zeros((), jnp.float32),
        "key": jax.random.PRNGKey(0),
    }

def body_min(c, _):
    c = dict(c); c["time"] = c["time"] + 1.0
    return c, c["time"]

def body_metrics(c, _):
    c = dict(c)
    t = c["time"]
    hour = jnp.clip((t / 3600.0).astype(jnp.int32), 0, H - 1)
    trav = (c["count"] > 0).astype(jnp.int32)
    c["hourly"] = c["hourly"].at[hour].add(trav)
    on_way = jax.lax.psum(jnp.sum(c["count"]).astype(jnp.float32), AXIS)
    done = jax.lax.psum(jnp.sum(trav).astype(jnp.float32), AXIS)
    c["time"] = t + 1.0
    return c, (t, on_way, done, on_way - done, on_way + done, t + 2.0)

def run(label, fn):
    carry = make_carry()
    out = fn(carry)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    out = fn(carry)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    ms = (time.time() - t0) / TICKS * 1e3
    print(f"{label}: {ms:.3f} ms/tick", flush=True)

mesh = Mesh(np.array(jax.devices()[:1]), (AXIS,))
spec = {k: P(AXIS) if k in ("fifo_ids","fifo_arr","fifo_dep","fifo_dst",
                             "head","count") else
        (P(None, AXIS) if k == "hourly" else P())
        for k in make_carry()}

@jax.jit
def serial_min(c):
    return jax.lax.scan(lambda c_, x: body_min(c_, x), c, length=TICKS)

def run_shard(body):
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, in_specs=(spec,),
                       out_specs=(spec, P()), check_vma=False)
    def f(c):
        return jax.lax.scan(body, c, length=TICKS)
    return f

@jax.jit
def serial_metrics(c):
    def b(c_, x):
        c2, ys = body_metrics(c_, x)
        return c2, ys
    # fake psum axis for serial: replace with identity via vmap-free trick
    return None

run("serial scan (min body)", serial_min)
run("shard_map scan (min body)", run_shard(body_min))
run("shard_map scan (+metrics/psums)", run_shard(body_metrics))
