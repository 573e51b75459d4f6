"""Fused direction+response edge phase with a Pallas argmax-payload kernel.

The two-phase commit (DirectionMPNN propose + ResponseMPNN confirm,
direction_mpnn.py:44-196 / response_mpnn.py:42-127) reduces to: for every
downstream road, pick one incoming proposal by Gumbel-max over eligible turn
edges; the upstream source of the winning proposal pops its head.  The
response's ``tail == head`` check is exactly "my proposal won" — an agent
sits on one road only, so the downstream tail can equal the upstream head iff
the transfer just happened (see response_mpnn.py:62-80).  Fusing removes the
entire second message-passing pass.

Division of labor (learned the hard way — see the precision note below):

* the eligibility + gridlock masks and probabilities are exact f32 gathers/
  compares, computed in XLA over the edge list (identical math to
  core.direction);
* ONE Pallas kernel then does the per-downstream Gumbel-max *with payloads*:
  in-kernel PRNG, masked-max sweep per road column, carrying (best score,
  winning agent id, winning source road) across edge tiles — all on the VPU,
  where f32 is exact.

Precision note: an earlier version gathered per-road features inside the
kernel via one-hot MXU contraction; the MXU's default bf16 passes rounded
road indices and departure times, silently breaking equality/comparison masks
on real hardware (interpret mode hid it).  Anything needing exact integers or
comparisons stays off the MXU.

Agent ids ride through the kernel as f32 payloads — exact below 2**24
(16.7M agents); the jnp path has no such bound.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import PhysicsConfig, DEFAULT_PHYSICS
from ..network import Network
from ..state import RoadState

LANE = 128
TILE_E = 512
NEG_LARGE = -3.4e38


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _argmax_payload_kernel(seed_ref, dst_ref, logit_ref, pay_a_ref, pay_b_ref,
                           best_ref, out_a_ref, out_b_ref):
    """Per-segment Gumbel-max with two payload channels (VPU only)."""
    r_pad = best_ref.shape[1]
    tile_e = dst_ref.shape[1]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, NEG_LARGE)
        out_a_ref[:] = jnp.zeros_like(out_a_ref)
        out_b_ref[:] = jnp.full_like(out_b_ref, float(r_pad))

    pltpu.prng_seed(seed_ref[0] + step)
    # bitcast before shifting: prng_random_bits yields signed int32 on TPU,
    # and an arithmetic shift would sign-extend half the lanes into negative
    # "uniforms" (NaN Gumbel noise).  Mosaic cannot cast uint32 -> f32, so
    # bitcast the (now < 2**24, sign-clear) shifted value back to int32 first.
    bits = pltpu.bitcast(pltpu.prng_random_bits((1, tile_e)), jnp.uint32)
    shifted = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)[0, :]
    uniform = shifted.astype(jnp.float32) * (1.0 / (1 << 24))
    gumbel = -jnp.log(-jnp.log(uniform + 1e-7) + 1e-7)

    dst = dst_ref[0, :]
    logit = logit_ref[0, :]
    score = jnp.where(logit > NEG_LARGE, logit + gumbel, NEG_LARGE)

    col = jax.lax.broadcasted_iota(jnp.int32, (tile_e, r_pad), 1)
    onehot_v = dst[:, None] == col
    masked = jnp.where(onehot_v, score[:, None], NEG_LARGE)
    tile_best = masked.max(axis=0)  # [r_pad]
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_e, r_pad), 0)
    attains = (masked == tile_best[None, :]) & (masked > NEG_LARGE)
    best_row = jnp.where(attains, row, tile_e).min(axis=0)
    is_winner = (attains & (row == best_row[None, :])).astype(jnp.float32)
    tile_a = (is_winner * pay_a_ref[0, :][:, None]).sum(axis=0)
    tile_b = (is_winner * pay_b_ref[0, :][:, None]).sum(axis=0)
    has = tile_best > NEG_LARGE
    tile_b = jnp.where(has, tile_b, float(r_pad))

    better = tile_best[None, :] > best_ref[:]
    out_a_ref[:] = jnp.where(better, tile_a[None, :], out_a_ref[:])
    out_b_ref[:] = jnp.where(better, tile_b[None, :], out_b_ref[:])
    best_ref[:] = jnp.maximum(best_ref[:], tile_best[None, :])


@functools.partial(jax.jit, static_argnames=("num_segments",))
def gumbel_argmax_payload(logits, segment_ids, payload_a, payload_b, seed,
                          num_segments: int):
    """Sample one element per segment ∝ softmax(logits) (Gumbel-max, in-kernel
    PRNG) and return its two payload values.

    Returns ``(a f32[S], b f32[S])`` with ``a = 0`` and
    ``b = num_segments`` for segments with no finite-logit element.
    """
    e = logits.shape[0]
    r_pad = _round_up(num_segments + 1, LANE)
    e_pad = _round_up(max(e, TILE_E), TILE_E)
    pad_e = e_pad - e

    logit = jnp.where(jnp.isfinite(logits), logits, NEG_LARGE)
    logit = jnp.pad(logit.astype(jnp.float32), (0, pad_e),
                    constant_values=NEG_LARGE)
    dst = jnp.pad(segment_ids.astype(jnp.int32), (0, pad_e),
                  constant_values=r_pad - 1)
    pa = jnp.pad(payload_a.astype(jnp.float32), (0, pad_e))
    pb = jnp.pad(payload_b.astype(jnp.float32), (0, pad_e))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # seed
        grid=(e_pad // TILE_E,),
        in_specs=[
            pl.BlockSpec((1, TILE_E), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_E), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_E), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_E), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, r_pad), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_pad), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_pad), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    _, out_a, out_b = pl.pallas_call(
        _argmax_payload_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
        ),
    )(jnp.asarray([seed], jnp.int32), dst[None, :], logit[None, :],
      pa[None, :], pb[None, :])
    return out_a[0, :num_segments], out_b[0, :num_segments]


def fused_core_step(
    road: RoadState,
    selected_road: jnp.ndarray,
    network: Network,
    time: jnp.ndarray,
    key: jax.Array,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    compute_delta: bool = False,
) -> tuple[RoadState, jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ``direction_step`` + ``response_step``.

    Returns ``(road, popped, road_delta_tt)``; ``road_delta_tt`` is the
    per-source-road congestion delay (direction_mpnn.py:94-96, identical to
    ``direction_step``'s) when ``compute_delta``, else an empty array."""
    R = road.num_roads
    Nmax = road.nmax
    u = network.edge_src
    v = network.edge_dst

    head_id = road.head_ids()
    head_departure = road.head_departure()
    count_f = road.count.astype(jnp.float32)
    cap = network.capacity

    # Road-optimality series (direction_mpnn.py:94-96): the per-edge delta
    # depends only on the source road, so the per-source reduction over
    # outgoing turn edges is delta * out-degree — O(R) elementwise (the
    # out-degree constant folds at compile; see core.direction).
    if compute_delta:
        from ..ops.segment import segment_sum

        outdeg = jax.ops.segment_sum(
            jnp.ones_like(network.edge_attr), u, num_segments=R
        )
        head_arrival = road.head_arrival()
        road_delta_tt = (
            jnp.maximum((head_departure - head_arrival) - network.free_flow, 0.0)
            * outdeg
        )
    else:
        road_delta_tt = jnp.zeros((0,), jnp.float32)

    # Exact f32 message phase in XLA (identical to core.direction).
    dep_ok = head_departure[u] <= time
    space_ok = count_f[v] < cap[v] - physics.congestion_buffer
    wants_v = selected_road[:R][u] == v
    nonempty = road.count[u] > 0
    mask = dep_ok & space_ok & wants_v & nonempty
    # Gridlock escape with the same safety guards as core.direction.
    stuck = (head_departure[u] - time) < -physics.gridlock_patience
    u_full = cap[u] - physics.congestion_buffer <= count_f[u]
    v_freer = cap[u] - count_f[u] <= cap[v] - count_f[v]
    v_has_slot = count_f[v] < cap[v]
    mask = mask | (stuck & u_full & v_freer & wants_v & nonempty & v_has_slot)
    prob = network.edge_attr * mask.astype(jnp.float32)
    logits = jnp.where(prob > 0, jnp.log(jnp.maximum(prob, 1e-30)), -jnp.inf)

    seed = jax.random.randint(key, (), 0, 2**31 - 1)
    agent_f, src_f = gumbel_argmax_payload(
        logits, v, head_id[u].astype(jnp.float32), u.astype(jnp.float32),
        seed, R,
    )
    chosen_agent = agent_f.astype(jnp.int32)
    win_src = jnp.minimum(src_f.astype(jnp.int32), R)
    accept = chosen_agent != 0  # sentinel guard (direction_mpnn.py:194)

    # Push at downstream tails (direction update, direction_mpnn.py:171-195).
    slot = (road.head + road.count) % Nmax
    rows = jnp.where(accept, jnp.arange(R, dtype=jnp.int32), R)
    time_congestion = network.congestion_constant / (
        cap + physics.congestion_softening - count_f
    )
    travel_time = jnp.maximum(network.free_flow, time_congestion)
    fifo_ids = road.fifo_ids.at[rows, slot].set(chosen_agent, mode="drop")
    fifo_arrival = road.fifo_arrival.at[rows, slot].set(
        jnp.broadcast_to(time, (R,)), mode="drop"
    )
    fifo_departure = road.fifo_departure.at[rows, slot].set(
        time + travel_time, mode="drop"
    )
    chosen_dest = jnp.where(
        accept, road.head_dests()[jnp.minimum(win_src, R - 1)], 0
    )
    fifo_dest = road.fifo_dest.at[rows, slot].set(chosen_dest, mode="drop")
    new_count = road.count + accept.astype(jnp.int32)

    # Pop at winning upstream heads (the fused response phase).
    pop_src = jnp.where(accept, win_src, R)
    popped = jnp.zeros((R,), bool).at[pop_src].set(True, mode="drop")
    new_head = (road.head + popped.astype(jnp.int32)) % Nmax
    new_count = new_count - popped.astype(jnp.int32)

    return (
        road._replace(
            fifo_ids=fifo_ids,
            fifo_arrival=fifo_arrival,
            fifo_departure=fifo_departure,
            fifo_dest=fifo_dest,
            head=new_head,
            count=new_count,
        ),
        popped,
        road_delta_tt,
    )
