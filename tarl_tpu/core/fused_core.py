"""Fused direction+response as one Pallas TPU kernel.

The two-phase commit (DirectionMPNN propose + ResponseMPNN confirm,
direction_mpnn.py:44-196 / response_mpnn.py:42-127) reduces to: for every
downstream road, pick one incoming proposal by Gumbel-max over eligible turn
edges; the upstream source of the winning proposal pops its head.  The
response's ``tail == head`` check is exactly "my proposal won" — an agent
sits on one road only, so the downstream tail can equal the upstream head iff
the transfer just happened (see response_mpnn.py:62-80).

This kernel evaluates the whole edge phase in one pass over turn-edge tiles:

* per-road upstream/downstream features are **gathered via one-hot MXU
  contraction** (``onehot(edge_endpoint) @ feature_matrix``) — TPU Pallas has
  no vector gather, but the MXU makes the one-hot product cheap at these
  shapes;
* eligibility + gridlock masks and edge probabilities are computed on the
  VPU (direction_mpnn.py:81-91);
* Gumbel noise comes from the in-kernel PRNG (``pltpu.prng_random_bits``),
  reseeded per tile from a scalar-prefetch seed;
* a running (best score, winning head id, winning source road) triple per
  downstream road is accumulated across tiles (TPU grid steps execute
  sequentially, so output revisiting is race-free).

Outputs: ``chosen_agent[R]`` (0 = none), ``win_src[R]`` (source road of the
winning proposal, R = none).  FIFO pushes/pops stay outside as cheap
[R]-indexed XLA updates (see :func:`fused_core_step`).

The jnp implementation (core.direction/core.response) remains the reference
path and the CPU fallback; sampling here is distribution-equivalent but uses
a different RNG stream.
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

# Columns of the upstream feature matrix.
U_HEAD_DEP, U_HEAD_ID, U_COUNT, U_CAP, U_SEL = range(5)
# Columns of the downstream feature matrix.
D_COUNT, D_CAP = range(2)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_kernel(seed_ref, time_ref, src_ref, dst_ref, attr_ref,
                  up_ref, dn_ref,
                  best_ref, agent_ref, winsrc_ref, *,
                  congestion_buffer, gridlock_patience):
    r_pad = up_ref.shape[0]
    tile_e = src_ref.shape[1]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, NEG_LARGE)
        agent_ref[:] = jnp.zeros_like(agent_ref)
        winsrc_ref[:] = jnp.full_like(winsrc_ref, float(r_pad))

    pltpu.prng_seed(seed_ref[0] + step)

    src = src_ref[0, :]   # int32[tile_e] upstream road (padded rows -> r_pad-1
    dst = dst_ref[0, :]   # with attr 0, masked out by prob == 0)
    attr = attr_ref[0, :]
    t = time_ref[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (tile_e, r_pad), 1)
    onehot_u = (src[:, None] == col).astype(jnp.float32)
    onehot_v = (dst[:, None] == col).astype(jnp.float32)

    # One-hot MXU gathers of per-road features.
    up = jax.lax.dot_general(
        onehot_u, up_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tile_e, 5]
    dn = jax.lax.dot_general(
        onehot_v, dn_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tile_e, 2]

    dst_f = dst.astype(jnp.float32)
    dep_ok = up[:, U_HEAD_DEP] <= t
    space_ok = dn[:, D_COUNT] < dn[:, D_CAP] - congestion_buffer
    wants_v = up[:, U_SEL] == dst_f
    nonempty = up[:, U_COUNT] > 0
    mask = dep_ok & space_ok & wants_v & nonempty

    stuck = (up[:, U_HEAD_DEP] - t) < -gridlock_patience
    u_full = up[:, U_CAP] - congestion_buffer <= up[:, U_COUNT]
    v_freer = up[:, U_CAP] - up[:, U_COUNT] <= dn[:, D_CAP] - dn[:, D_COUNT]
    mask = mask | (stuck & u_full & v_freer & wants_v)

    prob = attr * mask.astype(jnp.float32)

    # Gumbel-max scores from the in-kernel PRNG (Mosaic needs rank >= 2).
    bits = pltpu.prng_random_bits((1, tile_e))[0, :]
    uniform = (bits >> jnp.uint32(8)).astype(jnp.float32) * (1.0 / (1 << 24))
    gumbel = -jnp.log(-jnp.log(uniform + 1e-7) + 1e-7)
    score = jnp.where(prob > 0, jnp.log(jnp.maximum(prob, 1e-30)) + gumbel,
                      NEG_LARGE)

    # Per-downstream tile best + payloads (winning head id / source road).
    masked = jnp.where(onehot_v > 0, score[:, None], NEG_LARGE)
    tile_best = masked.max(axis=0)  # [r_pad]
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_e, r_pad), 0)
    attains = (masked == tile_best[None, :]) & (masked > NEG_LARGE)
    best_row = jnp.where(attains, row, tile_e).min(axis=0)
    is_winner = attains & (row == best_row[None, :])
    win_f = is_winner.astype(jnp.float32)
    tile_agent = (win_f * up[:, U_HEAD_ID][:, None]).sum(axis=0)
    tile_src = (win_f * src.astype(jnp.float32)[:, None]).sum(axis=0)
    has = tile_best > NEG_LARGE
    tile_src = jnp.where(has, tile_src, float(r_pad))

    better = tile_best[None, :] > best_ref[:]
    agent_ref[:] = jnp.where(better, tile_agent[None, :], agent_ref[:])
    winsrc_ref[:] = jnp.where(better, tile_src[None, :], winsrc_ref[:])
    best_ref[:] = jnp.maximum(best_ref[:], tile_best[None, :])


@functools.partial(
    jax.jit,
    static_argnames=("num_roads", "congestion_buffer", "gridlock_patience"),
)
def fused_edge_phase(
    edge_src, edge_dst, edge_attr,
    head_dep, head_id, count, cap, selected,
    time, seed,
    num_roads: int,
    congestion_buffer: float,
    gridlock_patience: float,
):
    """Run the fused kernel; returns (chosen_agent i32[R], win_src i32[R])
    with ``win_src == R`` where no proposal won."""
    e = edge_src.shape[0]
    r_pad = _round_up(num_roads + 1, LANE)
    e_pad = _round_up(max(e, TILE_E), TILE_E)

    pad_e = e_pad - e
    src = jnp.pad(edge_src.astype(jnp.int32), (0, pad_e),
                  constant_values=r_pad - 1)
    dst = jnp.pad(edge_dst.astype(jnp.int32), (0, pad_e),
                  constant_values=r_pad - 1)
    attr = jnp.pad(edge_attr.astype(jnp.float32), (0, pad_e))

    def pad_r(x, fill=0.0):
        return jnp.pad(x.astype(jnp.float32), (0, r_pad - num_roads),
                       constant_values=fill)

    up = jnp.stack(
        [pad_r(head_dep, 1e30), pad_r(head_id.astype(jnp.float32)),
         pad_r(count.astype(jnp.float32)), pad_r(cap), pad_r(selected, -1.0)],
        axis=1,
    )  # [r_pad, 5]
    dn = jnp.stack(
        [pad_r(count.astype(jnp.float32)), pad_r(cap)], axis=1
    )  # [r_pad, 2]

    kernel = functools.partial(
        _fused_kernel,
        congestion_buffer=float(congestion_buffer),
        gridlock_patience=float(gridlock_patience),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # seed, time
        grid=(e_pad // TILE_E,),
        in_specs=[
            pl.BlockSpec((1, TILE_E), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_E), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_E), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, 8), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, 8), lambda i, *_: (0, 0),
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
    # Pad the feature matrices' trailing dim to the lane-friendly width 8.
    up8 = jnp.pad(up, ((0, 0), (0, 8 - up.shape[1])))
    dn8 = jnp.pad(dn, ((0, 0), (0, 8 - dn.shape[1])))

    _, agent_f, winsrc_f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
        ),
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([time], jnp.float32),
        src[None, :], dst[None, :], attr[None, :],
        up8, dn8,
    )
    chosen_agent = agent_f[0, :num_roads].astype(jnp.int32)
    win_src = jnp.minimum(
        winsrc_f[0, :num_roads].astype(jnp.int32), num_roads
    )
    return chosen_agent, win_src


def fused_core_step(
    road: RoadState,
    selected_road: jnp.ndarray,
    network: Network,
    time: jnp.ndarray,
    key: jax.Array,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
) -> tuple[RoadState, jnp.ndarray]:
    """Drop-in replacement for ``direction_step`` + ``response_step`` (minus
    the optional road-optimality series): one kernel for the edge phase, then
    cheap [R]-indexed updates for the push/pop."""
    R = road.num_roads
    Nmax = road.nmax
    seed = jax.random.randint(key, (), 0, 2**31 - 1)

    chosen_agent, win_src = fused_edge_phase(
        network.edge_src, network.edge_dst, network.edge_attr,
        road.head_departure(), road.head_ids(),
        road.count, network.capacity, selected_road[:R].astype(jnp.float32),
        time, seed,
        num_roads=R,
        congestion_buffer=physics.congestion_buffer,
        gridlock_patience=physics.gridlock_patience,
    )
    accept = chosen_agent != 0  # sentinel guard (direction_mpnn.py:194)

    # Push at downstream tails.
    count_f = road.count.astype(jnp.float32)
    slot = (road.head + road.count) % Nmax
    rows = jnp.where(accept, jnp.arange(R, dtype=jnp.int32), R)
    time_congestion = network.congestion_constant / (
        network.capacity + physics.congestion_softening - count_f
    )
    travel_time = jnp.maximum(network.free_flow, time_congestion)
    fifo_ids = road.fifo_ids.at[rows, slot].set(chosen_agent, mode="drop")
    fifo_arrival = road.fifo_arrival.at[rows, slot].set(
        jnp.broadcast_to(time, (R,)), mode="drop"
    )
    fifo_departure = road.fifo_departure.at[rows, slot].set(
        time + travel_time, mode="drop"
    )
    new_count = road.count + accept.astype(jnp.int32)

    # Pop at winning upstream heads (the response phase).
    pop_src = jnp.where(accept, win_src, R)
    popped = jnp.zeros((R,), bool).at[pop_src].set(True, mode="drop")
    new_head = (road.head + popped.astype(jnp.int32)) % Nmax
    new_count = new_count - popped.astype(jnp.int32)

    return (
        road._replace(
            fifo_ids=fifo_ids,
            fifo_arrival=fifo_arrival,
            fifo_departure=fifo_departure,
            head=new_head,
            count=new_count,
        ),
        popped,
    )
