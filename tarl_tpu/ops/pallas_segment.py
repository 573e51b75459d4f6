"""Pallas TPU kernels for segment reductions over edge lists.

These are the hand-written replacements for torch_scatter's CUDA kernels
(direction_mpnn.py:4,133-139 — the reference's hottest native dependency).
XLA lowers ``jax.ops.segment_*`` scatter-reduces to sequential scatter loops
on TPU; these kernels instead stream edge tiles through VMEM and reduce via
**one-hot contraction** — ``segment_sum`` becomes an MXU matmul
``onehot(seg)^T @ data`` built tile-by-tile in VMEM (never materialized in
HBM), and ``segment_max`` a VPU masked-max sweep.  The TPU grid executes
sequentially on a core, so accumulating into the output block across grid
steps is race-free (the standard revisiting pattern).

All kernels take a static ``num_segments``; outputs are padded to lane
multiples internally and sliced on return.  Use
:func:`tarl_tpu.ops.segment.use_pallas` / the module-level dispatch in
ops.segment to route the core physics through them on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEFAULT_TILE_E = 512
# Plain Python float: jnp scalars would be captured as traced constants
# inside the kernels, which pallas_call rejects.
NEG_LARGE = -3.4e38


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Max segment-block width per grid step: [TILE_E, SEG_TILE] one-hot tiles
# (~2 live f32 copies) against the ~16 MB scoped-vmem limit.  Larger segment
# counts TILE over blocks (a second grid dimension): each edge tile is
# re-streamed per block, so total work is O(E * num_segments / SEG_TILE)
# grid steps — unbounded segment support, matching torch_scatter
# (direction_mpnn.py:133-139).
SEG_TILE = 2048


def _seg_blocks(r_pad: int) -> tuple[int, int]:
    """(block width, number of blocks) covering ``r_pad`` columns."""
    if r_pad <= SEG_TILE:
        return r_pad, 1
    return SEG_TILE, (r_pad + SEG_TILE - 1) // SEG_TILE


def _pad_edges(data, seg, tile_e, pad_seg_value):
    e = data.shape[0]
    e_pad = _round_up(max(e, tile_e), tile_e)
    if e_pad != e:
        data = jnp.pad(data, (0, e_pad - e))
        seg = jnp.pad(seg, (0, e_pad - e), constant_values=pad_seg_value)
    return data, seg, e_pad


# ---------------------------------------------------------------------------
# segment sum: one-hot MXU contraction
# ---------------------------------------------------------------------------
def _segment_sum_kernel(seg_ref, data_ref, out_ref, *, seg_tile):
    tile_e = data_ref.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    seg = seg_ref[0, :]  # [TILE_E]
    data = data_ref[0, :]
    base = pl.program_id(0) * seg_tile
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_e, seg_tile), 1)
    onehot = (seg[:, None] == col + base).astype(jnp.float32)
    # [1, TILE_E] @ [TILE_E, R_pad] on the MXU.  HIGHEST precision: the MXU's
    # default bf16 passes would round the data before summation.
    partial = jax.lax.dot_general(
        data[None, :], onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[:] += partial


@functools.partial(jax.jit, static_argnames=("num_segments", "tile_e"))
def segment_sum_pallas(data, segment_ids, num_segments: int,
                       tile_e: int = DEFAULT_TILE_E):
    """float32 segment sum via tiled one-hot MXU contraction."""
    data = data.astype(jnp.float32)
    seg = segment_ids.astype(jnp.int32)
    # Out-of-range ids (callers use them as drop sentinels) and padding go to
    # a column beyond num_segments inside the padded width.
    r_pad = _round_up(num_segments + 1, LANE)
    seg = jnp.where((seg < 0) | (seg >= num_segments), num_segments, seg)
    data, seg, e_pad = _pad_edges(data, seg, tile_e, num_segments)

    seg_tile, n_blocks = _seg_blocks(r_pad)
    out = pl.pallas_call(
        functools.partial(_segment_sum_kernel, seg_tile=seg_tile),
        grid=(n_blocks, e_pad // tile_e),
        in_specs=[
            pl.BlockSpec((1, tile_e), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_e), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, seg_tile), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_blocks * seg_tile), jnp.float32),
    )(seg[None, :], data[None, :])
    return out[0, :num_segments]


# ---------------------------------------------------------------------------
# segment max: VPU masked-max sweep
# ---------------------------------------------------------------------------
def _segment_max_kernel(seg_ref, data_ref, out_ref, *, seg_tile):
    tile_e = data_ref.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, NEG_LARGE)

    seg = seg_ref[0, :]
    data = data_ref[0, :]
    base = pl.program_id(0) * seg_tile
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_e, seg_tile), 1)
    masked = jnp.where(seg[:, None] == col + base, data[:, None], NEG_LARGE)
    out_ref[:] = jnp.maximum(out_ref[:], masked.max(axis=0)[None, :])


@functools.partial(jax.jit, static_argnames=("num_segments", "tile_e"))
def segment_max_pallas(data, segment_ids, num_segments: int,
                       tile_e: int = DEFAULT_TILE_E):
    """float32 segment max; empty segments return a large negative value
    (matching jax.ops.segment_max's -inf identity closely enough for the
    masking callers do)."""
    data = data.astype(jnp.float32)
    seg = segment_ids.astype(jnp.int32)
    r_pad = _round_up(num_segments + 1, LANE)
    seg = jnp.where((seg < 0) | (seg >= num_segments), num_segments, seg)
    data, seg, e_pad = _pad_edges(data, seg, tile_e, num_segments)
    data = jnp.where(seg == num_segments, NEG_LARGE, data)

    seg_tile, n_blocks = _seg_blocks(r_pad)
    out = pl.pallas_call(
        functools.partial(_segment_max_kernel, seg_tile=seg_tile),
        grid=(n_blocks, e_pad // tile_e),
        in_specs=[
            pl.BlockSpec((1, tile_e), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_e), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, seg_tile), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_blocks * seg_tile), jnp.float32),
    )(seg[None, :], data[None, :])
    return out[0, :num_segments]


# ---------------------------------------------------------------------------
# segment argmax: two-output sweep (max value + min index attaining it)
# ---------------------------------------------------------------------------
def _segment_argmax_kernel(seg_ref, data_ref, max_ref, arg_ref, *,
                           e_total, seg_tile):
    tile_e = data_ref.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        max_ref[:] = jnp.full_like(max_ref, NEG_LARGE)
        arg_ref[:] = jnp.full_like(arg_ref, e_total)

    seg = seg_ref[0, :]
    data = data_ref[0, :]
    base = pl.program_id(1) * tile_e
    seg_base = pl.program_id(0) * seg_tile
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_e, seg_tile), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_e, seg_tile), 0)
    is_seg = seg[:, None] == col + seg_base
    masked = jnp.where(is_seg, data[:, None], NEG_LARGE)
    tile_max = masked.max(axis=0)  # [R_pad]
    # Lowest edge index attaining the tile max within each segment column.
    attains = is_seg & (masked == tile_max[None, :]) & (masked > NEG_LARGE)
    idx = jnp.where(attains, base + row, e_total)
    tile_arg = idx.min(axis=0)

    better = tile_max[None, :] > max_ref[:]
    equal = tile_max[None, :] == max_ref[:]
    arg_ref[:] = jnp.where(
        better, tile_arg[None, :],
        jnp.where(equal, jnp.minimum(arg_ref[:], tile_arg[None, :]), arg_ref[:]),
    )
    max_ref[:] = jnp.maximum(max_ref[:], tile_max[None, :])


@functools.partial(jax.jit, static_argnames=("num_segments", "tile_e"))
def segment_argmax_pallas(scores, segment_ids, num_segments: int,
                          tile_e: int = DEFAULT_TILE_E):
    """int32 index of the max score per segment, ties to the lowest index;
    ``len(scores)`` for empty / all -inf segments (matches
    ops.segment.segment_argmax)."""
    e_total = scores.shape[0]
    scores = jnp.where(jnp.isfinite(scores), scores, NEG_LARGE).astype(jnp.float32)
    seg = segment_ids.astype(jnp.int32)
    r_pad = _round_up(num_segments + 1, LANE)
    seg = jnp.where((seg < 0) | (seg >= num_segments), num_segments, seg)
    scores, seg, e_pad = _pad_edges(scores, seg, tile_e, num_segments)
    scores = jnp.where(seg == num_segments, NEG_LARGE, scores)

    seg_tile, n_blocks = _seg_blocks(r_pad)
    _, arg = pl.pallas_call(
        functools.partial(_segment_argmax_kernel, e_total=e_total,
                          seg_tile=seg_tile),
        grid=(n_blocks, e_pad // tile_e),
        in_specs=[
            pl.BlockSpec((1, tile_e), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_e), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, seg_tile), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, seg_tile), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_blocks * seg_tile), jnp.float32),
            jax.ShapeDtypeStruct((1, n_blocks * seg_tile), jnp.int32),
        ),
    )(seg[None, :], scores[None, :])
    return jnp.minimum(arg[0, :num_segments], e_total)
