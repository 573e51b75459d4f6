"""Fused direction+confirm winner kernel (the launch-bound mid-section).

On-chip ablation at Grid64x64 (scripts/ablate_core.py): the direction+
confirm pair costs 575 µs/tick of which the head extraction is 10.9 µs and
the FIFO push 15.1 µs — the remaining ~550 µs is ~100 small XLA kernels
(the roll-plan bucket slices/selects, the per-in-slot eligibility loop, the
winner compares, confirm's out-roll check), each paying ~5-7 µs of launch
overhead on a few hundred KB of data.  This module runs that entire
mid-section as ONE Pallas kernel with everything VMEM-resident:

* the roll-plan bucket reads become compile-time lane rotations
  (``pltpu.roll(ch, (R - d) % R, axis=1)`` with the offset baked in from
  ``Network.in_roll_shift_t`` — the static tuple mirror of the plan);
* roll-plan EXCEPTIONS (the ~0.8 % of turn entries off the global offsets)
  enter as a dense ``[3·KIN, R]`` overlay built by ONE scatter per tick
  outside the kernel (``exc_mask`` itself is network-static and hoists out
  of the episode scan);
* the per-slot eligibility (bit tests on the packed upstream word),
  Gumbel-max winner (ascending-slot strict->), sentinel guard, and
  confirm's rolled winner check all run as unrolled vector ops;
* out-table exceptions are patched OUTSIDE on the kernel's ``win_src``
  output (a ~E-index gather/compare/scatter — E is tiny).

The Gumbel matrix is drawn OUTSIDE in the same ``[KIN, R]`` slot-major
order as :func:`core.direction.direction_step`, so the fused path is
BITWISE-identical to the unfused one (pinned by
tests/test_fused_winner.py in interpret mode; the same physics as
direction_mpnn.py:44-196 + response_mpnn.py:86-127 with the win-pop
confirm fix of core.response).

TILED variant (:func:`direction_confirm_fused_tiled`): the single-block
kernel keeps every ``[K, R]`` table VMEM-resident, which caps it at
~28 MB of inputs (Grid256's 46 MB compiled to a 163 MB live-set and
OOM'd the 128 MB chip).  The tiled form hoists the only GLOBAL ops — the
static lane rotations — OUT of the kernel as ``B`` XLA ``jnp.roll``s of
the stacked ``[3, R]`` channel matrix (index-free full-bandwidth copies,
one per roll-plan bucket); after pre-rolling, the entire mid-section is
COLUMNWISE, so it grid-tiles over the road axis with no halo and runs at
any network size.  Confirm needs the rolled WINNER row (a kernel output),
so the tiled path is two kernels with the ``B_out`` win_src rolls between
them.  Same prologue/epilogue, same bitwise guarantees.  MEASURED RESULT:
at Grid256 the tiled form is ~5 % slower than the XLA roll path (the
single-block kernel's win is VMEM residency, which tiling gives up), so
it is OPT-IN — see :func:`fused_winner_tiled_ok`.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..config import PhysicsConfig, DEFAULT_PHYSICS
from ..network import Network
from ..state import RoadState
from .direction import pack_upstream, upstream_pack_layout

# VMEM budget for the single-block kernel: ~12 [K, R] i32/f32 tables + a few
# [1, R] vectors must fit with headroom.
_VMEM_BYTES = 100 * 1024 * 1024

# Gate threshold on the INPUT-table estimate: measured on v5e, the live
# intermediates (register-allocator spill slots) run ~3.5x the input bytes —
# Grid256 (est 46 MB) compiled to a 163 MB vmem requirement and OOM'd the
# 128 MB chip, while Grid128 (est 11.6 MB) runs fine.  28 MB keeps ~3.5x
# headroom; larger networks fall back to the XLA roll path.
_EST_BYTES_MAX = 28 * 1024 * 1024


def fused_winner_ok(network: Network) -> bool:
    """Trace-time gate: TPU backend, both roll plans built, modest slot
    counts, VMEM fits.  ``TARL_FUSED_WINNER=0`` opts out (A/B switch);
    ``TARL_FUSED_WINNER_INTERPRET=1`` forces the interpret-mode kernel on
    CPU (equality tests)."""
    if os.environ.get("TARL_FUSED_WINNER", "1") != "1":
        return False
    if os.environ.get("TARL_NO_ROLL", "0") == "1":
        return False  # the kernel IS a roll evaluation (A/B hygiene)
    interpret = os.environ.get("TARL_FUSED_WINNER_INTERPRET", "0") == "1"
    if not interpret and jax.default_backend() != "tpu":
        return False
    if not network.in_roll_shift_t or not network.out_roll_shift_t:
        return False
    kin = network.in_src_tab.shape[0]
    kout = network.out_dst_tab.shape[0]
    r = network.num_roads
    if kin > 8 or kout > 8:
        return False
    # pltpu.roll handles arbitrary (non-128-multiple) logical lane widths
    # exactly (scripts/probe_roll.py: verified on chip at R=777/960/16128).
    est = 4 * r * (6 * kin + 3 * kout + 8)
    return est <= _EST_BYTES_MAX


def _kernel(
    pack_ref, head_id_ref, head_dest_ref, gumbel_ref, exc_ref,
    in_sel_ref, in_logit_ref, in_src_ref, exc_mask_ref,
    out_sel_ref, out_ok_ref, count_ref, cap_ref,
    accept_ref, win_src_ref, agent_ref, dest_ref, popped_ref,
    *, in_shifts, out_shifts, kin, kout, r,
    shift_free, shift_sel, free_mask, buffer_i,
):
    from jax.experimental.pallas import tpu as pltpu

    neg_inf = float(-jnp.inf)
    b_in = len(in_shifts)
    b_out = len(out_shifts)

    in_sel = in_sel_ref[...]          # int32 [KIN, R]
    exc_mask = exc_mask_ref[...]      # int32 [KIN, R] (1 on exception entries)
    exc = exc_ref[...]                # int32 [3*KIN, R] overlay values

    def gather_ch(ch, exc_rows):
        """ch [1, R] -> [KIN, R] via the static-rotation roll plan; entries
        flagged by exc_mask take the overlay rows instead."""
        val = jnp.where(exc_mask != 0, exc_rows, 0)
        for b in range(b_in):
            rolled = pltpu.roll(ch, (r - in_shifts[b]) % r, axis=1)  # [1, R]
            val = jnp.where(in_sel == b, rolled, val)
        return val

    pack_s = gather_ch(pack_ref[...], exc[0:kin])
    id_s = gather_ch(head_id_ref[...], exc[kin:2 * kin])
    dest_s = gather_ch(head_dest_ref[...], exc[2 * kin:3 * kin])

    # Downstream-side ingredients (core.direction:130-133), [1, R].
    count_f = count_ref[...]
    cap = cap_ref[...]
    space_ok = count_f < cap - float(buffer_i)
    v_free = cap - count_f
    v_has_slot = count_f < cap

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, pack_s.shape[1]), 1)

    # Eligibility + Gumbel-max winner, unrolled over in-slots
    # (core.direction:175-199; invalid slots carry logit = -inf, so no
    # explicit ok mask is needed — their score can never win).
    dep_ok = (pack_s & 1) > 0
    nonempty = (pack_s & 2) > 0
    stuck = (pack_s & 4) > 0
    u_free = ((pack_s >> shift_free) & free_mask).astype(jnp.float32)
    u_full = u_free <= float(buffer_i)
    wants_v = (pack_s >> shift_sel) == iota
    mask = dep_ok & space_ok & wants_v & nonempty
    mask = mask | (stuck & u_full & (u_free <= v_free) & wants_v
                   & nonempty & v_has_slot)
    score = jnp.where(
        mask, in_logit_ref[...] + gumbel_ref[...], neg_inf
    )  # [KIN, R]

    in_src = in_src_ref[...]
    best = jnp.full((1, score.shape[1]), neg_inf, jnp.float32)
    src = jnp.zeros((1, score.shape[1]), jnp.int32)
    agent = jnp.zeros((1, score.shape[1]), jnp.int32)
    dest = jnp.zeros((1, score.shape[1]), jnp.int32)
    acc = jnp.zeros((1, score.shape[1]), jnp.bool_)
    for k in range(kin):
        s_k = score[k:k + 1]
        take = s_k > best
        best = jnp.where(take, s_k, best)
        src = jnp.where(take, in_src[k:k + 1], src)
        agent = jnp.where(take, id_s[k:k + 1], agent)
        dest = jnp.where(take, dest_s[k:k + 1], dest)
        acc = acc | take

    agent = jnp.where(acc, agent, 0)
    acc = agent != 0          # sentinel guard (direction_mpnn.py:194)
    dest = jnp.where(acc, dest, 0)
    win_src = jnp.where(acc, src, r)

    # Confirm's winner check over the out-table roll plan
    # (core.response.confirm_step): road u popped iff some downstream's
    # winner is u.  Exceptions patched outside on win_src.
    out_sel = out_sel_ref[...]
    out_ok = out_ok_ref[...]
    win_rows = jnp.full(out_sel.shape, -1, jnp.int32)
    for b in range(b_out):
        rolled = pltpu.roll(win_src, (r - out_shifts[b]) % r, axis=1)
        win_rows = jnp.where(out_sel == b, rolled, win_rows)
    popped = jnp.zeros((1, out_sel.shape[1]), jnp.bool_)
    for k in range(kout):
        popped = popped | (
            (out_ok[k:k + 1] != 0) & (win_rows[k:k + 1] == iota)
        )

    accept_ref[...] = acc.astype(jnp.int32)
    win_src_ref[...] = win_src
    agent_ref[...] = agent
    dest_ref[...] = dest
    popped_ref[...] = popped.astype(jnp.int32)


def _winner_inputs(road, selected_road, network, time, key, physics):
    """Shared prologue: packed upstream word, head rows, Gumbel matrix and
    the in-table exception overlay/mask (identical for both kernel forms)."""
    R = road.num_roads
    Nmax = road.nmax
    KIN = network.in_src_tab.shape[0]

    head_id = road.head_ids()
    head_arrival = road.head_arrival()
    head_departure = road.head_departure()
    head_dest = road.head_dests()
    count_f = road.count.astype(jnp.float32)
    cap = network.capacity
    sel = selected_road[:R]

    shift_free, shift_sel, free_mask = upstream_pack_layout(R, Nmax)
    sel_enc = jnp.where((sel >= 0) & (sel < R), sel, R).astype(jnp.int32)
    pack = pack_upstream(
        head_departure, road.count, cap, sel_enc, time, physics, R, Nmax
    )
    from .rng import direction_gumbel

    gumbel = direction_gumbel(key, network)  # canonical-addressed if renumbered

    # In-table exception overlay: one [3·KIN, R] scatter of the current
    # channel values at the (channel, slot, road) exception coordinates.
    # The coordinate/mask arrays are network constants — XLA hoists them
    # out of the episode scan; only the value gather+scatter runs per tick.
    mat = jnp.stack([pack, head_id, head_dest])  # [3, R] int32
    E = int(network.in_roll_exc_src.shape[0])
    if E:
        vals = mat[:, network.in_roll_exc_src].reshape(-1)       # [3E]
        rows = (
            jnp.arange(3, dtype=jnp.int32)[:, None] * KIN
            + network.in_roll_exc_k[None, :]
        ).reshape(-1)
        cols = jnp.tile(network.in_roll_exc_v, 3)
        exc_overlay = jnp.zeros((3 * KIN, R), jnp.int32).at[rows, cols].set(
            vals, mode="drop"
        )
    else:
        exc_overlay = jnp.zeros((3 * KIN, R), jnp.int32)
    exc_mask = jnp.zeros((KIN, R), jnp.int32).at[
        network.in_roll_exc_k, network.in_roll_exc_v
    ].set(1, mode="drop")
    return (
        mat, head_arrival, head_departure, count_f, cap, gumbel,
        exc_overlay, exc_mask, (shift_free, shift_sel, free_mask),
    )


def _patch_out_exceptions(popped, win_src, network, R):
    """Out-table exceptions: the few (k, v) entries off the global offsets —
    road exc_src[e] pops if it won column exc_v[e] (tiny index ops)."""
    Eo = int(network.out_roll_exc_src.shape[0])
    if Eo:
        # Entry (k, v) with downstream exc_src: v pops iff exc_src's winner
        # is v (the exception rows of confirm's win_rows table).
        hit = (
            win_src[network.out_roll_exc_src] == network.out_roll_exc_v
        ).astype(jnp.int32)
        popped = popped | (
            jnp.zeros((R,), jnp.int32).at[network.out_roll_exc_v].add(
                hit, mode="drop"
            ) > 0
        )
    return popped


def _winner_epilogue(
    road, network, physics, time, head_arrival, head_departure, count_f,
    accept, chosen_agent, chosen_dest, popped, compute_delta,
):
    """Shared update: push winners at the tail (direction_mpnn.py:171-195),
    pop confirmed heads, and the congestion-delay observability row."""
    Nmax = road.nmax
    cap = network.capacity
    slot = (road.head + road.count) % Nmax
    time_congestion = network.congestion_constant / (
        cap + physics.congestion_softening - count_f
    )
    travel_time = jnp.maximum(network.free_flow, time_congestion)
    col = jnp.arange(Nmax, dtype=jnp.int32)[None, :]
    hit = (col == slot[:, None]) & accept[:, None]
    fifo_ids = jnp.where(hit, chosen_agent[:, None], road.fifo_ids)
    fifo_arrival = jnp.where(hit, time, road.fifo_arrival)
    fifo_departure = jnp.where(
        hit, (time + travel_time)[:, None], road.fifo_departure
    )
    fifo_dest = jnp.where(hit, chosen_dest[:, None], road.fifo_dest)
    popped_i32 = popped.astype(jnp.int32)
    new_count = road.count + accept.astype(jnp.int32) - popped_i32
    new_head = (road.head + popped_i32) % Nmax

    if compute_delta:
        outdeg = network.out_edge_ok.sum(axis=0).astype(jnp.float32)
        road_delta_tt = (
            jnp.maximum(
                (head_departure - head_arrival) - network.free_flow, 0.0
            ) * outdeg
        )
    else:
        road_delta_tt = jnp.zeros((0,), jnp.float32)

    return (
        road._replace(
            fifo_ids=fifo_ids,
            fifo_arrival=fifo_arrival,
            fifo_departure=fifo_departure,
            fifo_dest=fifo_dest,
            head=new_head,
            count=new_count,
        ),
        road_delta_tt,
    )


def direction_confirm_fused(
    road: RoadState,
    selected_road: jnp.ndarray,
    network: Network,
    time: jnp.ndarray,
    key: jax.Array,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    compute_delta: bool = True,
) -> tuple[RoadState, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in for ``direction_step`` + ``confirm_step`` on the roll path:
    returns ``(road, road_delta_tt, accept, win_src, popped)`` bitwise-equal
    to the unfused pair (same Gumbel stream, same tie-breaks)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = road.num_roads
    KIN = network.in_src_tab.shape[0]
    KOUT = network.out_dst_tab.shape[0]
    interpret = os.environ.get("TARL_FUSED_WINNER_INTERPRET", "0") == "1"

    (
        mat, head_arrival, head_departure, count_f, cap, gumbel,
        exc_overlay, exc_mask, (shift_free, shift_sel, free_mask),
    ) = _winner_inputs(road, selected_road, network, time, key, physics)
    pack, head_id, head_dest = mat[0], mat[1], mat[2]

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((1, R), jnp.int32) for _ in range(5)]
    extra = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BYTES)
    )
    accept_i, win_src, chosen_agent, chosen_dest, popped_i = pl.pallas_call(
        functools.partial(
            _kernel,
            in_shifts=network.in_roll_shift_t,
            out_shifts=network.out_roll_shift_t,
            kin=KIN, kout=KOUT, r=R,
            shift_free=shift_free, shift_sel=shift_sel, free_mask=free_mask,
            buffer_i=int(physics.congestion_buffer),
        ),
        in_specs=[spec] * 13,
        out_specs=[spec] * 5,
        out_shape=out_shape,
        interpret=interpret,
        **extra,
    )(
        pack[None, :], head_id[None, :], head_dest[None, :], gumbel,
        exc_overlay, network.in_roll_sel, network.in_logit_tab,
        network.in_src_tab, exc_mask, network.out_roll_sel,
        network.out_edge_ok.astype(jnp.int32), count_f[None, :],
        cap[None, :],
    )
    accept = accept_i[0] > 0
    win_src = win_src[0]
    chosen_agent = chosen_agent[0]
    chosen_dest = chosen_dest[0]
    popped = popped_i[0] > 0

    popped = _patch_out_exceptions(popped, win_src, network, R)
    new_road, road_delta_tt = _winner_epilogue(
        road, network, physics, time, head_arrival, head_departure, count_f,
        accept, chosen_agent, chosen_dest, popped, compute_delta,
    )
    return new_road, road_delta_tt, accept, win_src, popped


# ---------------------------------------------------------------------------
# Tiled variant — any network size.
# ---------------------------------------------------------------------------

# Lanes per grid tile.  VMEM per tile is ~(3·B_in + 5·KIN + 3·KIN + 2 + 4)
# rows × 4 B × TILE — ≤ 4 MB at the 8192 default even for a 24-bucket plan.
def _tile_lanes() -> int:
    # Round the env override UP to a multiple of 128: a non-lane-aligned
    # BlockSpec width fails Mosaic lowering with an opaque error.
    raw = int(os.environ.get("TARL_FUSED_TILE", "8192"))
    return max(128, ((raw + 127) // 128) * 128)


def fused_winner_tiled_ok(network: Network) -> bool:
    """Trace-time gate for the tiled form: same requirements as the
    single-block kernel minus the VMEM cap.  OPT-IN (``TARL_FUSED_TILED=1``):
    measured at Grid256x256 / 2M agents (the first size past the
    single-block gate), the tiled kernel ran the full random tick at
    4.354 ms vs 4.157 ms for the XLA roll path — at that scale XLA's own
    fusion already amortizes launch overhead over ~1 MB rows, and the
    pre-roll materialization ([3·B, R] written+read per tick) plus the
    kernel I/O round-trip costs more than the fusion saves.  The win of
    the single-block kernel comes from keeping the whole mid-section
    VMEM-resident, which tiling inherently gives up.  Kept as an opt-in
    for irregular future sizes and as the measured record."""
    if os.environ.get("TARL_FUSED_TILED", "0") != "1":
        return False
    if os.environ.get("TARL_FUSED_WINNER", "1") != "1":
        return False
    if os.environ.get("TARL_NO_ROLL", "0") == "1":
        return False  # the kernel IS a roll evaluation (A/B hygiene)
    interpret = os.environ.get("TARL_FUSED_WINNER_INTERPRET", "0") == "1"
    if not interpret and jax.default_backend() != "tpu":
        return False
    if not network.in_roll_shift_t or not network.out_roll_shift_t:
        return False
    kin = network.in_src_tab.shape[0]
    kout = network.out_dst_tab.shape[0]
    return kin <= 8 and kout <= 8


def _tile_winner_kernel(
    rolled_ref, exc_ref, exc_mask_ref, in_sel_ref, in_logit_ref,
    in_src_ref, gumbel_ref, count_ref, cap_ref,
    accept_ref, win_src_ref, agent_ref, dest_ref,
    *, b_in, kin, r, tile, shift_free, shift_sel, free_mask, buffer_i,
):
    from jax.experimental import pallas as pl

    neg_inf = float(-jnp.inf)
    col0 = pl.program_id(0) * tile
    iota = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)

    in_sel = in_sel_ref[...]          # int32 [KIN, T]
    exc_mask = exc_mask_ref[...]      # int32 [KIN, T]
    exc = exc_ref[...]                # int32 [3*KIN, T] overlay values
    rolled = rolled_ref[...]          # int32 [3*B_in, T], rows b*3 + channel

    def gather_ch(c, exc_rows):
        """Channel c of the pre-rolled stack -> [KIN, T] slot rows; entries
        flagged by exc_mask take the overlay rows instead."""
        val = jnp.where(exc_mask != 0, exc_rows, 0)
        for b in range(b_in):
            row = rolled[3 * b + c:3 * b + c + 1]
            val = jnp.where(in_sel == b, row, val)
        return val

    pack_s = gather_ch(0, exc[0:kin])
    id_s = gather_ch(1, exc[kin:2 * kin])
    dest_s = gather_ch(2, exc[2 * kin:3 * kin])

    # Downstream-side ingredients (core.direction:130-133), [1, T].
    count_f = count_ref[...]
    cap = cap_ref[...]
    space_ok = count_f < cap - float(buffer_i)
    v_free = cap - count_f
    v_has_slot = count_f < cap

    # Eligibility + Gumbel-max winner — identical math to _kernel, with the
    # GLOBAL column id in place of the full-row iota.
    dep_ok = (pack_s & 1) > 0
    nonempty = (pack_s & 2) > 0
    stuck = (pack_s & 4) > 0
    u_free = ((pack_s >> shift_free) & free_mask).astype(jnp.float32)
    u_full = u_free <= float(buffer_i)
    wants_v = (pack_s >> shift_sel) == iota
    mask = dep_ok & space_ok & wants_v & nonempty
    mask = mask | (stuck & u_full & (u_free <= v_free) & wants_v
                   & nonempty & v_has_slot)
    score = jnp.where(mask, in_logit_ref[...] + gumbel_ref[...], neg_inf)

    in_src = in_src_ref[...]
    best = jnp.full((1, tile), neg_inf, jnp.float32)
    src = jnp.zeros((1, tile), jnp.int32)
    agent = jnp.zeros((1, tile), jnp.int32)
    dest = jnp.zeros((1, tile), jnp.int32)
    acc = jnp.zeros((1, tile), jnp.bool_)
    for k in range(kin):
        s_k = score[k:k + 1]
        take = s_k > best
        best = jnp.where(take, s_k, best)
        src = jnp.where(take, in_src[k:k + 1], src)
        agent = jnp.where(take, id_s[k:k + 1], agent)
        dest = jnp.where(take, dest_s[k:k + 1], dest)
        acc = acc | take

    agent = jnp.where(acc, agent, 0)
    acc = agent != 0          # sentinel guard (direction_mpnn.py:194)
    dest = jnp.where(acc, dest, 0)
    win_src = jnp.where(acc, src, r)

    accept_ref[...] = acc.astype(jnp.int32)
    win_src_ref[...] = win_src
    agent_ref[...] = agent
    dest_ref[...] = dest


def _tile_confirm_kernel(
    win_rolled_ref, out_sel_ref, out_ok_ref, popped_ref,
    *, b_out, kout, tile,
):
    from jax.experimental import pallas as pl

    col0 = pl.program_id(0) * tile
    iota = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    out_sel = out_sel_ref[...]
    out_ok = out_ok_ref[...]
    rolled = win_rolled_ref[...]      # int32 [B_out, T]
    win_rows = jnp.full(out_sel.shape, -1, jnp.int32)
    for b in range(b_out):
        win_rows = jnp.where(out_sel == b, rolled[b:b + 1], win_rows)
    popped = jnp.zeros((1, tile), jnp.bool_)
    for k in range(kout):
        popped = popped | (
            (out_ok[k:k + 1] != 0) & (win_rows[k:k + 1] == iota)
        )
    popped_ref[...] = popped.astype(jnp.int32)


def direction_confirm_fused_tiled(
    road: RoadState,
    selected_road: jnp.ndarray,
    network: Network,
    time: jnp.ndarray,
    key: jax.Array,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    compute_delta: bool = True,
) -> tuple[RoadState, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Grid-tiled form of :func:`direction_confirm_fused` — bitwise-equal
    outputs, no VMEM size cap.  The roll-plan rotations run OUTSIDE as
    static XLA rolls; everything after is columnwise and tiles freely."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = road.num_roads
    KIN = network.in_src_tab.shape[0]
    KOUT = network.out_dst_tab.shape[0]
    interpret = os.environ.get("TARL_FUSED_WINNER_INTERPRET", "0") == "1"

    (
        mat, head_arrival, head_departure, count_f, cap, gumbel,
        exc_overlay, exc_mask, (shift_free, shift_sel, free_mask),
    ) = _winner_inputs(road, selected_road, network, time, key, physics)

    # Pre-roll the [3, R] channel stack once per in-plan bucket: rolled
    # row (b*3 + c)[v] == mat[c, (v + shift_b) % R] — the same convention
    # as roll_gather / pltpu.roll in the single-block kernel.
    rolled = jnp.concatenate(
        [jnp.roll(mat, -s, axis=1) for s in network.in_roll_shift_t], axis=0
    )  # [3*B_in, R] int32
    b_in = len(network.in_roll_shift_t)
    b_out = len(network.out_roll_shift_t)

    tile = min(_tile_lanes(), max(128, -(-R // 128) * 128))
    grid = (-(-R // tile),)

    def row_spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i))

    out_shape = [jax.ShapeDtypeStruct((1, R), jnp.int32) for _ in range(4)]
    accept_i, win_src, chosen_agent, chosen_dest = pl.pallas_call(
        functools.partial(
            _tile_winner_kernel,
            b_in=b_in, kin=KIN, r=R, tile=tile,
            shift_free=shift_free, shift_sel=shift_sel, free_mask=free_mask,
            buffer_i=int(physics.congestion_buffer),
        ),
        grid=grid,
        in_specs=[
            row_spec(3 * b_in), row_spec(3 * KIN), row_spec(KIN),
            row_spec(KIN), row_spec(KIN), row_spec(KIN), row_spec(KIN),
            row_spec(1), row_spec(1),
        ],
        out_specs=[row_spec(1)] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(
        rolled, exc_overlay, exc_mask, network.in_roll_sel,
        network.in_logit_tab, network.in_src_tab, gumbel,
        count_f[None, :], cap[None, :],
    )
    accept = accept_i[0] > 0
    win_src = win_src[0]
    chosen_agent = chosen_agent[0]
    chosen_dest = chosen_dest[0]

    # Confirm: roll the winner row per out-plan bucket, then one columnwise
    # tiled kernel for the popped test.
    win_rolled = jnp.concatenate(
        [jnp.roll(win_src[None, :], -s, axis=1)
         for s in network.out_roll_shift_t],
        axis=0,
    )  # [B_out, R] int32
    popped_i = pl.pallas_call(
        functools.partial(
            _tile_confirm_kernel, b_out=b_out, kout=KOUT, tile=tile,
        ),
        grid=grid,
        in_specs=[row_spec(b_out), row_spec(KOUT), row_spec(KOUT)],
        out_specs=row_spec(1),
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.int32),
        interpret=interpret,
    )(
        win_rolled, network.out_roll_sel,
        network.out_edge_ok.astype(jnp.int32),
    )
    popped = popped_i[0] > 0

    popped = _patch_out_exceptions(popped, win_src, network, R)
    new_road, road_delta_tt = _winner_epilogue(
        road, network, physics, time, head_arrival, head_departure, count_f,
        accept, chosen_agent, chosen_dest, popped, compute_delta,
    )
    return new_road, road_delta_tt, accept, win_src, popped


# ---------------------------------------------------------------------------
# Per-shard winner kernel (shard_map episodes) — VERDICT r3 #3 residual.
# ---------------------------------------------------------------------------

def fused_shard_winner_ok(network: Network, rl: int) -> bool:
    """Trace-time gate for the per-shard winner kernel inside
    ``parallel.shard_map_episode``: the shard tick's eligibility + Gumbel-max
    winner loop is ~10 vector ops per in-slot at [rl] rows — launch-bound on
    real meshes exactly like the serial mid-section was (575 -> 60 us,
    module docstring).  The roll-plan slot reads stay OUTSIDE as
    ``_block_roll_read`` R-periodic block slices (they need the replicated
    full arrays); the kernel fuses everything downstream of them.
    ``TARL_FUSED_SHARD=0`` opts out (and ``TARL_FUSED_WINNER=0``, the
    documented global fused-winner A/B switch, disables this kernel too);
    ``TARL_FUSED_WINNER_INTERPRET=1`` forces the interpret kernel on CPU
    (the shard equality tests)."""
    if os.environ.get("TARL_FUSED_SHARD", "1") != "1":
        return False
    if os.environ.get("TARL_FUSED_WINNER", "1") == "0":
        return False
    if os.environ.get("TARL_NO_ROLL", "0") == "1":
        return False
    interpret = os.environ.get("TARL_FUSED_WINNER_INTERPRET", "0") == "1"
    if not interpret and jax.default_backend() != "tpu":
        return False
    kin = network.in_src_tab.shape[0]
    if kin > 8:
        return False
    # 7 [KIN, rl] inputs + 3 [1, rl] vectors + 4 [1, rl] outputs, ~3.5x
    # live-intermediate headroom like the single-block gate.
    est = 4 * rl * (7 * kin + 7)
    return est <= _EST_BYTES_MAX


def _shard_winner_kernel(
    pack_ref, id_ref, dst_ref, gum_ref, logit_ref, src_ref, ok_ref,
    count_ref, cap_ref, col_ref,
    accept_ref, win_ref, agent_ref, destv_ref,
    *, kin, r_sentinel, shift_free, shift_sel, free_mask, buf,
):
    """Eligibility + Gumbel-max winner on one road block — op-for-op the
    shard tick's XLA formulation (parallel/shard_map_episode.py core
    section), so outputs are bitwise-equal.  Slot values arrive pre-read
    through the roll plan (pack/head-id/head-dest rows [KIN, rl]); the
    global column ids come in as ``col_ref`` because the shard's block
    offset is a traced value (axis_index), not a grid coordinate."""
    neg_inf = float(-jnp.inf)
    pack_s = pack_ref[...]            # int32 [KIN, rl]
    ids = id_ref[...]
    dsts = dst_ref[...]
    gum = gum_ref[...]                # f32 [KIN, rl]
    logit = logit_ref[...]
    src = src_ref[...]
    ok = ok_ref[...]                  # int32 [KIN, rl]
    count_f = count_ref[...]          # f32 [1, rl]
    cap = cap_ref[...]
    col = col_ref[...]                # int32 [1, rl] global road ids

    space_ok = count_f < cap - buf
    v_free = cap - count_f
    v_slot_ok = count_f < cap

    best = jnp.full(col.shape, neg_inf, jnp.float32)
    win = jnp.zeros(col.shape, jnp.int32)
    agent = jnp.zeros(col.shape, jnp.int32)
    dest = jnp.zeros(col.shape, jnp.int32)
    acc = jnp.zeros(col.shape, jnp.bool_)
    for k in range(kin):
        p_k = pack_s[k:k + 1]
        dep_ok = (p_k & 1) > 0
        nonempty = (p_k & 2) > 0
        stuck = (p_k & 4) > 0
        u_free = ((p_k >> shift_free) & free_mask).astype(jnp.float32)
        u_full = u_free <= buf
        wants_v = (p_k >> shift_sel) == col
        mask = dep_ok & space_ok & wants_v & nonempty
        mask = mask | (stuck & u_full & (u_free <= v_free) & wants_v
                       & nonempty & v_slot_ok)
        mask = mask & (ok[k:k + 1] != 0)
        s_k = jnp.where(mask, logit[k:k + 1] + gum[k:k + 1], neg_inf)
        take = s_k > best
        best = jnp.where(take, s_k, best)
        win = jnp.where(take, src[k:k + 1], win)
        agent = jnp.where(take, ids[k:k + 1], agent)
        dest = jnp.where(take, dsts[k:k + 1], dest)
        acc = acc | take
    win = jnp.where(acc, win, r_sentinel)
    agent = jnp.where(acc, agent, 0)
    acc = agent != 0                  # sentinel guard (direction_mpnn.py:194)
    win = jnp.where(acc, win, r_sentinel)
    dest = jnp.where(acc, dest, 0)

    accept_ref[...] = acc.astype(jnp.int32)
    win_ref[...] = win
    agent_ref[...] = agent
    destv_ref[...] = dest


def fused_shard_winner(
    pack_s, id_s, dest_s, gumbel, logit, src, ok, count_f, cap, col_ids,
    r_sentinel: int, physics: PhysicsConfig, layout,
):
    """Run the per-shard winner kernel on one road block.  Inputs are the
    shard tick's own arrays ([KIN, rl] slot rows + [rl] vectors); returns
    ``(accept bool[rl], win_u int32[rl], chosen int32[rl], dest_v
    int32[rl])`` bitwise-equal to the XLA loop they replace."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = os.environ.get("TARL_FUSED_WINNER_INTERPRET", "0") == "1"
    kin, rl = pack_s.shape
    shift_free, shift_sel, free_mask = layout
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((1, rl), jnp.int32) for _ in range(4)]
    extra = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BYTES)
    )
    acc_i, win, agent, dest = pl.pallas_call(
        functools.partial(
            _shard_winner_kernel,
            kin=kin, r_sentinel=int(r_sentinel),
            shift_free=shift_free, shift_sel=shift_sel, free_mask=free_mask,
            buf=float(physics.congestion_buffer),
        ),
        in_specs=[spec] * 10,
        out_specs=[spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
        **extra,
    )(
        pack_s, id_s, dest_s, gumbel, logit, src,
        ok.astype(jnp.int32), count_f[None, :], cap[None, :],
        col_ids[None, :],
    )
    return acc_i[0] > 0, win[0], agent[0], dest[0]
