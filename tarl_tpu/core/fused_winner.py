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
    Nmax = road.nmax
    KIN = network.in_src_tab.shape[0]
    KOUT = network.out_dst_tab.shape[0]
    interpret = os.environ.get("TARL_FUSED_WINNER_INTERPRET", "0") == "1"

    head_id = road.head_ids()
    head_arrival = road.head_arrival()
    head_departure = road.head_departure()
    head_dest = road.head_dests()
    count = road.count
    count_f = count.astype(jnp.float32)
    cap = network.capacity
    sel = selected_road[:R]

    shift_free, shift_sel, free_mask = upstream_pack_layout(R, Nmax)
    sel_enc = jnp.where((sel >= 0) & (sel < R), sel, R).astype(jnp.int32)
    pack = pack_upstream(
        head_departure, count, cap, sel_enc, time, physics, R, Nmax
    )
    gumbel = jax.random.gumbel(key, (KIN, R), dtype=jnp.float32)

    # In-table exception overlay: one [3·KIN, R] scatter of the current
    # channel values at the (channel, slot, road) exception coordinates.
    # The coordinate/mask arrays are network constants — XLA hoists them
    # out of the episode scan; only the value gather+scatter runs per tick.
    E = int(network.in_roll_exc_src.shape[0])
    if E:
        mat = jnp.stack([pack, head_id, head_dest])  # [3, R] int32
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

    # Out-table exceptions: the few (k, v) entries off the global offsets —
    # road exc_src[e] pops if it won column exc_v[e] (tiny index ops).
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

    # --- update: push at tail (direction_mpnn.py:171-195), pop winners ---
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
        accept,
        win_src,
        popped,
    )
