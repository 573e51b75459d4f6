"""Explicit shard_map episode with halo exchange over the road dimension.

SURVEY.md §2.10 names the TPU-native equivalent of the reference's (absent)
distributed story: "the MPNN segment ops become edge-sharded kernels with
halo exchange over ICI".  :mod:`tarl_tpu.parallel.sharded_episode` realises
it via GSPMD auto-partitioning (placement-only); this module is the explicit
`shard_map` formulation, where every collective is written out and therefore
pinned:

* the mesh is one axis ``"shard"``; shard ``i`` owns the contiguous road
  block ``[i*R/S, (i+1)*R/S)`` — RoadState rows, the ``[H, R]`` metric
  columns, and every turn edge whose DOWNSTREAM road is in the block
  (the slot-major tables network.in_src_tab etc. are column-sliced to the
  block; edges are what need the halo: their upstream may live anywhere);
* agents and routing scratch are replicated; agent-side writes (insert's
  ON_WAY, withdraw's DONE/arrival) are disjoint across shards and merged
  with ``psum`` — an agent sits on exactly one road;
* per tick, the halo is TWO ``all_gather``s of the per-road head summary
  (id / arrival / departure / count; a few scalars per road, so a full
  gather beats neighbor exchange on the irregular dual-graph partition):
  one pre-insert (capacity/slot math), one post-withdraw (eligibility
  masks), plus ONE ``all_gather`` of the per-road transfer winners (the
  response phase: the winning upstream's shard must pop its head) and
  ``psum``s for the agent merge and the tick scalars;
* sampling stays BITWISE-equal to the unsharded ``core.step.tick``: the
  slot-major [KIN, R] Gumbel matrix is generated replicated from the same
  key and column-sliced to the block, with the same ascending-slot
  tie-break as ``core.direction``.

Supported policies: ``random_choice`` (reads no road state, so its
replicated recomputation is exact), learned policies from
``rl.learned_policy.make_learned_choice`` — edge-row-independent nets run
their forward on the local slot columns only; attention nets (GTConv) run
the slot-twin trunk with a per-layer all_gather node halo
(models/transformer/slot_forward.py) — and the shortest-path policy in BOTH
table backends — the dense dual [N, N] form (``Policy.needs_next_hop``)
and the O(I^2) primal form (``Policy.table_init``, for large networks):
either refresh and its per-road next-hop selection run REPLICATED on every
shard from the halo-gathered counts/head ids — the table is routing
scratch, not simulation state, and recomputing it everywhere is cheaper
than sharding it.  The direction/response pair uses the fused win-pop
formulation proven equivalent in ``core.fused_core``.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import (
    PhysicsConfig,
    RoutingConfig,
    SimConfig,
    DEFAULT_PHYSICS,
    DEFAULT_ROUTING,
    DEFAULT_SIM,
)
from ..network import Network
from ..state import MetricState, SimState, TickLog

AXIS = "shard"


def _block_roll_read(mat, shift, sel_blk, exc_blk, block0, rl: int, R: int):
    """Roll-plan evaluation of ``mat[:, tab[k, v]]`` for the LOCAL column
    block ``v in [block0, block0 + rl)`` (core.roll_gather.roll_gather's
    per-shard form).

    The plan's offsets are global mod R, so each bucket's read is one
    R-periodic dynamic slice of the doubled replicated source at
    ``(block0 + shift_b) % R`` — index-free and shared across slots —
    followed by per-slot selects; exceptions come from ``exc_blk``, the
    caller's block slice of the replicated ``[K, C, Rp]`` exception overlay
    (one small scatter per tick).  Bitwise-identical to the per-slot
    ``mat[:, u_k]`` gathers it replaces (the ops XLA's serial ~7 ns/index
    emitter makes tick-dominating at metro scale).

    ``mat``: [C, R] replicated; ``sel_blk``: [K, rl]; returns [K, C, rl].
    """
    B = int(shift.shape[0])
    mat2 = jnp.concatenate([mat, mat], axis=1)          # [C, 2R]
    out = exc_blk
    C = mat.shape[0]
    for b in range(B):
        start = (block0 + shift[b]) % R
        rolled = jax.lax.dynamic_slice(mat2, (0, start), (C, rl))
        out = jnp.where((sel_blk == b)[:, None, :], rolled[None], out)
    return out


# Compiled-episode cache: tracing + lowering the ~700-op tick body through
# shard_map costs ~1.1 s of HOST time per call (measured: an empty "shell"
# body still showed a flat 2.25 ms/tick floor at 510 ticks — pure retrace,
# scripts/ablate_shard_phases.py).  jax caches compiled programs PER JIT
# OBJECT, and this module used to build a fresh closure + jax.jit every
# call.  Keyed on everything trace-relevant; strong refs keep ids stable;
# LRU-capped.
_EPISODE_JIT_CACHE: "dict[tuple, tuple]" = {}
_EPISODE_JIT_CAP = 16
_RECONSTRUCT_JIT = None


def _episode_cache_get(key):
    hit = _EPISODE_JIT_CACHE.pop(key, None)
    if hit is not None:
        _EPISODE_JIT_CACHE[key] = hit  # move to MRU
        return hit[0]
    return None


def _episode_cache_put(key, fn, refs):
    _EPISODE_JIT_CACHE[key] = (fn, refs)
    while len(_EPISODE_JIT_CACHE) > _EPISODE_JIT_CAP:
        _EPISODE_JIT_CACHE.pop(next(iter(_EPISODE_JIT_CACHE)))


def make_road_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (AXIS,))


def run_episode_shard_map(
    state: SimState,
    network: Network,
    policy,
    num_steps: int,
    mesh: Mesh,
    sim: SimConfig = DEFAULT_SIM,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    routing: RoutingConfig = DEFAULT_ROUTING,
) -> tuple[SimState, TickLog]:
    """Drop-in for ``core.step.run_episode`` on a 1-axis mesh.

    ``policy`` must be the random policy or the shortest-path policy (see
    module docstring; pass the same ``routing`` config the policy was built
    with).  Scalars in the returned TickLog match the unsharded run
    bitwise; road-indexed outputs come back in global order.
    """
    from ..routing.policies import random_choice

    primal = policy.table_init is not None
    shortest = policy.needs_next_hop or primal
    learned = policy.learned  # LearnedSpec of a trained neural policy
    assert shortest or learned is not None or policy.choice is random_choice, (
        "shard_map episode supports the random, shortest-path and learned "
        "(make_learned_choice) policies"
    )
    strict = routing.strict_compat
    if strict:
        assert not primal and policy.needs_next_hop, (
            "strict_compat under shard_map requires the dual backend policy"
        )
    primal_dests = None
    if primal:
        # Either the ALL-PAIRS primal buffer (dist[I, I] ++ cost[R] ++
        # next_road[I, I]) or the dest-restricted dist[I, D] form from
        # make_primal_dest_parts (its table_init carries the destination
        # list); the replicated refresh/lookup below mirror whichever the
        # policy was built with.
        from ..routing.policies import primal_buf_size

        i_n = network.num_intersections
        dest_np = getattr(policy.table_init, "dest_list", None)
        if dest_np is not None:
            primal_dests = jnp.asarray(dest_np, jnp.int32)
            d_n = int(dest_np.shape[0])
            _dcol_np = np.zeros((i_n,), np.int32)
            _dcol_np[np.asarray(dest_np)] = np.arange(d_n, dtype=np.int32)
            primal_dcol = jnp.asarray(_dcol_np)
            # Zoned layout (make_primal_dest_parts.pack_z): dist ++ cost ++
            # next_road ++ f32-bitcast(k_tab[R, Dp] int8), Dp = round4(D).
            from ..routing.policies import _round4 as _r4

            d_p = _r4(d_n)
            expect = 2 * i_n * d_n + network.num_roads * (1 + d_p // 4)
        else:
            d_n = i_n
            expect = primal_buf_size(i_n, d_n, network.num_roads)
        assert state.next_hop.size == expect, (
            f"shard_map primal routing: buffer size {state.next_hop.size} "
            f"does not match the policy's layout (expected {expect})"
        )

        def _unpack_z(buf):
            R_ = network.num_roads
            dist = buf[: i_n * d_n].reshape(i_n, d_n)
            cost = buf[i_n * d_n: i_n * d_n + R_]
            road_t = buf[i_n * d_n + R_: 2 * i_n * d_n + R_].reshape(
                i_n, d_n
            )
            kblk = buf[2 * i_n * d_n + R_:]  # packed int8 k-table (unused)
            return dist, cost, road_t, kblk
    S = mesh.devices.size
    R = network.num_roads
    A = state.agents.num_agents

    # Exact (backlog) insert under shard_map (VERDICT r4 #4): the per-SRC
    # queue state is tiny and its append phase reads NO road state, so it
    # runs REPLICATED verbatim (core.insert.backlog_frontier_append — the
    # same code as the serial path); the drain's take computation needs only
    # the halo-gathered global counts (replicated too), and each shard
    # applies the FIFO writes for queue targets inside its road block.
    # Bitwise-equal to the serial backlog run by construction and by
    # tests/test_shard_backlog.py.
    use_backlog = state.backlog is not None and sim.insert_backlog is not None
    if use_backlog:
        assert sim.sorted_population, "insert_backlog requires sorted_population"
        assert not primal and not (shortest and not strict), (
            "insert_backlog needs the selected_road[origin] entry rule "
            "(random / strict_compat / learned policies)"
        )
        import os as _os

        backlog_pop = int(_os.environ.get("TARL_BACKLOG_POP", "4"))
        # Packed [A, 3] static agent rows, closed over as a scan constant
        # (the agent columns it reads never change during the episode).
        backlog_static_tab = jnp.stack(
            [
                state.agents.departure,
                state.agents.origin.astype(jnp.float32),
                state.agents.dest.astype(jnp.float32),
            ],
            axis=1,
        )
    # Real networks rarely have device-divisible road counts: pad the road
    # axis to the shard multiple with INERT rows — zero capacity (nothing
    # can insert or transfer in: space_ok and v_slot_ok are both false),
    # no in-edges (ok False), sentinel road_dest (-1 never matches a ring
    # destination, so nothing withdraws), empty rings.  Padded rows are
    # therefore never read or written by the physics, and the returned
    # state/logs are sliced back to the real R — bitwise-equal to the
    # unsharded run (the per-tick Gumbel matrices stay [_, R] and are
    # zero-padded, so the draws are unchanged).
    Rp = ((R + S - 1) // S) * S
    pad = Rp - R
    rl = Rp // S
    nmax = state.road.nmax
    KIN = network.in_src_tab.shape[0]

    cap = network.capacity
    ff = network.free_flow
    cc = network.congestion_constant

    def _pad1(x, value):
        return x if pad == 0 else jnp.concatenate(
            [x, jnp.full((pad,), value, x.dtype)]
        )

    def _padcols(x, value):
        return x if pad == 0 or x.size == 0 else jnp.concatenate(
            [x, jnp.full((x.shape[0], pad), value, x.dtype)], axis=1
        )

    def _padrows(x, value):
        return x if pad == 0 else jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], value, x.dtype)]
        )

    capp = _pad1(cap, 0.0)
    ffp = _pad1(ff, 1.0)
    ccp = _pad1(cc, 1.0)
    road_dest_p = _pad1(network.road_dest, -1)
    road_to_p = _pad1(network.road_to, 0)
    in_src_p = _padcols(network.in_src_tab, 0)
    in_ok_p = _padcols(network.in_edge_ok, False)
    in_logit_p = _padcols(network.in_logit_tab, 0.0)

    # r3 fast paths on the shard (VERDICT r3 #3): when the network carries
    # roll plans and the size clears the same gate as the serial core, the
    # per-slot pack/head gathers and the confirm pop scatter are evaluated
    # as per-bucket block slices of the replicated full arrays
    # (_block_roll_read) — each shard runs the same roll formulation the
    # single chip does, bitwise-identical values.
    from ..core import roll_gather as _rg

    use_roll_in = _rg.roll_enabled(
        getattr(network, "in_roll_shift", None)
    ) and R >= _rg.MIN_ROADS
    use_roll_out = _rg.roll_enabled(
        getattr(network, "out_roll_shift", None)
    ) and R >= _rg.MIN_ROADS
    if use_roll_in:
        in_sel_p = _padcols(network.in_roll_sel, 0)
    # Per-shard fused winner kernel (the serial fused_winner's residual,
    # VERDICT r3 #3): the eligibility + Gumbel-max loop below is ~10 vector
    # ops per in-slot at [rl] rows — launch-bound on real meshes.  When the
    # roll plan is active the slot reads are already block slices, so the
    # whole remainder fuses into one Pallas kernel per shard per tick,
    # bitwise-equal by construction (core.fused_winner._shard_winner_kernel).
    from ..core.fused_winner import fused_shard_winner, fused_shard_winner_ok

    use_fused_winner = use_roll_in and fused_shard_winner_ok(network, rl)
    if use_roll_out:
        out_sel_p = _padcols(network.out_roll_sel, 0)
        out_ok_p = _padcols(network.out_edge_ok, False)
        KOUT = network.out_dst_tab.shape[0]

    if primal:
        from ..routing.policies import _maybe_delta_buckets

        _pb_shifts, _pb_slot, _pb_perm, _pb_inv = _maybe_delta_buckets(network)

    if learned is not None:
        # Slot-major out-edge tables for the edge-sharded policy forward
        # (rl.learned_policy).  Shard i owns the edge groups whose SOURCE
        # road is in its block; the small SRC/DEST-node groups (entry-edge
        # logits) are recomputed replicated, like the routing refreshes.
        # Attention nets (spec.slot_net, models.transformer.slot_forward)
        # reuse the spec's own out tables so slot layouts cannot diverge.
        attention_net = learned.slot_net is not None
        if attention_net:
            lp_ok = learned.slot_tables.out_ok
            lp_dst = learned.slot_tables.out_dst
        else:
            from ..rl.learned_policy import full_out_tables

            lp_ok, lp_dst, lp_attr = full_out_tables(network)
        KF = int(lp_ok.shape[0])
        N = network.num_nodes
        # Padded ROAD-column views for block slicing (the virtual columns
        # R..N are always handled replicated from the original tables).
        lp_ok_p = _padcols(lp_ok[:, :R], False)
        lp_dst_p = _padcols(lp_dst[:, :R], 0)

    road_spec = SimState(
        road=jax.tree.map(lambda _: P(AXIS), state.road),
        agents=jax.tree.map(lambda _: P(), state.agents),
        selected_road=P(),
        time=P(),
        key=P(),
        metrics=MetricState(
            hourly_counts=P(None, AXIS),
            on_way_before=P(),
            done_before=P(),
            delta_tt_hourly=P(None, AXIS),
        ),
        next_hop=P(),
        choice_count=P(),
        insert_order=P(),
        insert_ptr=P(),
        backlog=None if state.backlog is None else jax.tree.map(
            lambda _: P(), state.backlog
        ),
        # Incremental-lookup scratch rides replicated and untouched (the
        # shard tick does its own replicated lookups); None when absent.
        sel_dest=None if state.sel_dest is None else P(),
    )
    log_spec = TickLog(departures=P(), arrivals=P(), on_way=P(), time=P(),
                       road_delta_tt=P(), window_saturated=P())

    # Diagnostic ONLY (scripts/ablate_shard_phases.py): trace-time phase
    # skip list; unset in production, every skip breaks physics.
    _skip = frozenset(
        s for s in os.environ.get("TARL_SHARD_SKIP", "").split(",") if s
    )

    def _halo_road_costs(count_g):
        """Per-road refresh costs from halo counts, honoring
        routing.cost_mode exactly like bellman_ford.road_costs /
        marginal_road_costs (so an --algo so policy stays bitwise-equal
        under shard_map).  Returns real-[R] costs (padded rows sliced)."""
        count_f = count_g[:R].astype(jnp.float32)
        denom = cap + physics.congestion_softening - count_f
        tc = cc / denom
        cost = jnp.maximum(ff, tc)
        if routing.cost_mode == "marginal":
            ext = jnp.where(tc > ff, count_f * cc / (denom * denom), 0.0)
            cost = cost + ext
        return cost

    def halo(road_local):
        """All-gather the per-road head summary (the halo exchange)."""
        if "halo" in _skip:
            z_i = jnp.zeros((Rp,), jnp.int32)
            z_f = jnp.zeros((Rp,), jnp.float32)
            return z_i, z_f, z_f, z_i, z_i, z_i
        count = road_local.count
        nonempty = count > 0
        local = jnp.stack(
            [
                road_local.head_ids().astype(jnp.float32),
                road_local.head_arrival(),
                road_local.head_departure(),
                count.astype(jnp.float32),
                road_local.head.astype(jnp.float32),
                road_local.head_dests().astype(jnp.float32),
            ],
            axis=1,
        )  # [rl, 6]
        g = jax.lax.all_gather(local, AXIS, tiled=True)  # [R, 6]
        return (g[:, 0].astype(jnp.int32), g[:, 1], g[:, 2],
                g[:, 3].astype(jnp.int32), g[:, 4].astype(jnp.int32),
                g[:, 5].astype(jnp.int32))

    def tick_local(st: SimState):
        """One tick on this shard's road block (runs under shard_map)."""
        idx = jax.lax.axis_index(AXIS)
        block0 = idx * rl
        rows_local = jnp.arange(rl, dtype=jnp.int32)
        t = st.time
        road = st.road
        agents = st.agents

        # ---- insert (replicated candidate math, local scatter) ----------
        _, _, _, count_g, head_g, _ = halo(road)
        overflow = jnp.zeros((), jnp.float32)
        if "insert" in _skip:
            pass
        elif use_backlog:
            # Exact per-SRC queue insert: appends replicated (the SAME code
            # as the serial path), drains replicated from halo counts with
            # the FIFO writes masked to this shard's block.
            from ..core.insert import backlog_frontier_append

            qpack, qcount, new_ptr, overflow = backlog_frontier_append(
                st.backlog.qpack, st.backlog.qcount, st.backlog.qhead,
                backlog_static_tab, st.insert_ptr, t, R=R,
                window=sim.insert_window, escalate=sim.insert_escalate,
            )
            n_src, Qd, _ = st.backlog.qpack.shape
            # SRC nodes at R, R+2, ..., R+2S-2: strided slice, not a gather.
            g_bid = jax.lax.slice(
                st.selected_road, (R,), (R + 2 * n_src,), (2,)
            )
            gvalid = (g_bid >= 0) & (g_bid < R)
            g_safe = jnp.where(gvalid, g_bid, 0)
            # r5 consolidation, mirroring core.insert.insert_agents_
            # backlogged: ONE packed head/count gather + one static row
            # gather for the loop-invariant reads, a LOCAL cnt_s vector
            # instead of the per-pass count re-gather (drained rows are
            # distinct: a road is only bid by its tail SRC), the count
            # update hoisted out of the loop, and compacted FIFO scatters
            # at n_src*P >= 4096 (bitwise either way).
            from ..core.insert import _resolve_compact as _rc

            drain_compact = _rc(sim.insert_compact, n_src * backlog_pop)
            hc_g = (head_g * (nmax + 1) + count_g)[g_safe]
            head_gq = hc_g // (nmax + 1)                # static during insert
            c0_s = hc_g % (nmax + 1)                    # tick-start count
            cap_s = cap[g_safe]
            c0_f = c0_s.astype(jnp.float32)
            tt_g = jnp.maximum(
                ff[g_safe],
                cc[g_safe] / (
                    cap_s + physics.congestion_softening - c0_f
                ),
            )
            dep_stamp_g = t + tt_g                      # [n_src]
            pcol = jnp.arange(backlog_pop, dtype=jnp.int32)[None, :]
            buf = physics.congestion_buffer
            rem_cap = (cap_s - buf).astype(jnp.int32)
            r_loc_s = g_safe - block0
            in_blk_s = (r_loc_s >= 0) & (r_loc_s < rl)
            P_ = backlog_pop

            def drain_cond(c):
                fids, farr, fdep, fdst, cnt_s, qhead, qc = c
                return jnp.any(gvalid & (qc > 0) & (rem_cap > cnt_s))

            def drain_body(c):
                fids, farr, fdep, fdst, cnt_s, qhead, qc = c
                rem = rem_cap - cnt_s
                take = jnp.clip(jnp.minimum(qc, rem), 0, P_)
                take = jnp.where(gvalid, take, 0)
                phys = (qhead[:, None] + pcol) % Qd
                pk = jnp.take_along_axis(qpack, phys[:, :, None], axis=1)
                ids_p = pk[..., 0].reshape(-1)
                dst_p = pk[..., 1].reshape(-1)
                active = (
                    (pcol < take[:, None]) & in_blk_s[:, None]
                ).reshape(-1)
                slot = (
                    (head_gq[:, None] + cnt_s[:, None] + pcol) % nmax
                ).reshape(-1)
                rows = jnp.where(
                    active,
                    jnp.broadcast_to(
                        r_loc_s[:, None], (n_src, P_)
                    ).reshape(-1),
                    rl,
                )  # rl -> dropped (other shards' roads)
                dep_p = jnp.broadcast_to(
                    dep_stamp_g[:, None], (n_src, P_)
                ).reshape(-1)

                def _w(rws, slt, ids_v, dst_v, dep_v, c4):
                    fids, farr, fdep, fdst = c4
                    fids = fids.at[rws, slt].set(ids_v, mode="drop")
                    farr = farr.at[rws, slt].set(
                        jnp.broadcast_to(t, ids_v.shape), mode="drop"
                    )
                    fdep = fdep.at[rws, slt].set(dep_v, mode="drop")
                    fdst = fdst.at[rws, slt].set(dst_v, mode="drop")
                    return fids, farr, fdep, fdst

                c4 = (fids, farr, fdep, fdst)
                if drain_compact is not None and \
                        0 < drain_compact < n_src * P_:
                    flags = active.astype(jnp.int32)
                    topf, topi = jax.lax.top_k(flags, drain_compact)
                    selm = topf > 0
                    c_rows = jnp.where(selm, rows[topi], rl)
                    fids, farr, fdep, fdst = jax.lax.cond(
                        jnp.sum(flags) <= drain_compact,
                        lambda c4: _w(c_rows, slot[topi], ids_p[topi],
                                      dst_p[topi], dep_p[topi], c4),
                        lambda c4: _w(rows, slot, ids_p, dst_p, dep_p, c4),
                        c4,
                    )
                else:
                    fids, farr, fdep, fdst = _w(
                        rows, slot, ids_p, dst_p, dep_p, c4
                    )
                cnt_s = cnt_s + take
                qhead = (qhead + take) % Qd
                qc = qc - take
                return fids, farr, fdep, fdst, cnt_s, qhead, qc

            fids, farr, fdep, fdst, cnt_end, qhead2, qcount2 = (
                jax.lax.while_loop(
                    drain_cond, drain_body,
                    (road.fifo_ids, road.fifo_arrival, road.fifo_departure,
                     road.fifo_dest, c0_s, st.backlog.qhead, qcount),
                )
            )
            total_take = cnt_end - c0_s
            # Local count update: add each SRC's take total to its road's
            # block row (replicated math, block-masked scatter).
            count_new = road.count.at[
                jnp.where(in_blk_s & (total_take > 0), r_loc_s, rl)
            ].add(total_take, mode="drop")
            road = road._replace(
                fifo_ids=fids, fifo_arrival=farr, fifo_departure=fdep,
                fifo_dest=fdst, count=count_new,
            )
            st = st._replace(
                backlog=st.backlog._replace(
                    qpack=qpack, qhead=qhead2, qcount=qcount2
                ),
                insert_ptr=new_ptr,
            )
            # inserted is maintained LAZILY, exactly like the serial backlog
            # tick: nothing below reads it, and the driver reconstructs it
            # once after the scan (core.insert.reconstruct_inserted).
        elif sim.insert_window is not None:
            # Windowed insert (r5): the serial tick has been windowed since
            # r1 (core.insert.insert_agents_windowed) but the shard tick
            # still re-scanned the WHOLE population every tick — an
            # O(A log A) argsort plus five [A]-index scatters that measured
            # 16-50 ms/tick at 50k-200k agents (scripts/diagnose_shard.py).
            # Same structure as the serial path: candidate math REPLICATED
            # on the [W] window over halo counts, FIFO writes masked to
            # this shard's block, escalation passes under a while_loop with
            # the tick-start stamp snapshot.  Bitwise-equal to the serial
            # windowed/escalating insert (tests/test_shard_windowed.py).
            W = min(sim.insert_window, A)
            sorted_fast = sim.sorted_population
            if sorted_fast:
                W = min(W, A - 1)
                limit = A - 1 - W
            else:
                limit = A - W
            pos_w = jnp.arange(W, dtype=jnp.int32)
            count0_rep = count_g          # [Rp] tick-start stamp snapshot
            buf_c = physics.congestion_buffer

            def _entry_roads(origin_v, dest_v):
                """Replicated per-candidate entry roads (the same policy
                dispatch as the whole-population branch below)."""
                if primal and primal_dests is not None:
                    from ..routing.policies import _dest_inter, _road_lookup

                    from_i = jnp.clip(
                        (origin_v - R) // 2, 0,
                        network.num_intersections - 1,
                    )
                    _, _, road_tab, _ = _unpack_z(st.next_hop)
                    dcol_a = primal_dcol[_dest_inter(network, dest_v)]
                    return _road_lookup(road_tab, from_i, dcol_a)
                if primal:
                    from ..routing.policies import (
                        _dest_inter,
                        _primal_argmin_road,
                    )

                    from_i = jnp.clip(
                        (origin_v - R) // 2, 0,
                        network.num_intersections - 1,
                    )
                    return _primal_argmin_road(
                        st.next_hop, network, from_i,
                        _dest_inter(network, dest_v),
                    )
                if shortest and not strict:
                    return st.next_hop[origin_v, dest_v]
                return st.selected_road[origin_v]

            def _one_pass(fids, farr, fdep, fdst, count_rep, inserted_cur,
                          off, stamp):
                start = jnp.minimum(off, limit).astype(jnp.int32)
                if sorted_fast:
                    lo = start + 1
                    win_ids = lo + pos_w
                    win_dep = jax.lax.dynamic_slice_in_dim(
                        agents.departure, lo, W
                    )
                    win_origin = jax.lax.dynamic_slice_in_dim(
                        agents.origin, lo, W
                    )
                    win_dest = jax.lax.dynamic_slice_in_dim(
                        agents.dest, lo, W
                    )
                    win_ins = jax.lax.dynamic_slice_in_dim(
                        inserted_cur, lo, W
                    )
                else:
                    win_ids = jax.lax.dynamic_slice_in_dim(
                        st.insert_order, start, W
                    ).astype(jnp.int32)
                    win_dep = agents.departure[win_ids]
                    win_origin = agents.origin[win_ids]
                    win_dest = agents.dest[win_ids]
                    win_ins = inserted_cur[win_ids]

                ready_w = (win_dep <= t) & (~win_ins)
                entry = _entry_roads(win_origin, win_dest)
                valid_w = (entry >= 0) & (entry < R)
                road_key = jnp.where(
                    ready_w & valid_w, entry, R
                ).astype(jnp.int32)

                same = road_key[None, :] == road_key[:, None]
                earlier = pos_w[None, :] < pos_w[:, None]
                rank = jnp.sum(same & earlier, axis=1).astype(jnp.int32)
                safe = jnp.minimum(road_key, R - 1)
                cb = count_rep[safe]
                remaining = (
                    capp[safe] - buf_c - cb.astype(jnp.float32)
                ).astype(jnp.int32)
                ok = (road_key < R) & (rank < remaining) & (remaining > 0)
                slot = (head_g[safe] + cb + rank) % nmax
                stamp_c = cb if stamp is None else stamp[safe]
                tc_w = ccp[safe] / (
                    capp[safe] + physics.congestion_softening
                    - stamp_c.astype(jnp.float32)
                )
                tt_w = jnp.maximum(ffp[safe], tc_w)

                r_loc = road_key - block0
                ok_loc = ok & (r_loc >= 0) & (r_loc < rl)
                rows = jnp.where(ok_loc, r_loc, rl)
                fids = fids.at[rows, slot].set(win_ids, mode="drop")
                farr = farr.at[rows, slot].set(
                    jnp.broadcast_to(t, (W,)), mode="drop"
                )
                fdep = fdep.at[rows, slot].set(t + tt_w, mode="drop")
                fdst = fdst.at[rows, slot].set(win_dest, mode="drop")
                count_rep = count_rep.at[
                    jnp.where(ok, road_key, Rp)
                ].add(1, mode="drop")

                if sorted_fast:
                    inserted_cur = jax.lax.dynamic_update_slice_in_dim(
                        inserted_cur, win_ins | ok, lo, axis=0
                    )
                else:
                    stage = jnp.zeros((A,), jnp.int32).at[
                        jnp.where(ok, win_ids, A)
                    ].set(1, mode="drop")
                    inserted_cur = inserted_cur | (stage > 0)

                settled = win_ins | ok
                sat = win_dep[W - 1] <= t
                return (fids, farr, fdep, fdst, count_rep, inserted_cur,
                        settled, sat, start)

            (fids, farr, fdep, fdst, count_rep, inserted_cur, settled0,
             sat0, start0) = _one_pass(
                road.fifo_ids, road.fifo_arrival, road.fifo_departure,
                road.fifo_dest, count_g, agents.inserted,
                st.insert_ptr.astype(jnp.int32), None,
            )
            adv0 = jnp.min(jnp.where(settled0, W, pos_w))

            if not sim.insert_escalate:
                new_ptr = jnp.minimum(start0 + adv0, A).astype(jnp.int32)
                overflow = sat0.astype(jnp.float32)
            else:
                def icond(c):
                    return c[7] & (c[8] < limit)

                def ibody(c):
                    (fids, farr, fdep, fdst, count_rep, inserted_cur,
                     _settled, _sat, start_prev, adv, adv_open, extra) = c
                    off = start_prev + W
                    (fids, farr, fdep, fdst, count_rep, inserted_cur,
                     settled, sat, start) = _one_pass(
                        fids, farr, fdep, fdst, count_rep, inserted_cur,
                        off, count0_rep,
                    )
                    adv_k = jnp.min(jnp.where(settled, W, pos_w))
                    contiguous = start == off
                    adv = jnp.where(adv_open & contiguous, adv + adv_k, adv)
                    adv_open = adv_open & contiguous & (adv_k == W)
                    return (fids, farr, fdep, fdst, count_rep, inserted_cur,
                            settled, sat, start, adv, adv_open, extra + 1.0)

                (fids, farr, fdep, fdst, count_rep, inserted_cur, _s, _sat,
                 _start, adv, _open, extra) = jax.lax.while_loop(
                    icond, ibody,
                    (fids, farr, fdep, fdst, count_rep, inserted_cur,
                     settled0, sat0, start0, adv0, adv0 == W,
                     jnp.zeros((), jnp.float32)),
                )
                new_ptr = jnp.minimum(start0 + adv, A).astype(jnp.int32)
                overflow = extra

            road = road._replace(
                fifo_ids=fids, fifo_arrival=farr, fifo_departure=fdep,
                fifo_dest=fdst,
                count=jax.lax.dynamic_slice_in_dim(count_rep, block0, rl),
            )
            agents = agents._replace(inserted=inserted_cur)
            st = st._replace(insert_ptr=new_ptr)
        elif not use_backlog:
            ready = (agents.departure <= t) & (~agents.on_way) & (~agents.done)
            if primal and primal_dests is not None:
                # Dest-restricted entry lookup (make_primal_dest_parts.
                # entry_lookup, replicated): dist[I, D] columns by dest index.
                from ..routing.policies import _dest_inter, _road_lookup

                from_i = jnp.clip(
                    (agents.origin - R) // 2, 0, network.num_intersections - 1
                )
                _, _, road_tab, _ = _unpack_z(st.next_hop)
                dcol_a = primal_dcol[_dest_inter(network, agents.dest)]
                entry = _road_lookup(road_tab, from_i, dcol_a)
            elif primal:
                # Per-agent entry roads from the primal scratch (replicated;
                # primal_entry_lookup equivalent).
                from ..routing.policies import _dest_inter, _primal_argmin_road

                from_i = jnp.clip(
                    (agents.origin - R) // 2, 0, network.num_intersections - 1
                )
                entry = _primal_argmin_road(  # one element gather per agent
                    st.next_hop, network, from_i, _dest_inter(network, agents.dest)
                )
            elif shortest and not strict:
                # Per-agent entry roads (shortest_path_entry, replicated).
                entry = st.next_hop[agents.origin, agents.dest]
            else:
                # Random policy — and strict_compat, whose entrants follow the
                # origin SRC node's SELECTED_ROAD (the dummy-driven reference
                # rule, base.py:573-579).
                entry = st.selected_road[agents.origin]
            valid = (entry >= 0) & (entry < R)
            road_key = jnp.where(ready & valid, entry, R).astype(jnp.int32)
            order = jnp.argsort(road_key, stable=True)
            road_sorted = road_key[order]
            agent_sorted = jnp.arange(A, dtype=jnp.int32)[order]
            pos = jnp.arange(A, dtype=jnp.int32)
            is_start = jnp.concatenate(
                [jnp.ones((1,), bool), road_sorted[1:] != road_sorted[:-1]]
            )
            group_start = jax.lax.associative_scan(
                jnp.maximum, jnp.where(is_start, pos, 0)
            )
            rank = pos - group_start
            safe = jnp.minimum(road_sorted, R - 1)
            count_before = count_g[safe]
            remaining = (
                cap[safe] - physics.congestion_buffer
                - count_before.astype(jnp.float32)
            ).astype(jnp.int32)
            ok = (road_sorted < R) & (rank < remaining) & (remaining > 0)
            slot = (head_g[safe] + count_before + rank) % nmax
            tc = cc[safe] / (
                cap[safe] + physics.congestion_softening
                - count_before.astype(jnp.float32)
            )
            tt_ins = jnp.maximum(ff[safe], tc)
            # local apply: rows in [block0, block0+rl)
            r_loc = road_sorted - block0
            ok_loc = ok & (r_loc >= 0) & (r_loc < rl)
            rows = jnp.where(ok_loc, r_loc, rl)  # rl -> dropped
            fifo_ids = road.fifo_ids.at[rows, slot].set(agent_sorted, mode="drop")
            fifo_arr = road.fifo_arrival.at[rows, slot].set(
                jnp.broadcast_to(t, (A,)), mode="drop"
            )
            fifo_dep = road.fifo_departure.at[rows, slot].set(
                t + tt_ins, mode="drop"
            )
            fifo_dst = road.fifo_dest.at[rows, slot].set(
                agents.dest[agent_sorted], mode="drop"
            )
            count_add = jax.ops.segment_sum(
                ok_loc.astype(jnp.int32), rows, num_segments=rl + 1
            )[:rl]
            road = road._replace(
                fifo_ids=fifo_ids, fifo_arrival=fifo_arr, fifo_departure=fifo_dep,
                fifo_dest=fifo_dst,
                count=road.count + count_add,
            )
            # agent merge (disjoint across shards)
            ins_ids = jnp.where(ok_loc, agent_sorted, A)
            ins_delta = jnp.zeros((A,), jnp.int32).at[ins_ids].set(1, mode="drop")
            ins_delta = jax.lax.psum(ins_delta, AXIS)
            agents = agents._replace(inserted=agents.inserted | (ins_delta > 0))

        # ---- withdraw (local roads, psum agent merge; same hybrid slot
        # formulation as core.withdraw) ------------------------------------
        if "withdraw" in _skip:
            wcount = jnp.zeros((rl,), jnp.int32)
        else:
            from ..core.withdraw import _SLOT_UNROLL_MAX

            K = nmax if sim.withdraw_depth is None else min(sim.withdraw_depth, nmax)
            road_dest_local = jax.lax.dynamic_slice_in_dim(
                road_dest_p, block0, rl
            )

            def _wscan(head, count):
                if K <= _SLOT_UNROLL_MAX:
                    colw = jnp.arange(nmax, dtype=jnp.int32)[None, :]
                    lpw = (colw - head[:, None]) % nmax
                    run = jnp.ones((rl,), bool)
                    wid_rows = []
                    for k in range(K):
                        at_k = lpw == k
                        ids_k = jnp.where(at_k, road.fifo_ids, 0).sum(axis=1)
                        dep_k = jnp.where(
                            at_k, road.fifo_departure, 0.0
                        ).sum(axis=1)
                        dest_k = jnp.where(at_k, road.fifo_dest, 0).sum(axis=1)
                        eligible = (
                            (dest_k == road_dest_local)
                            & (dep_k <= t)
                            & (k < count)
                        )
                        run = run & eligible
                        wid_rows.append(jnp.where(run, ids_k, A))
                    wcount = sum(r < A for r in wid_rows).astype(jnp.int32)
                    wids = jnp.concatenate(wid_rows)
                else:
                    logical = jnp.arange(K, dtype=jnp.int32)
                    phys = (head[:, None] + logical[None, :]) % nmax
                    w_ids = jnp.take_along_axis(road.fifo_ids, phys, axis=1)
                    w_dep = jnp.take_along_axis(road.fifo_departure, phys, axis=1)
                    w_dst = jnp.take_along_axis(road.fifo_dest, phys, axis=1)
                    eligible = (
                        (w_dst == road_dest_local[:, None])
                        & (w_dep <= t)
                        & (logical[None, :] < count[:, None])
                    )
                    cum = jnp.cumprod(
                        eligible.astype(jnp.int32), axis=1
                    ).astype(bool)
                    wcount = cum.sum(axis=1).astype(jnp.int32)
                    wids = jnp.where(cum, w_ids, A).reshape(-1)
                return wids, wcount

            wids, wcount = _wscan(road.head, road.count)
            wd = jnp.zeros((A,), jnp.int32).at[wids].set(1, mode="drop")
            head_w = (road.head + wcount) % nmax
            count_w = road.count - wcount
            if sim.withdraw_escalate and K < nmax:
                # Depth-saturation escalation, mirroring core.withdraw: extra
                # local scans while some LOCAL road's run hit the bound.  The
                # shard-local while_loop may run different pass counts per
                # shard; the psum below is the only cross-shard merge and sums
                # the accumulated masks regardless.
                def wcond(c):
                    return jnp.any(c[3] == K)

                def wbody(c):
                    head, count, wd, _last, total = c
                    wids_k, w_k = _wscan(head, count)
                    wd = wd.at[wids_k].set(1, mode="drop")
                    return ((head + w_k) % nmax, count - w_k, wd, w_k,
                            total + w_k)

                head_w, count_w, wd, _, wcount = jax.lax.while_loop(
                    wcond, wbody, (head_w, count_w, wd, wcount, wcount)
                )
            road = road._replace(head=head_w, count=count_w)
            wd = jax.lax.psum(wd, AXIS)
            withdrew = wd > 0
            agents = agents._replace(
                arrival=jnp.where(withdrew, t, agents.arrival),
            )
            st = st._replace(agents=agents)

        # ---- choice (replicated computation on every shard) -------------
        # Halo #2: post-withdraw head summary, shared by choice and core.
        head_id_g, head_arr_g, head_dep_g, count_g, _, head_dest_g = halo(road)
        if learned is not None:
            # Edge-sharded learned-policy forward (rl.learned_policy):
            # the [N, 16] context is built replicated from the halo-gathered
            # global counts/heads, the policy MLP runs only on THIS shard's
            # road-source edge groups (plus the replicated virtual groups),
            # and the per-road winners ride the same all_gather as the
            # physics.  Bitwise-equal to the unsharded make_learned_choice:
            # same replicated [KF, N] Gumbel matrix column-sliced to the
            # block, same ascending-slot strict-> tie-break, and the Flax
            # forward is row-independent (rl.learned_policy.slot_logits).
            from ..rl.learned_policy import (
                _slot_argmax,
                rollout_context,
                slot_logits,
            )

            x_ctx = rollout_context(
                st, network, learned.pending_entrants,
                count=count_g[:R], head_ids=head_id_g[:R],
                extra_obs=learned.extra_obs,
            )
            key, sub = jax.random.split(st.key)
            if learned.deterministic:
                g_full = jnp.zeros((KF, N), jnp.float32)
            else:
                g_full = jax.random.gumbel(sub, (KF, N), jnp.float32)
            g_road_p = _padcols(g_full[:, :R], 0.0)

            # Local road block columns.  Padded columns (>= R) are fully
            # masked (ok False); their logit input ids are clamped to a real
            # column so the row gathers stay in range — the values never
            # contribute.
            cols_blk = block0 + rows_local
            logit_virt_attn = None
            if attention_net:
                # Attention net: the slot-twin trunk runs once over the
                # local block + the replicated virtual columns, with the
                # per-layer node sync = all_gather of the block updates
                # (models.transformer.slot_forward module docstring) — the
                # node state every shard carries into the next layer is
                # bitwise the unsharded one, so the local columns' logits
                # are too.
                nv = N - R
                cols_all = jnp.concatenate([
                    jnp.minimum(cols_blk, R - 1),
                    jnp.arange(R, N, dtype=jnp.int32),
                ])

                def _sync(h_cols):
                    h_blk = jax.lax.all_gather(
                        h_cols[:rl], AXIS, tiled=True
                    )  # [Rp, d]
                    return jnp.concatenate([h_blk[:R], h_cols[rl:]], axis=0)

                logit_all = learned.slot_net.apply(
                    learned.params, x_ctx, learned.slot_tables, cols_all,
                    sync=_sync,
                )
                logit_blk = logit_all[:, :rl]
                logit_virt_attn = logit_all[:, rl:]
            else:
                logit_blk = slot_logits(
                    learned, x_ctx, network, lp_dst, lp_attr,
                    jnp.minimum(cols_blk, R - 1),
                )
            g_blk = jax.lax.dynamic_slice(g_road_p, (0, block0), (KF, rl))
            ok_blk = jax.lax.dynamic_slice(lp_ok_p, (0, block0), (KF, rl))
            dst_blk = jax.lax.dynamic_slice(lp_dst_p, (0, block0), (KF, rl))
            score_blk = jnp.where(ok_blk, logit_blk + g_blk, -jnp.inf)
            prev_p = _pad1(st.selected_road[:R], 0)
            prev_blk = jax.lax.dynamic_slice_in_dim(prev_p, block0, rl)
            sel_blk = _slot_argmax(score_blk, dst_blk, prev_blk)
            sel_roads = jax.lax.all_gather(sel_blk, AXIS, tiled=True)  # [Rp]

            # Virtual (SRC/DEST) columns, replicated on every shard.
            if attention_net:
                logit_virt = logit_virt_attn
            else:
                cols_virt = jnp.arange(R, N, dtype=jnp.int32)
                logit_virt = slot_logits(
                    learned, x_ctx, network, lp_dst, lp_attr, cols_virt
                )
            score_virt = jnp.where(
                lp_ok[:, R:], logit_virt + g_full[:, R:], -jnp.inf
            )
            sel_virt = _slot_argmax(
                score_virt, lp_dst[:, R:], st.selected_road[R:]
            )

            sel = st.selected_road.at[:R].set(sel_roads).at[R:].set(sel_virt)
        elif primal and primal_dests is not None:
            # Replicated DEST-RESTRICTED refresh + lookups, mirroring
            # make_primal_dest_parts (costs from the halo counts; anchor
            # columns are the destination list).
            from ..routing.bellman_ford import BIG, primal_relax_next_roads
            from ..routing.policies import (
                _dest_inter,
                _maybe_epilogue_tables,
                _road_lookup,
            )

            i_n = network.num_intersections
            _pb = (_pb_shifts, _pb_slot, _pb_perm, _pb_inv)
            _epi = _maybe_epilogue_tables(network, _pb)

            def refresh_pd(_):
                cost = _halo_road_costs(count_g)
                prev_dist, prev_cost, _, _ = _unpack_z(st.next_hop)
                ratio = jnp.max(cost / jnp.maximum(prev_cost, 1e-6))
                dist0 = jnp.minimum(prev_dist * jnp.maximum(ratio, 1.0), BIG)
                anchor = (jnp.arange(i_n, dtype=jnp.int32)[:, None]
                          == primal_dests[None, :])
                dist, road_t = primal_relax_next_roads(
                    cost, network.inter_out_road, network.inter_out_ok,
                    network.road_to, jnp.where(anchor, 0.0, dist0),
                    routing.max_bf_iters, buckets=_pb, epi_tables=_epi,
                )
                from ..routing.policies import _pack_k, _zone_k_tab

                k_tab = _zone_k_tab(road_t, network, d_n)
                return jnp.concatenate(
                    [dist.ravel(), cost, road_t.ravel(),
                     _pack_k(k_tab).ravel()]
                )

            do_refresh = st.choice_count % routing.refresh_rate == 0
            buf = jax.lax.cond(
                do_refresh, refresh_pd, lambda _: st.next_hop, operand=None
            )
            _, _, road_tab, _ = _unpack_z(buf)
            dcol_h = primal_dcol[
                _dest_inter(network, head_dest_g[:R])
            ]
            sel_roads = _road_lookup(road_tab, network.road_to, dcol_h)
            sel = st.selected_road.at[:R].set(sel_roads)
            key = st.key
            st = st._replace(
                next_hop=buf, choice_count=st.choice_count + 1
            )
        elif primal:
            # Replicated primal refresh + lookups, mirroring
            # make_shortest_path_choice_primal (costs from the halo counts).
            from ..routing.bellman_ford import (
                BIG,
                primal_all_pairs_dist,
                primal_next_roads,
            )
            from ..routing.policies import (
                _dest_inter,
                _primal_argmin_road,
                _primal_pack,
                _primal_unpack,
            )

            i_n = network.num_intersections

            def refresh_p(_):
                cost = _halo_road_costs(count_g)
                prev_dist, prev_cost, _ = _primal_unpack(
                    st.next_hop, i_n, i_n, R
                )
                ratio = jnp.max(cost / jnp.maximum(prev_cost, 1e-6))
                dist0 = jnp.minimum(prev_dist * jnp.maximum(ratio, 1.0), BIG)
                dist = primal_all_pairs_dist(
                    cost, network.inter_out_road, network.inter_out_ok,
                    network.road_to, max_iters=routing.max_bf_iters,
                    dist0=dist0, delta_shifts=_pb_shifts, delta_slot=_pb_slot,
                    delta_perm=_pb_perm, delta_inv=_pb_inv,
                )
                road = primal_next_roads(
                    dist, cost, network.inter_out_road,
                    network.inter_out_ok, network.road_to,
                )
                return _primal_pack(dist, cost, road)

            do_refresh = st.choice_count % routing.refresh_rate == 0
            buf = jax.lax.cond(
                do_refresh, refresh_p, lambda _: st.next_hop, operand=None
            )
            dest_i = _dest_inter(network, agents.dest[head_id_g[:R]])
            sel_roads = _primal_argmin_road(
                buf, network, network.road_to, dest_i
            )
            sel = st.selected_road.at[:R].set(sel_roads)
            key = st.key
            st = st._replace(
                next_hop=buf, choice_count=st.choice_count + 1
            )
        elif strict:
            # Replicated STRICT-COMPAT refresh + lookup
            # (routing.policies.make_shortest_path_choice strict branch):
            # the reference's edge-cost form from the halo'd counts, and
            # SELECTED_ROAD written for ALL nodes via their FIFO head — the
            # dummy agent 0 for SRC/DEST nodes (base.py:541-584).
            from ..routing.bellman_ford import all_pairs_next_hop

            n_nodes = network.num_nodes

            def refresh_s(_):
                def padn(x):
                    return jnp.zeros((n_nodes,), jnp.float32).at[:R].set(x)

                ffn = padn(network.free_flow)
                capn = padn(network.capacity)
                ccn = padn(network.congestion_constant)
                cntn = padn(count_g[:R].astype(jnp.float32))
                u, v = network.full_src, network.full_dst
                w = jnp.maximum(
                    ffn[u],
                    ccn[v] / (
                        capn[u] + physics.congestion_softening - cntn[u]
                    ),
                )
                _, nh = all_pairs_next_hop(
                    network.full_src, network.full_dst,
                    jnp.zeros((n_nodes,), jnp.float32), n_nodes,
                    max_iters=routing.max_bf_iters, edge_cost=w,
                )
                return nh

            do_refresh = st.choice_count % routing.refresh_rate == 0
            next_hop = jax.lax.cond(
                do_refresh, refresh_s, lambda _: st.next_hop, operand=None
            )
            head_all = jnp.zeros((n_nodes,), jnp.int32).at[:R].set(
                head_id_g[:R]
            )
            dests = agents.dest[head_all]
            sel = next_hop[
                jnp.arange(n_nodes, dtype=jnp.int32), dests
            ].astype(jnp.int32)
            key = st.key
            st = st._replace(
                next_hop=next_hop, choice_count=st.choice_count + 1
            )
        elif shortest:
            from ..routing.bellman_ford import all_pairs_next_hop_nbr

            n_nodes = network.num_nodes

            def refresh(_):
                cost = jnp.zeros((n_nodes,), jnp.float32).at[:R].set(
                    _halo_road_costs(count_g)
                )
                _, nh = all_pairs_next_hop_nbr(
                    network.nbr, network.nbr_ok, cost,
                    max_iters=routing.max_bf_iters,
                )
                return nh

            do_refresh = st.choice_count % routing.refresh_rate == 0
            next_hop = jax.lax.cond(
                do_refresh, refresh, lambda _: st.next_hop, operand=None
            )
            dests = agents.dest[head_id_g[:R]]
            sel = st.selected_road.at[:R].set(
                next_hop[jnp.arange(R, dtype=jnp.int32), dests]
            )
            key = st.key
            st = st._replace(
                next_hop=next_hop, choice_count=st.choice_count + 1
            )
        else:
            if "choice" in _skip:
                sel = st.selected_road
                key = st.key
            else:
                st2, _ = random_choice(st, network)
                sel = st2.selected_road
                key = st2.key
                st = st._replace(
                    next_hop=st2.next_hop, choice_count=st2.choice_count
                )

        # ---- core: fused direction + response, slot-major local block ----
        # Mirrors core.direction exactly: same replicated [KIN, R] Gumbel
        # matrix (column-sliced to the block), same masks, same
        # ascending-slot strict-> tie-break — bitwise-equal winners.
        if "core" in _skip:
            key, _ = jax.random.split(key)
            popped = jnp.zeros((rl,), bool)
        else:
            key, k_dir = jax.random.split(key)
            count_v_f = road.count.astype(jnp.float32)  # local [rl]
            cap_l = jax.lax.dynamic_slice_in_dim(capp, block0, rl)
            ff_l = jax.lax.dynamic_slice_in_dim(ffp, block0, rl)
            cc_l = jax.lax.dynamic_slice_in_dim(ccp, block0, rl)
            space_ok = count_v_f < cap_l - physics.congestion_buffer
            v_free = cap_l - count_v_f
            v_slot_ok = count_v_f < cap_l
            v_global = block0 + rows_local

            # Upstream state packed into one int32 per road, exactly as
            # core.direction (one gather per slot instead of three).
            from ..core.direction import pack_upstream, upstream_pack_layout

            shift_free, shift_sel, free_mask = upstream_pack_layout(R, nmax)
            sel_r = sel[:R]
            sel_enc = _pad1(jnp.where(
                (sel_r >= 0) & (sel_r < R), sel_r, R
            ).astype(jnp.int32), R)
            pack = pack_upstream(
                head_dep_g, count_g, capp, sel_enc, t, physics, R, nmax
            )

            from ..core.rng import direction_gumbel

            gumbel_full = _padcols(direction_gumbel(k_dir, network), 0.0)
            gumbel_l = jax.lax.dynamic_slice(gumbel_full, (0, block0), (KIN, rl))
            if use_roll_in:
                # Roll-plan evaluation of pack/head-id/head-dest at each in-slot
                # (the three gathers share one plan, like core.direction).
                mat_in = jnp.stack(
                    [pack[:R], head_id_g[:R], head_dest_g[:R]]
                ).astype(jnp.int32)                                   # [3, R]
                exc_vals = mat_in[:, network.in_roll_exc_src]         # [3, E]
                overlay = jnp.zeros((KIN, 3, Rp), jnp.int32)
                if network.in_roll_exc_src.shape[0]:
                    overlay = overlay.at[
                        network.in_roll_exc_k, :, network.in_roll_exc_v
                    ].set(exc_vals.T)
                sel_blk = jax.lax.dynamic_slice(
                    in_sel_p, (0, block0), (KIN, rl)
                )
                exc_blk = jax.lax.dynamic_slice(
                    overlay, (0, 0, block0), (KIN, 3, rl)
                )
                rolled_in = _block_roll_read(
                    mat_in, network.in_roll_shift, sel_blk, exc_blk,
                    block0, rl, R,
                )                                                     # [KIN,3,rl]
            def _winner_loop_xla():
                best = jnp.full((rl,), -jnp.inf, jnp.float32)
                win_slot = jnp.zeros((rl,), jnp.int32)
                accept = jnp.zeros((rl,), bool)
                chosen_id = jnp.zeros((rl,), jnp.int32)
                chosen_dest = jnp.zeros((rl,), jnp.int32)
                u_slices = []
                for k in range(KIN):
                    u_k = jax.lax.dynamic_slice_in_dim(
                        in_src_p[k], block0, rl
                    )
                    u_slices.append(u_k)
                    ok_k = jax.lax.dynamic_slice_in_dim(
                        in_ok_p[k], block0, rl
                    )
                    logit_k = jax.lax.dynamic_slice_in_dim(
                        in_logit_p[k], block0, rl
                    )
                    p_k = rolled_in[k, 0] if use_roll_in else pack[u_k]
                    dep_ok = (p_k & 1) > 0
                    nonempty = (p_k & 2) > 0
                    stuck = (p_k & 4) > 0
                    u_free = ((p_k >> shift_free) & free_mask).astype(jnp.float32)
                    u_full = u_free <= physics.congestion_buffer
                    wants_v = (p_k >> shift_sel) == v_global
                    mask = dep_ok & space_ok & wants_v & nonempty
                    mask = mask | (
                        stuck & u_full & (u_free <= v_free) & wants_v & nonempty
                        & v_slot_ok
                    )
                    mask = mask & ok_k
                    s_k = jnp.where(mask, logit_k + gumbel_l[k], -jnp.inf)
                    take = s_k > best
                    best = jnp.where(take, s_k, best)
                    win_slot = jnp.where(take, k, win_slot)
                    if use_roll_in:
                        chosen_id = jnp.where(take, rolled_in[k, 1], chosen_id)
                        chosen_dest = jnp.where(take, rolled_in[k, 2], chosen_dest)
                    accept = accept | take

                win_u = jnp.zeros((rl,), jnp.int32)
                for k in range(KIN):
                    win_u = jnp.where(win_slot == k, u_slices[k], win_u)
                win_u = jnp.where(accept, win_u, Rp)
                if use_roll_in:
                    chosen = jnp.where(accept, chosen_id, 0)
                else:
                    chosen = jnp.where(
                        accept, head_id_g[jnp.minimum(win_u, Rp - 1)], 0
                    )
                return accept, win_u, chosen, chosen_dest

            if use_fused_winner:
                # One Pallas kernel per shard replaces the ~10*KIN vector ops of
                # _winner_loop_xla (the launch-bound mid-section on real
                # meshes); the kernel applies the sentinel guard itself, so the
                # shared re-derivation below is a bitwise no-op on its outputs.
                logit_blk = jax.lax.dynamic_slice(
                    in_logit_p, (0, block0), (KIN, rl)
                )
                src_blk = jax.lax.dynamic_slice(in_src_p, (0, block0), (KIN, rl))
                ok_blk = jax.lax.dynamic_slice(in_ok_p, (0, block0), (KIN, rl))
                accept, win_u, chosen, chosen_dest = fused_shard_winner(
                    rolled_in[:, 0], rolled_in[:, 1], rolled_in[:, 2],
                    gumbel_l, logit_blk, src_blk, ok_blk, count_v_f, cap_l,
                    v_global, Rp, physics, (shift_free, shift_sel, free_mask),
                )
            else:
                accept, win_u, chosen, chosen_dest = _winner_loop_xla()

            accept = chosen != 0  # sentinel guard (direction_mpnn.py:194)
            win_u = jnp.where(accept, win_u, Rp)

            slot2 = (road.head + road.count) % nmax
            rows2 = jnp.where(accept, rows_local, rl)
            tc2 = cc_l / (cap_l + physics.congestion_softening - count_v_f)
            tt2 = jnp.maximum(ff_l, tc2)
            fifo_ids = road.fifo_ids.at[rows2, slot2].set(chosen, mode="drop")
            fifo_arr = road.fifo_arrival.at[rows2, slot2].set(
                jnp.broadcast_to(t, (rl,)), mode="drop"
            )
            fifo_dep = road.fifo_departure.at[rows2, slot2].set(
                t + tt2, mode="drop"
            )
            if use_roll_in:
                dest_v = jnp.where(accept, chosen_dest, 0)
            else:
                dest_v = jnp.where(
                    accept, head_dest_g[jnp.minimum(win_u, Rp - 1)], 0
                )
            fifo_dst2 = road.fifo_dest.at[rows2, slot2].set(dest_v, mode="drop")
            new_count = road.count + accept.astype(jnp.int32)

            # response: tell the winning upstream's shard to pop (all_gather)
            winners_g = jax.lax.all_gather(
                jnp.where(accept, win_u, Rp), AXIS, tiled=True
            )  # [Rp]
            if use_roll_out:
                # Roll the winner record to each road's out-slots and compare
                # against the road's own index (core.response confirm roll) —
                # the [Rp]-index pop scatter becomes a few block slices.
                win_mat = winners_g[:R][None, :]                      # [1, R]
                exc_w = win_mat[:, network.out_roll_exc_src]          # [1, E]
                overlay_w = jnp.zeros((KOUT, 1, Rp), jnp.int32)
                if network.out_roll_exc_src.shape[0]:
                    overlay_w = overlay_w.at[
                        network.out_roll_exc_k, :, network.out_roll_exc_v
                    ].set(exc_w.T)
                osel_blk = jax.lax.dynamic_slice(
                    out_sel_p, (0, block0), (KOUT, rl)
                )
                oexc_blk = jax.lax.dynamic_slice(
                    overlay_w, (0, 0, block0), (KOUT, 1, rl)
                )
                w_rows = _block_roll_read(
                    win_mat, network.out_roll_shift, osel_blk, oexc_blk,
                    block0, rl, R,
                )[:, 0]                                               # [KOUT, rl]
                popped = jnp.zeros((rl,), bool)
                for k in range(KOUT):
                    ook_k = jax.lax.dynamic_slice_in_dim(
                        out_ok_p[k], block0, rl
                    )
                    popped = popped | (ook_k & (w_rows[k] == v_global))
            else:
                pops_full = jnp.zeros((Rp + 1,), bool).at[winners_g].set(True)
                popped = jax.lax.dynamic_slice_in_dim(pops_full, block0, rl)
            road = road._replace(
                fifo_ids=fifo_ids, fifo_arrival=fifo_arr, fifo_departure=fifo_dep,
                fifo_dest=fifo_dst2,
                head=(road.head + popped.astype(jnp.int32)) % nmax,
                count=new_count - popped.astype(jnp.int32),
            )

        # ---- road-optimality series (replicated elementwise; the per-edge
        # delta depends only on the source road, so the per-source reduction
        # is delta * out-degree, exactly as core.direction) ----------------
        want_delta = sim.record_road_optimality or sim.record_road_optimality_hourly
        if want_delta:
            outdeg = _pad1(
                network.out_edge_ok.sum(axis=0).astype(jnp.float32), 0.0
            )
            delta_full = (
                jnp.maximum((head_dep_g - head_arr_g) - ffp, 0.0) * outdeg
            )
            delta_local = jax.lax.dynamic_slice_in_dim(delta_full, block0, rl)
        else:
            delta_full = jnp.zeros((0,), jnp.float32)
            delta_local = None

        # ---- clock + metrics --------------------------------------------
        new_time = t + sim.timestep
        hour = jnp.clip((t / 3600.0).astype(jnp.int32), 0, sim.num_hours - 1)
        traversals = ((wcount > 0) | popped).astype(jnp.int32)
        m = st.metrics
        hourly = m.hourly_counts.at[hour].add(traversals)
        delta_hourly = m.delta_tt_hourly
        if sim.record_road_optimality_hourly and want_delta:
            delta_hourly = delta_hourly.at[hour].add(delta_local)
        on_way_total = jax.lax.psum(
            jnp.sum(road.count).astype(jnp.float32), AXIS
        )
        done_total = m.done_before + jax.lax.psum(
            jnp.sum(wcount).astype(jnp.float32), AXIS
        )
        new_st = st._replace(
            road=road,
            agents=agents,
            selected_road=sel,
            time=new_time,
            key=key,
            metrics=MetricState(
                hourly_counts=hourly,
                on_way_before=on_way_total,
                done_before=done_total,
                delta_tt_hourly=delta_hourly,
            ),
            next_hop=st.next_hop,
            choice_count=st.choice_count,
        )
        log = TickLog(
            departures=(on_way_total - m.on_way_before
                        + done_total - m.done_before),
            arrivals=done_total - m.done_before,
            on_way=on_way_total,
            time=new_time,
            road_delta_tt=(delta_full[:R] if sim.record_road_optimality
                           else jnp.zeros((0,), jnp.float32)),
            # Whole-population insert is never window-bounded; the backlog
            # path reports its queue-overflow monitor exactly like the
            # serial tick (all-zero == bitwise reference-exact).
            window_saturated=overflow,
        )
        return new_st, log

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(road_spec,),
        out_specs=(road_spec, log_spec),
        check_vma=False,
    )
    def episode(st):
        def body(s, _):
            return tick_local(s)

        return jax.lax.scan(body, st, length=num_steps)

    if pad:
        # Pad the road axis of the carried state with inert rows (see the
        # padding note above); sliced back off below.
        rd = state.road
        state = state._replace(
            road=rd._replace(
                fifo_ids=_padrows(rd.fifo_ids, 0),
                fifo_arrival=_padrows(rd.fifo_arrival, 0.0),
                fifo_departure=_padrows(rd.fifo_departure, 0.0),
                fifo_dest=_padrows(rd.fifo_dest, 0),
                head=_pad1(rd.head, 0),
                count=_pad1(rd.count, 0),
            ),
            metrics=state.metrics._replace(
                hourly_counts=_padcols(state.metrics.hourly_counts, 0),
                delta_tt_hourly=_padcols(state.metrics.delta_tt_hourly, 0.0),
            ),
        )

    cache_key = (
        id(network), id(policy), num_steps, S,
        tuple(int(d.id) for d in mesh.devices.flat),
        repr(sim), repr(routing), repr(physics),
        use_backlog, A, R,
        os.environ.get("TARL_SHARD_SKIP", ""),
        os.environ.get("TARL_FUSED_SHARD", ""),
        os.environ.get("TARL_NO_ROLL", ""),
        os.environ.get("TARL_BACKLOG_POP", ""),
    )
    episode_jit = _episode_cache_get(cache_key)
    if episode_jit is None:
        episode_jit = jax.jit(episode)
        # The strong refs pin id(network)/id(policy) for the cache's life.
        _episode_cache_put(cache_key, episode_jit, (network, policy))
    with mesh:
        final, log = episode_jit(state)

    if use_backlog:
        # The lazy inserted flag, reconstructed once per episode exactly as
        # the serial drivers do (agents/queues are replicated, so this runs
        # on the unsharded final state).  Jitted and cached: eager ops over
        # the axon tunnel cost a network round-trip EACH.
        global _RECONSTRUCT_JIT
        if _RECONSTRUCT_JIT is None:
            from ..core.insert import reconstruct_inserted

            _RECONSTRUCT_JIT = jax.jit(reconstruct_inserted)
        final = final._replace(agents=_RECONSTRUCT_JIT(
            final.agents, final.backlog, final.insert_ptr
        ))

    if pad:
        rd = final.road
        final = final._replace(
            road=rd._replace(
                fifo_ids=rd.fifo_ids[:R],
                fifo_arrival=rd.fifo_arrival[:R],
                fifo_departure=rd.fifo_departure[:R],
                fifo_dest=rd.fifo_dest[:R],
                head=rd.head[:R],
                count=rd.count[:R],
            ),
            metrics=final.metrics._replace(
                hourly_counts=final.metrics.hourly_counts[:, :R],
                delta_tt_hourly=final.metrics.delta_tt_hourly[:, :R],
            ),
        )
    return final, log
