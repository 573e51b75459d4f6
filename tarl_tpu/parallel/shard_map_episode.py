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
  (edges are what need the halo: their upstream may live on any shard);
* agents and routing scratch are replicated; agent-side writes (insert's
  ON_WAY, withdraw's DONE/arrival) are disjoint across shards and merged
  with ``psum`` — an agent sits on exactly one road;
* per tick, the halo is TWO ``all_gather``s of the per-road head summary
  (id / arrival / departure / count; a few scalars per road, so a full
  gather beats neighbor exchange on the irregular dual-graph partition):
  one pre-insert (capacity/slot math), one post-withdraw (eligibility
  masks), plus ONE ``all_gather`` of the per-road transfer winners (the
  response phase: the winning upstream's shard must pop its head) and
  ``psum``s for the agent merge, the tick scalars, and (when enabled) the
  per-source road-optimality reduction;
* sampling stays BITWISE-equal to the unsharded ``core.step.tick``: the
  Gumbel vector for the whole edge list is generated replicated from the
  same key and gathered per-shard by global edge id, and argmax ties break
  on the global edge index exactly like ``ops.segment.segment_argmax``.

Supported policies: ``random_choice`` (reads no road state, so its
replicated recomputation is exact) and the shortest-path policy
(``Policy.needs_next_hop``): its all-pairs Bellman-Ford refresh and
per-road next-hop selection run REPLICATED on every shard from the
halo-gathered counts/head ids — the [N, N] table is routing scratch, not
simulation state, and recomputing it everywhere is cheaper than sharding
it.  The direction/response pair uses the fused win-pop formulation proven
equivalent in ``core.fused_core``.
"""
from __future__ import annotations

import functools

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


def make_road_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (AXIS,))


def _partition_edges(network: Network, num_shards: int):
    """Group turn edges by downstream-road block; pad blocks to equal size.

    Returns int32 arrays ``[S * E_max]`` (u_global, v_global, global edge id)
    plus the padded per-shard width.  Sentinel entries use ``u = v = R`` and
    ``eid = E`` (their Gumbel score is -inf, so they never win).
    """
    u = np.asarray(network.edge_src)
    v = np.asarray(network.edge_dst)
    E = u.shape[0]
    R = network.num_roads
    rl = R // num_shards
    blocks = [np.nonzero((v >= s * rl) & (v < (s + 1) * rl))[0]
              for s in range(num_shards)]
    e_max = max(max(len(b) for b in blocks), 1)
    us = np.full((num_shards, e_max), R, np.int32)
    vs = np.full((num_shards, e_max), R, np.int32)
    ids = np.full((num_shards, e_max), E, np.int32)
    for s, b in enumerate(blocks):
        us[s, : len(b)] = u[b]
        vs[s, : len(b)] = v[b]
        ids[s, : len(b)] = b
    return (
        jnp.asarray(us.reshape(-1)),
        jnp.asarray(vs.reshape(-1)),
        jnp.asarray(ids.reshape(-1)),
        e_max,
    )


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

    shortest = policy.needs_next_hop
    assert shortest or policy.choice is random_choice, (
        "shard_map episode supports the random and shortest-path policies"
    )
    assert not routing.strict_compat, (
        "strict-compat routing is not supported under shard_map"
    )
    S = mesh.devices.size
    R = network.num_roads
    A = state.agents.num_agents
    E = network.num_turn_edges
    assert R % S == 0, f"num_roads {R} % shards {S} != 0"
    rl = R // S
    nmax = state.road.nmax
    eu, ev, eid, e_max = _partition_edges(network, S)

    cap = network.capacity
    ff = network.free_flow
    cc = network.congestion_constant
    e_attr_pad = jnp.concatenate([network.edge_attr, jnp.zeros((1,))])

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
    )
    log_spec = TickLog(departures=P(), arrivals=P(), on_way=P(), time=P(),
                       road_delta_tt=P())

    def halo(road_local):
        """All-gather the per-road head summary (the halo exchange)."""
        head = road_local.head
        count = road_local.count
        raw_id = jnp.take_along_axis(road_local.fifo_ids, head[:, None], 1)[:, 0]
        raw_ar = jnp.take_along_axis(road_local.fifo_arrival, head[:, None], 1)[:, 0]
        raw_de = jnp.take_along_axis(road_local.fifo_departure, head[:, None], 1)[:, 0]
        nonempty = count > 0
        local = jnp.stack(
            [
                jnp.where(nonempty, raw_id, 0).astype(jnp.float32),
                jnp.where(nonempty, raw_ar, 0.0),
                jnp.where(nonempty, raw_de, 0.0),
                count.astype(jnp.float32),
                head.astype(jnp.float32),
            ],
            axis=1,
        )  # [rl, 5]
        g = jax.lax.all_gather(local, AXIS, tiled=True)  # [R, 5]
        return (g[:, 0].astype(jnp.int32), g[:, 1], g[:, 2],
                g[:, 3].astype(jnp.int32), g[:, 4].astype(jnp.int32))

    def tick_local(st: SimState, eu_l, ev_l, eid_l):
        """One tick on this shard's road block (runs under shard_map)."""
        idx = jax.lax.axis_index(AXIS)
        block0 = idx * rl
        rows_local = jnp.arange(rl, dtype=jnp.int32)
        t = st.time
        road = st.road
        agents = st.agents

        # ---- insert (replicated candidate math, local scatter) ----------
        _, _, _, count_g, head_g = halo(road)
        ready = (agents.departure <= t) & (~agents.on_way) & (~agents.done)
        if shortest:
            # Per-agent entry roads (shortest_path_entry, replicated).
            entry = st.next_hop[agents.origin, agents.dest]
        else:
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
        count_add = jax.ops.segment_sum(
            ok_loc.astype(jnp.int32), rows, num_segments=rl + 1
        )[:rl]
        road = road._replace(
            fifo_ids=fifo_ids, fifo_arrival=fifo_arr, fifo_departure=fifo_dep,
            count=road.count + count_add,
        )
        # agent merge (disjoint across shards)
        ins_ids = jnp.where(ok_loc, agent_sorted, A)
        ins_delta = jnp.zeros((A,), jnp.int32).at[ins_ids].set(1, mode="drop")
        ins_delta = jax.lax.psum(ins_delta, AXIS)
        agents = agents._replace(inserted=agents.inserted | (ins_delta > 0))

        # ---- withdraw (local roads, psum agent merge) --------------------
        K = nmax if sim.withdraw_depth is None else min(sim.withdraw_depth, nmax)
        logical = jnp.arange(K, dtype=jnp.int32)
        phys = (road.head[:, None] + logical[None, :]) % nmax
        w_ids = jnp.take_along_axis(road.fifo_ids, phys, axis=1)
        w_dep = jnp.take_along_axis(road.fifo_departure, phys, axis=1)
        road_dest_local = jax.lax.dynamic_slice_in_dim(
            network.road_dest, block0, rl
        )
        eligible = (
            (agents.dest[w_ids] == road_dest_local[:, None])
            & (w_dep <= t)
            & (logical[None, :] < road.count[:, None])
        )
        cum = jnp.cumprod(eligible.astype(jnp.int32), axis=1).astype(bool)
        wcount = cum.sum(axis=1).astype(jnp.int32)
        road = road._replace(
            head=(road.head + wcount) % nmax, count=road.count - wcount
        )
        wids = jnp.where(cum, w_ids, A).reshape(-1)
        wd = jnp.zeros((A,), jnp.int32).at[wids].set(1, mode="drop")
        wd = jax.lax.psum(wd, AXIS)
        withdrew = wd > 0
        agents = agents._replace(
            arrival=jnp.where(withdrew, t, agents.arrival),
        )
        st = st._replace(agents=agents)

        # ---- choice (replicated computation on every shard) -------------
        # Halo #2: post-withdraw head summary, shared by choice and core.
        head_id_g, head_arr_g, head_dep_g, count_g, _ = halo(road)
        if shortest:
            from ..routing.bellman_ford import all_pairs_next_hop_nbr

            n_nodes = network.num_nodes

            def refresh(_):
                tc = cc / (
                    cap + physics.congestion_softening
                    - count_g.astype(jnp.float32)
                )
                cost = jnp.zeros((n_nodes,), jnp.float32).at[:R].set(
                    jnp.maximum(ff, tc)
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
            dests = agents.dest[head_id_g]
            sel = st.selected_road.at[:R].set(
                next_hop[jnp.arange(R, dtype=jnp.int32), dests]
            )
            key = st.key
            st = st._replace(
                next_hop=next_hop, choice_count=st.choice_count + 1
            )
        else:
            st2, _ = random_choice(st, network)
            sel = st2.selected_road
            key = st2.key
            st = st._replace(
                next_hop=st2.next_hop, choice_count=st2.choice_count
            )

        # ---- core: fused direction + response over local edges ----------
        key, k_dir = jax.random.split(key)
        real = eid_l < E
        u = jnp.minimum(eu_l, R - 1)
        v_loc = jnp.where(real, ev_l - block0, 0)
        count_f = count_g.astype(jnp.float32)
        dep_ok = head_dep_g[u] <= t
        count_v = road.count  # local [rl]
        count_v_f = count_v.astype(jnp.float32)
        cap_l = jax.lax.dynamic_slice_in_dim(cap, block0, rl)
        ff_l = jax.lax.dynamic_slice_in_dim(ff, block0, rl)
        cc_l = jax.lax.dynamic_slice_in_dim(cc, block0, rl)
        space_ok = count_v_f[v_loc] < cap_l[v_loc] - physics.congestion_buffer
        wants_v = sel[:R][u] == ev_l
        nonempty = count_g[u] > 0
        mask = dep_ok & space_ok & wants_v & nonempty
        stuck = (head_dep_g[u] - t) < -physics.gridlock_patience
        u_full = cap[u] - physics.congestion_buffer <= count_f[u]
        v_freer = cap[u] - count_f[u] <= cap_l[v_loc] - count_v_f[v_loc]
        v_slot = count_v_f[v_loc] < cap_l[v_loc]
        mask = mask | (stuck & u_full & v_freer & wants_v & nonempty & v_slot)
        mask = mask & real
        prob = e_attr_pad[jnp.minimum(eid_l, E)] * mask.astype(jnp.float32)
        logits = jnp.where(prob > 0, jnp.log(jnp.maximum(prob, 1e-30)), -jnp.inf)
        # Bitwise-equal sampling: full-edge Gumbel replicated, local gather.
        gumbel_full = jax.random.gumbel(k_dir, (E,), dtype=jnp.float32)
        gumbel_pad = jnp.concatenate([gumbel_full, jnp.asarray([-jnp.inf])])
        score = jnp.where(
            jnp.isfinite(logits),
            logits + gumbel_pad[jnp.minimum(eid_l, E)],
            -jnp.inf,
        )
        best = jax.ops.segment_max(score, v_loc, num_segments=rl)
        attains = (score == best[v_loc]) & jnp.isfinite(score)
        cand = jnp.where(attains, eid_l, E)  # global-edge-id tie-break
        win_eid = jnp.minimum(
            jax.ops.segment_min(cand, v_loc, num_segments=rl), E
        )
        has = win_eid < E
        # recover the winning edge's u via the local table
        win_pos = jax.ops.segment_min(
            jnp.where(attains & (eid_l == win_eid[v_loc]),
                      jnp.arange(eu_l.shape[0], dtype=jnp.int32),
                      eu_l.shape[0]),
            v_loc, num_segments=rl,
        )
        win_pos_c = jnp.minimum(win_pos, eu_l.shape[0] - 1)
        win_u = jnp.where(has, eu_l[win_pos_c], R)
        chosen = jnp.where(has, head_id_g[jnp.minimum(win_u, R - 1)], 0)
        accept = chosen != 0  # sentinel guard (direction_mpnn.py:194)

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
        new_count = road.count + accept.astype(jnp.int32)

        # response: tell the winning upstream's shard to pop (all_gather)
        winners_g = jax.lax.all_gather(
            jnp.where(accept, win_u, R), AXIS, tiled=True
        )  # [R]
        pops_full = jnp.zeros((R + 1,), bool).at[winners_g].set(True)
        popped = jax.lax.dynamic_slice_in_dim(pops_full, block0, rl)
        road = road._replace(
            fifo_ids=fifo_ids, fifo_arrival=fifo_arr, fifo_departure=fifo_dep,
            head=(road.head + popped.astype(jnp.int32)) % nmax,
            count=new_count - popped.astype(jnp.int32),
        )

        # ---- road-optimality series (psum over shards by source road) ---
        want_delta = sim.record_road_optimality or sim.record_road_optimality_hourly
        if want_delta:
            edge_delta = jnp.where(
                real,
                jnp.maximum((head_dep_g[u] - head_arr_g[u]) - ff[u], 0.0),
                0.0,
            )
            contrib = jax.ops.segment_sum(
                edge_delta, jnp.where(real, eu_l, R), num_segments=R + 1
            )[:R]
            delta_full = jax.lax.psum(contrib, AXIS)  # [R]
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
            road_delta_tt=(delta_full if sim.record_road_optimality
                           else jnp.zeros((0,), jnp.float32)),
        )
        return new_st, log

    edge_specs = (P(AXIS), P(AXIS), P(AXIS))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(road_spec, *edge_specs),
        out_specs=(road_spec, log_spec),
        check_vma=False,
    )
    def episode(st, eu_s, ev_s, eid_s):
        def body(s, _):
            return tick_local(s, eu_s, ev_s, eid_s)

        return jax.lax.scan(body, st, length=num_steps)

    with mesh:
        return jax.jit(episode)(state, eu, ev, eid)
