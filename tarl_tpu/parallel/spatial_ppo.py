"""Fully spatially-sharded PPO training: ONE ``shard_map`` runs the rollout
(road-sharded environment physics + node-sharded policy forward/sampling)
AND the clipped-PPO update epochs (node-sharded gradients).

This is the final rung of SURVEY §2.10's parallel ladder (reference:
``rl/ppo_trainer.py:12-160`` is the pipeline being scaled).  The pieces it
composes already exist and are individually pinned:

* :class:`~tarl_tpu.parallel.sharded_ppo.ShardedPPO` shards the UPDATE
  (forward/backward over the edge set) but rolls out unsharded;
* :func:`~tarl_tpu.parallel.shard_map_episode.run_episode_shard_map` shards
  classical EPISODES (random / shortest-path / learned policies) but has no
  training loop.

Here the environment state itself — the ``[R, Nmax]`` FIFO rings, the
dominant memory at scale — lives road-sharded for the whole training
iteration, and the policy forward/backward is node-column-sharded, so a
network whose state + edge tables exceed one chip can still be TRAINED on.

Sharding layout (one mesh axis ``"shard"``):

* roads: shard ``i`` owns the contiguous padded block ``[i*Rp/S,
  (i+1)*Rp/S)`` of ring rows, hourly-metric columns and ``old_counts``
  (same inert-row padding as ``shard_map_episode``);
* nodes: the slot-major full out-edge tables (``sharded_ppo.
  _out_tables_with_ids`` layout — groups are columns, never split) are
  column-sharded for the policy forward, the Gumbel-max action sample and
  the loss;
* agents, params, optimizer state, routing scratch: replicated; agent
  writes are disjoint across shards and merged with ``psum``.

Equality contract (pinned by tests/test_spatial_ppo.py on the 8-CPU mesh):

* the rollout's ACTIONS are bitwise those of ``PPO._rollout`` — the
  sampler draws the same flat ``[E]`` Gumbel vector replicated (same key
  stream), scatters it onto the slot table via the edge-id map, and
  resolves each node column with the same smallest-edge-index tie-break as
  ``ops.segment.segment_argmax``; the physics mirrors ``rl.env.env_step``
  with the bitwise-pinned shard formulations of ``shard_map_episode``
  (insert / withdraw / direction+confirm sections);
* rewards, the event-time clock and done flags are exact (integer
  occupancy comparisons psum'd);
* log-probs/losses/gradients match to float tolerance (local partial sums
  change summation order), so trained params track the unsharded
  ``PPO.train_iteration`` like ``ShardedPPO`` does.

Scope: the RL env semantics of ``rl.env.env_step`` with
``sim_cfg.insert_window is None`` (the whole-population insert the env
defaults to) and ``reward_mode`` in {"on_network", "system", "throughput",
"progress"} (``congested_potential`` needs a replicated BF refresh per step
— use the unsharded path); policy nets must be edge-row-independent (the
``ShardedPPO`` contract).  Roll-plan/fused-winner evaluation is not wired
here (RL-trainable networks sit far below the R >= 8192 gate).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..network import Network
from ..rl.env import EnvState, Observation
from ..rl.gae import gae, normalize
from ..rl.ppo import PPO, IterationMetrics, TrainState, Transition
from ..state import MetricState, SimState, init_metric_state, init_road_state
from .sharded_ppo import _out_tables_with_ids, node_sharded_loss_fn

AXIS = "shard"


def make_spatial_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (AXIS,))


class SpatialPPO:
    """Spatially-sharded training for an existing :class:`PPO` instance.

    ``train_iteration(ts)`` is a drop-in for ``PPO.train_iteration`` (same
    ``TrainState`` in and out, host-side road padding handled internally).
    """

    def __init__(self, ppo: PPO, mesh: Mesh):
        assert ppo.sim_cfg.insert_window is None, (
            "SpatialPPO mirrors the env's whole-population insert; "
            "windowed insertion is an episode-path optimization"
        )
        assert ppo.rl.reward_mode in (
            "on_network", "system", "throughput", "progress"
        ), f"unsupported reward_mode {ppo.rl.reward_mode!r} under shard_map"
        assert not ppo.rl.congested_potential, (
            "congested_potential recomputes a BF table per step; "
            "train unsharded or use reward_mode='system'"
        )
        self.ppo = ppo
        self.mesh = mesh
        self.S = S = int(mesh.devices.size)
        net: Network = ppo.network
        self.R = R = net.num_roads
        self.N = N = net.num_nodes
        self.E = int(net.num_full_edges)
        self.Rp = ((R + S - 1) // S) * S
        self.rl_blk = self.Rp // S

        # Node-column-sharded slot tables (+ edge ids for the action view).
        ok, dst, attr, eid = _out_tables_with_ids(net)
        kf, n = ok.shape
        npad = ((n + S - 1) // S) * S - n
        padc = lambda a, v: np.concatenate(  # noqa: E731
            [a, np.full((kf, npad), v, a.dtype)], axis=1
        ) if npad else a
        self._ok = jnp.asarray(padc(ok, False))
        self._dst = jnp.asarray(padc(dst, 0))
        self._attr = jnp.asarray(padc(attr, 0.0))
        self._eid = jnp.asarray(padc(eid, self.E))
        self._kf = kf

        # Road-padded statics (the shard_map_episode inert-row convention).
        pad = self.Rp - R
        p1 = lambda x, v: x if pad == 0 else jnp.concatenate(  # noqa: E731
            [x, jnp.full((pad,), v, x.dtype)]
        )
        pc = lambda x, v: x if pad == 0 else jnp.concatenate(  # noqa: E731
            [x, jnp.full((x.shape[0], pad), v, x.dtype)], axis=1
        )
        self._capp = p1(net.capacity, 0.0)
        self._ffp = p1(net.free_flow, 1.0)
        self._ccp = p1(net.congestion_constant, 1.0)
        self._road_dest_p = p1(net.road_dest, -1)
        self._in_src_p = pc(net.in_src_tab, 0)
        self._in_ok_p = pc(net.in_edge_ok, False)
        self._in_logit_p = pc(net.in_logit_tab, 0.0)
        self._outdeg_p = p1(
            net.out_edge_ok.sum(axis=0).astype(jnp.float32), 0.0
        )
        # Row-sharded free-flow distance block for the progress potential.
        if ppo.rl.reward_mode == "progress":
            assert ppo._dist_ff is not None
            rows = jnp.asarray(ppo._dist_ff)[:R]
            if pad:
                rows = jnp.concatenate(
                    [rows, jnp.full((pad, rows.shape[1]), 1e18, rows.dtype)]
                )
            self._dist_rows = rows  # [Rp, N]
        else:
            self._dist_rows = jnp.zeros((self.Rp, 1), jnp.float32)

        train, rollout = self._make_train()
        self._train = jax.jit(train)
        self._rollout = jax.jit(rollout)

    # ------------------------------------------------------------------
    def _specs(self, ts: TrainState):
        sim = ts.env.sim
        assert sim.backlog is None, "RL path carries no insert backlog"
        sim_spec = SimState(
            road=jax.tree.map(lambda _: P(AXIS), sim.road),
            agents=jax.tree.map(lambda _: P(), sim.agents),
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
            backlog=None,
            sel_dest=None if sim.sel_dest is None else P(),
        )
        env_spec = EnvState(
            sim=sim_spec, old_counts=P(AXIS), done=P(), phi=P()
        )
        obs_spec = Observation(
            node_features=P(), edge_features=P(), agent_index=P(), time=P()
        )
        ts_spec = TrainState(
            params=jax.tree.map(lambda _: P(), ts.params),
            opt_state=jax.tree.map(lambda _: P(), ts.opt_state),
            env=env_spec,
            obs=obs_spec,
            key=P(),
            iteration=P(),
        )
        metrics_spec = IterationMetrics(
            *([P()] * len(IterationMetrics._fields))
        )
        return ts_spec, metrics_spec

    # -- host-side road padding of the carried TrainState -------------------
    def _pad_ts(self, ts: TrainState) -> TrainState:
        pad = self.Rp - self.R
        if pad == 0:
            return ts
        p1 = lambda x, v: jnp.concatenate(  # noqa: E731
            [x, jnp.full((pad,) + x.shape[1:], v, x.dtype)]
        )
        pc = lambda x, v: jnp.concatenate(  # noqa: E731
            [x, jnp.full((x.shape[0], pad), v, x.dtype)], axis=1
        )
        sim = ts.env.sim
        rd = sim.road
        sim = sim._replace(
            road=rd._replace(
                fifo_ids=p1(rd.fifo_ids, 0),
                fifo_arrival=p1(rd.fifo_arrival, 0.0),
                fifo_departure=p1(rd.fifo_departure, 0.0),
                fifo_dest=p1(rd.fifo_dest, 0),
                head=p1(rd.head, 0),
                count=p1(rd.count, 0),
            ),
            metrics=sim.metrics._replace(
                hourly_counts=pc(sim.metrics.hourly_counts, 0),
                delta_tt_hourly=pc(sim.metrics.delta_tt_hourly, 0.0),
            ),
        )
        env = ts.env._replace(sim=sim, old_counts=p1(ts.env.old_counts, 0))
        return ts._replace(env=env)

    def _unpad_ts(self, ts: TrainState) -> TrainState:
        if self.Rp == self.R:
            return ts
        R = self.R
        sim = ts.env.sim
        rd = sim.road
        sim = sim._replace(
            road=rd._replace(
                fifo_ids=rd.fifo_ids[:R],
                fifo_arrival=rd.fifo_arrival[:R],
                fifo_departure=rd.fifo_departure[:R],
                fifo_dest=rd.fifo_dest[:R],
                head=rd.head[:R],
                count=rd.count[:R],
            ),
            metrics=sim.metrics._replace(
                hourly_counts=sim.metrics.hourly_counts[:, :R],
                delta_tt_hourly=sim.metrics.delta_tt_hourly[:, :R],
            ),
        )
        env = ts.env._replace(sim=sim, old_counts=ts.env.old_counts[:R])
        return ts._replace(env=env)

    # ------------------------------------------------------------------
    def _make_train(self):
        ppo = self.ppo
        net = ppo.network
        rl_cfg = ppo.rl
        sim_cfg = ppo.sim_cfg
        physics = ppo.physics
        R, N, E = self.R, self.N, self.E
        Rp, rl = self.Rp, self.rl_blk
        S, KF = self.S, self._kf
        KIN = net.in_src_tab.shape[0]
        capp, ffp, ccp = self._capp, self._ffp, self._ccp

        def halo(road_local):
            """All-gather the per-road head summary (shard_map_episode)."""
            count = road_local.count
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
            g = jax.lax.all_gather(local, AXIS, tiled=True)  # [Rp, 6]
            return (g[:, 0].astype(jnp.int32), g[:, 1], g[:, 2],
                    g[:, 3].astype(jnp.int32), g[:, 4].astype(jnp.int32),
                    g[:, 5].astype(jnp.int32))

        def context(sim: SimState, count_g, head_id_g):
            """Replicate ``PPO._context`` from the halo summary (the
            observation builders take count/head_ids overrides)."""
            from ..rl.observation import (
                agent_index,
                extra_node_features,
                node_features,
            )
            from ..schema import agent_features_matrix

            nf = node_features(sim, net, count=count_g)
            ai = agent_index(
                sim, net, rl_cfg.observe_pending_entrants, head_ids=head_id_g
            )
            agent_mat = agent_features_matrix(sim.agents)
            rows = agent_mat[ai]
            is_virtual = nf[:, 6:7] < 0
            keep = jnp.asarray(PPO._VIRTUAL_KEEP, jnp.float32)
            rows = jnp.where(is_virtual, rows * keep[None, :], rows)
            cols = [nf, rows]
            if rl_cfg.extra_obs:
                cols.append(
                    extra_node_features(sim, net, physics, count=count_g)
                )
            return jnp.concatenate(cols, axis=-1), nf, ai

        def step_local(env: EnvState, key, tab_ok, tab_dst, tab_attr,
                       tab_eid, dist_rows, params):
            """One RL transition on this shard (rl.env.env_step order:
            choice -> core -> withdraw -> insert), plus the policy sample."""
            idx = jax.lax.axis_index(AXIS)
            block0 = idx * rl
            rows_local = jnp.arange(rl, dtype=jnp.int32)
            key, k_sample = jax.random.split(key)
            sim = env.sim
            t = sim.time
            road = sim.road
            agents = sim.agents
            nmax = road.nmax
            A = agents.num_agents

            # ---- observation context (replicated) -----------------------
            head_id_g, head_arr_g, head_dep_g, count_g, head_g, head_dest_g \
                = halo(road)
            x = context(sim, count_g[:R], head_id_g[:R])[0]
            time_o = t.reshape(1)

            # ---- policy forward on the local node-column block ----------
            nb = tab_ok.shape[1]
            blk0n = idx * nb
            cols = blk0n + jnp.arange(nb, dtype=jnp.int32)
            src_flat = jnp.broadcast_to(cols[None, :], (KF, nb)).reshape(-1)
            dst_flat = tab_dst.reshape(-1)
            attr_flat = tab_attr.reshape(-1, 1)
            if ppo._policy_dist is not None:
                flat = ppo.policy_net.apply(
                    params["policy"], x, attr_flat, src_flat, dst_flat,
                    ppo._policy_dist,
                )
            else:
                flat = ppo.policy_net.apply(
                    params["policy"], x, attr_flat, src_flat, dst_flat
                )
            logit_blk = flat.reshape(KF, nb)

            # ---- sample: bitwise GraphDistribution.sample(k_sample) ------
            # Same flat [E] Gumbel vector (replicated), scattered onto the
            # slot table by edge id; ascending-slot strict-> == the
            # smallest-edge-index tie-break of segment_argmax.
            gumbel = jax.random.gumbel(k_sample, (E,), jnp.float32)
            g_pad = jnp.concatenate([gumbel, jnp.zeros((1,), jnp.float32)])
            score = jnp.where(
                tab_ok & jnp.isfinite(logit_blk),
                logit_blk + g_pad[tab_eid], -jnp.inf,
            )
            best = jnp.full((nb,), -jnp.inf, jnp.float32)
            slot = jnp.full((nb,), KF, jnp.int32)
            for k in range(KF):
                take = score[k] > best
                best = jnp.where(take, score[k], best)
                slot = jnp.where(take, k, slot)
            has = slot < KF
            eid_sel = jnp.full((nb,), E, jnp.int32)
            dst_sel = jnp.zeros((nb,), jnp.int32)
            for k in range(KF):
                eid_sel = jnp.where(slot == k, tab_eid[k], eid_sel)
                dst_sel = jnp.where(slot == k, tab_dst[k], dst_sel)
            act_local = jnp.zeros((E + 1,), jnp.int32).at[eid_sel].set(
                1, mode="drop"
            )
            action = jax.lax.psum(act_local, AXIS)[:E] > 0  # bool [E]

            # ---- log-prob of the sampled action (psum of local partials) -
            logits_m = jnp.where(tab_ok, logit_blk, -jnp.inf)
            has_edge = jnp.any(tab_ok, axis=0)
            m = jnp.max(logits_m, axis=0)
            m_safe = jnp.where(has_edge, m, 0.0)
            lse = m_safe + jnp.log(
                jnp.sum(jnp.exp(logits_m - m_safe[None, :]), axis=0)
                + jnp.where(has_edge, 0.0, 1.0)
            )
            lp_edge = logits_m - lse[None, :]
            act_tab1 = (
                jnp.arange(KF, dtype=jnp.int32)[:, None] == slot[None, :]
            ) & tab_ok
            log_prob = jax.lax.psum(
                jnp.sum(jnp.where(act_tab1, lp_edge, 0.0)), AXIS
            )

            # ---- value (replicated small MLP) ----------------------------
            value = ppo._value(params["value"], x, time_o)

            # ---- choice: apply the action (ExternalChoice semantics) -----
            winners = jnp.stack([dst_sel, has.astype(jnp.int32)], axis=1)
            win_g = jax.lax.all_gather(winners, AXIS, tiled=True)  # [Np, 2]
            sel = jnp.where(
                win_g[:N, 1] > 0, win_g[:N, 0], sim.selected_road
            ).astype(jnp.int32)

            last_people = head_id_g[:R]

            # ---- core: fused direction + confirm on the local road block
            # (shard_map_episode's bitwise-pinned formulation, gather form) -
            from ..core.direction import pack_upstream, upstream_pack_layout

            key_sim, k_dir = jax.random.split(sim.key)
            count_v_f = road.count.astype(jnp.float32)
            cap_l = jax.lax.dynamic_slice_in_dim(capp, block0, rl)
            ff_l = jax.lax.dynamic_slice_in_dim(ffp, block0, rl)
            cc_l = jax.lax.dynamic_slice_in_dim(ccp, block0, rl)
            space_ok = count_v_f < cap_l - physics.congestion_buffer
            v_free = cap_l - count_v_f
            v_slot_ok = count_v_f < cap_l
            v_global = block0 + rows_local

            shift_free, shift_sel, free_mask = upstream_pack_layout(R, nmax)
            sel_r = sel[:R]
            sel_enc = jnp.where(
                (sel_r >= 0) & (sel_r < R), sel_r, R
            ).astype(jnp.int32)
            if Rp > R:
                sel_enc = jnp.concatenate(
                    [sel_enc, jnp.full((Rp - R,), R, jnp.int32)]
                )
            pack = pack_upstream(
                head_dep_g, count_g, capp, sel_enc, t, physics, R, nmax
            )
            from ..core.rng import direction_gumbel

            gumbel_dir = direction_gumbel(k_dir, net)
            if Rp > R:
                gumbel_dir = jnp.concatenate(
                    [gumbel_dir, jnp.zeros((KIN, Rp - R), jnp.float32)],
                    axis=1,
                )
            gumbel_l = jax.lax.dynamic_slice(
                gumbel_dir, (0, block0), (KIN, rl)
            )
            best_c = jnp.full((rl,), -jnp.inf, jnp.float32)
            win_slot = jnp.zeros((rl,), jnp.int32)
            accept = jnp.zeros((rl,), bool)
            u_slices = []
            for k in range(KIN):
                u_k = jax.lax.dynamic_slice_in_dim(
                    self._in_src_p[k], block0, rl
                )
                u_slices.append(u_k)
                ok_k = jax.lax.dynamic_slice_in_dim(
                    self._in_ok_p[k], block0, rl
                )
                logit_k = jax.lax.dynamic_slice_in_dim(
                    self._in_logit_p[k], block0, rl
                )
                p_k = pack[u_k]
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
                take = s_k > best_c
                best_c = jnp.where(take, s_k, best_c)
                win_slot = jnp.where(take, k, win_slot)
                accept = accept | take
            win_u = jnp.zeros((rl,), jnp.int32)
            for k in range(KIN):
                win_u = jnp.where(win_slot == k, u_slices[k], win_u)
            win_u = jnp.where(accept, win_u, Rp)
            chosen = jnp.where(
                accept, head_id_g[jnp.minimum(win_u, Rp - 1)], 0
            )
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
            dest_v = jnp.where(
                accept, head_dest_g[jnp.minimum(win_u, Rp - 1)], 0
            )
            fifo_dst = road.fifo_dest.at[rows2, slot2].set(
                dest_v, mode="drop"
            )
            new_count = road.count + accept.astype(jnp.int32)

            winners_g = jax.lax.all_gather(
                jnp.where(accept, win_u, Rp), AXIS, tiled=True
            )  # [Rp]
            pops_full = jnp.zeros((Rp + 1,), bool).at[winners_g].set(True)
            popped = jax.lax.dynamic_slice_in_dim(pops_full, block0, rl)
            road = road._replace(
                fifo_ids=fifo_ids, fifo_arrival=fifo_arr,
                fifo_departure=fifo_dep, fifo_dest=fifo_dst,
                head=(road.head + popped.astype(jnp.int32)) % nmax,
                count=new_count - popped.astype(jnp.int32),
            )

            # road-optimality delta (env_step passes compute_delta =
            # record_road_optimality_hourly)
            if sim_cfg.record_road_optimality_hourly:
                outdeg_l = jax.lax.dynamic_slice_in_dim(
                    self._outdeg_p, block0, rl
                )
                ff_row = jax.lax.dynamic_slice_in_dim(ffp, block0, rl)
                hd_l = jax.lax.dynamic_slice_in_dim(head_dep_g, block0, rl)
                ha_l = jax.lax.dynamic_slice_in_dim(head_arr_g, block0, rl)
                delta_local = jnp.maximum((hd_l - ha_l) - ff_row, 0.0) \
                    * outdeg_l
            else:
                delta_local = None

            # ---- withdraw (shard_map_episode's hybrid slot scan) ----------
            from ..core.withdraw import _SLOT_UNROLL_MAX

            K = nmax if sim_cfg.withdraw_depth is None else min(
                sim_cfg.withdraw_depth, nmax
            )
            road_dest_local = jax.lax.dynamic_slice_in_dim(
                self._road_dest_p, block0, rl
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
                        dest_k = jnp.where(
                            at_k, road.fifo_dest, 0
                        ).sum(axis=1)
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
                    w_dep = jnp.take_along_axis(
                        road.fifo_departure, phys, axis=1
                    )
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
            if sim_cfg.withdraw_escalate and K < nmax:
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
            withdrew_local = wcount > 0
            agents = agents._replace(
                arrival=jnp.where(wd > 0, t, agents.arrival),
            )

            # ---- insert (whole-population, local scatter; entry follows
            # SELECTED_ROAD[origin] = the action's SRC-edge choice) ----------
            _, _, _, count_g2, head_g2, _ = halo(road)
            ready = (agents.departure <= t) & (~agents.on_way) \
                & (~agents.done)
            entry = sel[agents.origin]
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
            count_before = count_g2[safe]
            remaining = (
                capp[safe] - physics.congestion_buffer
                - count_before.astype(jnp.float32)
            ).astype(jnp.int32)
            ok_ins = (road_sorted < R) & (rank < remaining) & (remaining > 0)
            slot_i = (head_g2[safe] + count_before + rank) % nmax
            tc_i = ccp[safe] / (
                capp[safe] + physics.congestion_softening
                - count_before.astype(jnp.float32)
            )
            tt_ins = jnp.maximum(ffp[safe], tc_i)
            r_loc = road_sorted - block0
            ok_loc = ok_ins & (r_loc >= 0) & (r_loc < rl)
            rows_i = jnp.where(ok_loc, r_loc, rl)
            road = road._replace(
                fifo_ids=road.fifo_ids.at[rows_i, slot_i].set(
                    agent_sorted, mode="drop"
                ),
                fifo_arrival=road.fifo_arrival.at[rows_i, slot_i].set(
                    jnp.broadcast_to(t, (A,)), mode="drop"
                ),
                fifo_departure=road.fifo_departure.at[rows_i, slot_i].set(
                    t + tt_ins, mode="drop"
                ),
                fifo_dest=road.fifo_dest.at[rows_i, slot_i].set(
                    agents.dest[agent_sorted], mode="drop"
                ),
                count=road.count + jax.ops.segment_sum(
                    ok_loc.astype(jnp.int32), rows_i, num_segments=rl + 1
                )[:rl],
            )
            ins_ids = jnp.where(ok_loc, agent_sorted, A)
            ins_delta = jnp.zeros((A,), jnp.int32).at[ins_ids].set(
                1, mode="drop"
            )
            ins_delta = jax.lax.psum(ins_delta, AXIS)
            agents = agents._replace(
                inserted=agents.inserted | (ins_delta > 0)
            )

            # ---- reward (rl.env.env_step modes) ---------------------------
            new_counts = road.count
            arrived = agents.done[last_people]
            travel = agents.arrival[last_people] \
                - agents.departure[last_people]
            individual_reward = jnp.sum(jnp.where(
                arrived & (travel > 0),
                100.0 * 600.0 / jnp.maximum(travel, 1.0), 0.0,
            ))
            on_net_total = jax.lax.psum(
                jnp.sum(new_counts).astype(jnp.float32), AXIS
            )
            phi_after = env.phi
            if rl_cfg.reward_mode == "individual":
                reward = individual_reward
            elif rl_cfg.reward_mode == "system":
                pending = jnp.sum(
                    (agents.departure <= t) & (~agents.inserted)
                ).astype(jnp.float32)
                reward = -(on_net_total + pending) / rl_cfg.progress_scale
            elif rl_cfg.reward_mode == "throughput":
                reward = jax.lax.psum(
                    jnp.sum(wcount).astype(jnp.float32), AXIS
                )
            elif rl_cfg.reward_mode == "progress":
                col = jnp.arange(nmax, dtype=jnp.int32)[None, :]
                valid_q = ((col - road.head[:, None]) % nmax) \
                    < road.count[:, None]
                ids_q = jnp.where(valid_q, road.fifo_ids, 0)
                d = dist_rows[rows_local[:, None], agents.dest[ids_q]]
                d = d + ff_l[:, None]
                d = jnp.where(valid_q & (ids_q != 0) & (d < 1e17), d, 0.0)
                phi_after = jax.lax.psum(jnp.sum(d), AXIS)
                reward = (env.phi - phi_after) / rl_cfg.progress_scale
            else:  # "on_network"
                reward = -on_net_total

            # ---- event clock + done ---------------------------------------
            mism = jax.lax.psum(
                jnp.sum((env.old_counts != new_counts).astype(jnp.int32)),
                AXIS,
            )
            new_time = jnp.where(mism == 0, t + sim_cfg.timestep, t)
            done = new_time > rl_cfg.episode_end

            # ---- metrics ---------------------------------------------------
            hour = jnp.clip(
                (t / 3600.0).astype(jnp.int32), 0, sim_cfg.num_hours - 1
            )
            m = sim.metrics
            hourly = m.hourly_counts.at[hour].add(
                (withdrew_local | popped).astype(jnp.int32)
            )
            delta_hourly = m.delta_tt_hourly
            if delta_local is not None:
                delta_hourly = delta_hourly.at[hour].add(delta_local)
            done_total = m.done_before + jax.lax.psum(
                jnp.sum(wcount).astype(jnp.float32), AXIS
            )
            new_sim = sim._replace(
                road=road,
                agents=agents,
                selected_road=sel,
                time=new_time,
                key=key_sim,
                metrics=MetricState(
                    hourly_counts=hourly,
                    on_way_before=on_net_total,
                    done_before=done_total,
                    delta_tt_hourly=delta_hourly,
                ),
            )
            new_env = EnvState(
                sim=new_sim, old_counts=new_counts, done=done, phi=phi_after
            )

            # ---- auto-reset (PPO._rollout's lax.cond) ----------------------
            def do_reset(e: EnvState) -> EnvState:
                s = e.sim
                road0 = init_road_state(rl, nmax)
                agents0 = s.agents._replace(
                    inserted=jnp.zeros_like(s.agents.inserted),
                    arrival=jnp.zeros_like(s.agents.arrival),
                )
                m0 = init_metric_state(rl, sim_cfg.num_hours)
                s0 = s._replace(
                    road=road0,
                    agents=agents0,
                    time=jnp.asarray(rl_cfg.episode_start, jnp.float32),
                    metrics=m0,
                    choice_count=jnp.zeros((), jnp.int32),
                    insert_ptr=jnp.zeros((), jnp.int32),
                )
                # Empty roads: the progress potential of the reset state is 0.
                return EnvState(
                    sim=s0, old_counts=road0.count,
                    done=jnp.zeros((), bool), phi=jnp.zeros(()),
                )

            new_env = jax.lax.cond(done, do_reset, lambda e: e, new_env)

            tr = Transition(
                x=x, time=time_o, action=action, log_prob=log_prob,
                value=value, reward=reward, done=done,
                on_network=on_net_total,
            )
            return new_env, key, tr

        def body(ts: TrainState, tab_ok, tab_dst, tab_attr, tab_eid,
                 dist_rows):
            # ---- rollout ---------------------------------------------------
            def sstep(carry, _):
                env, key = carry
                env, key, tr = step_local(
                    env, key, tab_ok, tab_dst, tab_attr, tab_eid,
                    dist_rows, ts.params,
                )
                return (env, key), tr

            (env, key), traj = jax.lax.scan(
                sstep, (ts.env, ts.key), length=rl_cfg.rollout_steps
            )
            head_id_g, _, _, count_g, _, _ = halo(env.sim.road)
            x_last, nf_last, ai_last = context(
                env.sim, count_g[:R], head_id_g[:R]
            )
            last_value = ppo._value(
                ts.params["value"], x_last, env.sim.time.reshape(1)
            )

            # ---- GAE (replicated scalars) ----------------------------------
            advantages, returns = gae(
                traj.reward, traj.value, last_value, traj.done,
                rl_cfg.gamma, rl_cfg.gae_lambda,
            )
            advantages = normalize(advantages)

            # ---- update epochs (node-sharded minibatch gradients) ----------
            n = advantages.shape[0]
            mb = min(rl_cfg.minibatch_size, n)
            n_mb = max(n // mb, 1)

            def epoch(carry, _):
                params, opt_state, key = carry
                key, k_perm = jax.random.split(key)
                perm = jax.random.permutation(k_perm, n)

                def mb_step(carry, i):
                    params, opt_state = carry
                    idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                    batch = jax.tree.map(lambda a: a[idx], traj)
                    act_pad = jnp.concatenate(
                        [batch.action, jnp.zeros((mb, 1), bool)], axis=-1
                    )
                    act_tab = act_pad[..., tab_eid]
                    loss_fn = node_sharded_loss_fn(
                        ppo, S, KF, tab_ok, tab_dst, tab_attr, act_tab,
                        batch.x, batch.time, batch.log_prob,
                        advantages[idx], returns[idx], axis=AXIS,
                    )
                    (_, aux), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(params)
                    grads = jax.lax.psum(grads, AXIS)
                    updates, opt_state = ppo.tx.update(
                        grads, opt_state, params
                    )
                    params = optax.apply_updates(params, updates)
                    gnorm = optax.global_norm(grads)
                    return (params, opt_state), (aux[0], aux[1:], gnorm)

                (params, opt_state), stats = jax.lax.scan(
                    mb_step, (params, opt_state), jnp.arange(n_mb)
                )
                return (params, opt_state, key), stats

            (params, opt_state, key), stats = jax.lax.scan(
                epoch, (ts.params, ts.opt_state, key),
                length=rl_cfg.num_epochs,
            )
            loss, aux, gnorm = stats
            l_obj, l_crit, l_ent, kl, clip_frac = aux
            metrics = IterationMetrics(
                loss_objective=l_obj.mean(),
                loss_critic=l_crit.mean(),
                loss_entropy=l_ent.mean(),
                loss_total=loss.mean(),
                approx_kl=kl.mean(),
                clip_fraction=clip_frac.mean(),
                grad_norm=gnorm.mean(),
                avg_reward=traj.reward.mean(),
                avg_return=returns.mean(),
                avg_on_network=traj.on_network.mean(),
            )
            obs = Observation(
                node_features=nf_last,
                edge_features=net.full_attr.reshape(-1, 1),
                agent_index=ai_last,
                time=env.sim.time.reshape(1),
            )
            new_ts = TrainState(
                params=params, opt_state=opt_state, env=env, obs=obs,
                key=key, iteration=ts.iteration + 1,
            )
            return new_ts, metrics

        def rollout_body(ts: TrainState, tab_ok, tab_dst, tab_attr,
                         tab_eid, dist_rows):
            """Rollout only — the equality-test surface vs PPO._rollout."""
            def sstep(carry, _):
                env, key = carry
                env, key, tr = step_local(
                    env, key, tab_ok, tab_dst, tab_attr, tab_eid,
                    dist_rows, ts.params,
                )
                return (env, key), tr

            _, traj = jax.lax.scan(
                sstep, (ts.env, ts.key), length=rl_cfg.rollout_steps
            )
            return traj

        def train(ts: TrainState):
            ts_spec, metrics_spec = self._specs(ts)
            tab = P(None, AXIS)
            return shard_map(
                body, mesh=self.mesh,
                in_specs=(ts_spec, tab, tab, tab, tab, P(AXIS, None)),
                out_specs=(ts_spec, metrics_spec),
                check_vma=False,
            )(ts, self._ok, self._dst, self._attr, self._eid,
              self._dist_rows)

        def rollout(ts: TrainState):
            ts_spec, _ = self._specs(ts)
            tab = P(None, AXIS)
            traj_spec = Transition(*([P()] * len(Transition._fields)))
            return shard_map(
                rollout_body, mesh=self.mesh,
                in_specs=(ts_spec, tab, tab, tab, tab, P(AXIS, None)),
                out_specs=traj_spec,
                check_vma=False,
            )(ts, self._ok, self._dst, self._attr, self._eid,
              self._dist_rows)

        return train, rollout

    # ------------------------------------------------------------------
    def train_iteration(self, ts: TrainState):
        """One fully spatially-sharded PPO iteration (drop-in for
        ``PPO.train_iteration``; unsharded TrainState in and out)."""
        from ..ops.segment import no_pallas

        with no_pallas():
            new_ts, metrics = self._train(self._pad_ts(ts))
        return self._unpad_ts(new_ts), metrics

    def rollout(self, ts: TrainState) -> Transition:
        """Road/node-sharded rollout only (replicated trajectory out) —
        the equality-test surface vs ``PPO._rollout``."""
        from ..ops.segment import no_pallas

        with no_pallas():
            return self._rollout(self._pad_ts(ts))
