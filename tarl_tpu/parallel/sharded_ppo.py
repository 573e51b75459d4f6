"""Spatially-sharded PPO updates: the clipped-PPO gradient under shard_map
over the NODE axis of the dual graph (VERDICT r3 #4; SURVEY §2.10's final
rung — training a policy while its graph is road/node-sharded).

Decomposition.  The policy loss factorizes over source-node groups:

* ``log_prob(action) = sum_g (logit_chosen_g - logsumexp_g)``,
* ``entropy = sum_g H_g``,

so each shard evaluates the policy forward ONLY for its node-column block
of the slot-major out-edge table (``rl.learned_policy.full_out_tables``
layout — groups are columns and never split across shards), computes its
partial log-prob/entropy sums, and ONE ``psum`` per quantity yields the
global values.  The PPO ratio/clip arithmetic then runs replicated (its
parameter dependence flows only through each shard's local sums, so the
final gradient ``psum`` reassembles exactly the full policy gradient); the
replicated critic path is scaled ``1/S`` for the same reason.  The value
forward stays replicated — it is a small MLP over the node context, and
sharding it would save nothing.

Numerics: the slot-major flat edge order changes float SUMMATION order vs
``PPO._loss``'s edge-list order, so gradients match to float32 tolerance
(~1e-6 relative), not bitwise — the equality bar VERDICT r3 set.

The rollout keeps the in-graph env semantics of :class:`~tarl_tpu.rl.ppo.
PPO` (unsharded: the RL env's event-time clock is global control flow);
road-sharded ROLLOUTS for trained policies are the classical-episode path
(parallel.shard_map_episode with a learned Policy).  What this module adds
is the memory-heavy half of training at scale: the forward/backward over
the edge set is node-sharded, with gradients psum'd over ICI.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..rl.gae import gae, normalize
from ..rl.ppo import PPO, IterationMetrics, TrainState

AXIS = "node_shard"


def make_node_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (AXIS,))


def _out_tables_with_ids(network):
    """Slot-major full out-edge tables + the EDGE ID per slot (host-side):
    ``(ok[KF, N], dst[KF, N], attr[KF, N], eid[KF, N])`` with ``eid = E``
    on padding slots (maps to the appended always-False action column)."""
    src = np.asarray(network.full_src)
    dst = np.asarray(network.full_dst)
    attr = np.asarray(network.full_attr)
    n = network.num_nodes
    e_n = src.shape[0]
    groups: list[list[int]] = [[] for _ in range(n)]
    for e, s in enumerate(src):
        groups[int(s)].append(e)
    kf = max(1, max((len(g) for g in groups), default=1))
    ok = np.zeros((kf, n), dtype=bool)
    dst_tab = np.zeros((kf, n), dtype=np.int32)
    attr_tab = np.zeros((kf, n), dtype=np.float32)
    eid = np.full((kf, n), e_n, dtype=np.int32)
    for g, es in enumerate(groups):
        for s, e in enumerate(es):
            ok[s, g] = True
            dst_tab[s, g] = dst[e]
            attr_tab[s, g] = attr[e]
            eid[s, g] = e
    return ok, dst_tab, attr_tab, eid


def node_sharded_loss_fn(ppo, S: int, kf: int, tab_ok, tab_dst, tab_attr,
                         act_tab, x, time, old_lp, adv, ret, axis: str = AXIS,
                         logits_fn=None):
    """Build ``loss_fn(params) -> (total_local, aux)`` for the node-sharded
    clipped-PPO loss.  MUST be called INSIDE a ``shard_map`` over ``axis``
    whose operands are this shard's node-column block of the slot-major
    tables (``tab_*[KF, nb]``, ``act_tab[mb, KF, nb]``); ``x/time/old_lp/
    adv/ret`` are the replicated minibatch.  Gradients of ``total_local``,
    psum'd over ``axis``, equal ``jax.grad(PPO._loss)`` to float tolerance
    (see module docstring for the stop_gradient psum routing).

    Shared by :class:`ShardedPPO` (update-only sharding) and
    :class:`~tarl_tpu.parallel.spatial_ppo.SpatialPPO` (the fully
    spatially-sharded training iteration).
    ``aux = (total, loss_obj, loss_critic, loss_entropy, approx_kl,
    clip_fraction)``.

    ``logits_fn(params_policy, x_t) -> [KF, nb]`` overrides the policy
    forward for nets that are NOT edge-row-independent — the attention
    stack's slot-twin trunk with per-layer ``all_gather`` node halos
    (:meth:`ShardedPPO._attention_logits_fn`): each shard produces its
    node-column block's out-slot logits from the bitwise-full node state,
    and the log-prob/entropy psum routing below is unchanged (every edge
    is scored on exactly one shard; halo transposes scatter the node-state
    cotangents back to the producing shard, so the final grad psum is the
    full gradient).
    """
    nb = tab_ok.shape[1]
    blk0 = jax.lax.axis_index(axis) * nb
    cols = blk0 + jnp.arange(nb, dtype=jnp.int32)
    src_flat = jnp.broadcast_to(cols[None, :], (kf, nb)).reshape(-1)
    dst_flat = tab_dst.reshape(-1)
    attr_flat = tab_attr.reshape(-1, 1)

    def loss_fn(params):
        def one(x_t, act_t):
            if logits_fn is not None:
                flat = logits_fn(params["policy"], x_t).reshape(-1)
            elif ppo._policy_dist is not None:
                flat = ppo.policy_net.apply(
                    params["policy"], x_t, attr_flat, src_flat,
                    dst_flat, ppo._policy_dist,
                )
            else:
                flat = ppo.policy_net.apply(
                    params["policy"], x_t, attr_flat, src_flat,
                    dst_flat,
                )
            logits = jnp.where(tab_ok, flat.reshape(kf, nb), -jnp.inf)
            has_edge = jnp.any(tab_ok, axis=0)
            m = jnp.max(logits, axis=0)
            m_safe = jnp.where(has_edge, m, 0.0)
            lse = m_safe + jnp.log(
                jnp.sum(jnp.exp(logits - m_safe[None, :]), axis=0)
                + jnp.where(has_edge, 0.0, 1.0)  # empty: log(1)=0
            )
            lp_edge = logits - lse[None, :]
            act = act_t & tab_ok
            lp_loc = jnp.sum(jnp.where(act, lp_edge, 0.0))
            p = jnp.where(tab_ok, jnp.exp(lp_edge), 0.0)
            ent_loc = jnp.sum(jnp.where(p > 0, -p * lp_edge, 0.0))
            return lp_loc, ent_loc

        lp_loc, ent_loc = jax.vmap(one)(x, act_tab)
        # Global sums whose VALUE is the psum but whose gradient
        # flows only through the shard's own partial (coefficient
        # exactly 1), so the final grad psum reassembles the full
        # gradient independent of psum's transpose convention.
        lp_glob = jax.lax.psum(lp_loc, axis)
        new_lp = lp_loc + jax.lax.stop_gradient(lp_glob - lp_loc)
        ent_glob = jax.lax.psum(ent_loc, axis)
        entropy = ent_loc + jax.lax.stop_gradient(ent_glob - ent_loc)

        log_ratio = new_lp - old_lp
        ratio = jnp.exp(log_ratio)
        eps = ppo.rl.clip_epsilon
        obj = jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1.0 - eps, 1.0 + eps) * adv,
        )
        loss_obj = -jnp.mean(obj)
        values = jax.vmap(
            lambda x_t, t: ppo._value(params["value"], x_t, t)
        )(x, time)
        loss_critic = jnp.mean((values - ret) ** 2)
        loss_entropy = -jnp.mean(entropy)
        # Per-shard grad shares: policy/entropy terms flow through
        # the LOCAL sums (psum transpose hands each shard its
        # additive share); the critic path is replicated, so /S
        # makes the final grad psum exact.
        total_local = (
            loss_obj
            + ppo.rl.value_coef * loss_critic / S
            + ppo.rl.entropy_coef * loss_entropy
        )
        total = (
            loss_obj
            + ppo.rl.value_coef * loss_critic
            + ppo.rl.entropy_coef * loss_entropy
        )
        approx_kl = jnp.mean((ratio - 1.0) - log_ratio)
        clip_frac = jnp.mean(
            (jnp.abs(ratio - 1.0) > eps).astype(jnp.float32)
        )
        return total_local, (
            total, loss_obj, loss_critic, loss_entropy, approx_kl,
            clip_frac,
        )

    return loss_fn


class ShardedPPO:
    """Node-sharded gradient steps for an existing :class:`PPO` instance.

    ``train_iteration(ts)`` mirrors ``PPO._train_iteration_impl`` —
    same rollout, GAE, permuted minibatches and optax updates — with every
    minibatch gradient computed under ``shard_map`` (same PRNG streams, so
    resulting params match the unsharded iteration to float tolerance).
    """

    def __init__(self, ppo: PPO, mesh: Mesh):
        self.ppo = ppo
        self.mesh = mesh
        self.S = int(mesh.devices.size)
        net = ppo.network
        ok, dst, attr, eid = _out_tables_with_ids(net)
        kf, n = ok.shape
        npad = ((n + self.S - 1) // self.S) * self.S - n
        pad = lambda a, v: np.concatenate(  # noqa: E731
            [a, np.full((kf, npad), v, a.dtype)], axis=1
        ) if npad else a
        self._ok = jnp.asarray(pad(ok, False))
        self._dst = jnp.asarray(pad(dst, 0))
        self._attr = jnp.asarray(pad(attr, 0.0))
        self._eid = jnp.asarray(pad(eid, net.num_full_edges))
        self._kf = kf
        self._np = n + npad

        # Attention nets (GTConv): the flat-edge-subset forward above is
        # wrong for them (their logits are not edge-row-independent), so the
        # policy forward routes through the slot-twin trunk with per-layer
        # all_gather node halos instead (VERDICT r4 #7; the same twin the
        # sharded ROLLOUT uses, models/transformer/slot_forward.py).  The
        # twin's out-slot layout equals _out_tables_with_ids' (both group
        # the full edge list by source in edge-id order), so act_tab/ok
        # masks line up column-for-column.
        self._attention = not getattr(ppo.policy_net,
                                      "edge_row_independent", True)
        if self._attention:
            from ..models.transformer.slot_forward import (
                SlotEdgeTables,
                slot_edge_tables,
                slot_twin,
            )

            tabs = slot_edge_tables(net)
            padc = lambda a, v: jnp.concatenate(  # noqa: E731
                [a, jnp.full(a.shape[:1] + (npad,) + a.shape[2:], v,
                             a.dtype)], axis=1
            ) if npad else a
            self._slot_tabs = SlotEdgeTables(
                in_ok=padc(tabs.in_ok, False),
                in_src=padc(tabs.in_src, 0),
                in_attr=padc(tabs.in_attr, 0.0),
                out_ok=padc(tabs.out_ok, False),
                out_dst=padc(tabs.out_dst, 0),
                out_attr=padc(tabs.out_attr, 0.0),
            )
            assert int(self._slot_tabs.out_ok.shape[0]) == kf
            # The twin adds pe_emb(pe) to every node row — pad to Np.
            pe = np.asarray(ppo.policy_net.pe)
            pe_p = np.concatenate(
                [pe, np.zeros((npad, pe.shape[1]), pe.dtype)]
            ) if npad else pe
            twin = slot_twin(ppo.policy_net)
            self._slot_net = twin.__class__(
                pe=pe_p, hidden_dim=twin.hidden_dim,
                num_layers=twin.num_layers, num_heads=twin.num_heads,
                gate=twin.gate,
            )
        self._train = jax.jit(self._train_iteration_impl)

    def _attention_logits_fn(self):
        """Per-shard slot-twin forward: [KF, nb] out-slot logits for this
        shard's node-column block, from the bitwise-full node state (the
        per-layer sync = all_gather of the block's updated columns).  The
        padded slot tables ride as replicated closure constants; the twin
        slices its own columns."""
        npad_n = self._np
        nb = npad_n // self.S
        tabs = self._slot_tabs
        slot_net = self._slot_net

        def sync(h_cols):
            return jax.lax.all_gather(h_cols, AXIS, tiled=True)  # [Np, hid]

        def logits_fn(params_policy, x_t):
            blk0 = jax.lax.axis_index(AXIS) * nb
            cols = blk0 + jnp.arange(nb, dtype=jnp.int32)
            x_p = jnp.concatenate([
                x_t, jnp.zeros((npad_n - x_t.shape[0],) + x_t.shape[1:],
                               x_t.dtype)
            ]) if npad_n > x_t.shape[0] else x_t
            return slot_net.apply(params_policy, x_p, tabs, cols, sync=sync)

        return logits_fn

    # -- slot-major action view -------------------------------------------
    def _action_table(self, action: jnp.ndarray) -> jnp.ndarray:
        """bool[..., E] multi-hot -> bool[..., KF, Np] slot-major."""
        act_pad = jnp.concatenate(
            [action, jnp.zeros(action.shape[:-1] + (1,), bool)], axis=-1
        )
        return act_pad[..., self._eid]

    # -- the sharded loss ---------------------------------------------------
    def _grads(self, params, batch, advantages, returns):
        """(loss, aux), grads — psum'd over the node axis; equals
        ``jax.grad(PPO._loss)`` to float tolerance."""
        ppo = self.ppo
        act_tab = self._action_table(batch.action)

        logits_fn = self._attention_logits_fn() if self._attention else None

        def body(params, tab_ok, tab_dst, tab_attr, act_tab, x, time,
                 old_lp, adv, ret):
            loss_fn = node_sharded_loss_fn(
                ppo, self.S, self._kf, tab_ok, tab_dst, tab_attr,
                act_tab, x, time, old_lp, adv, ret,
                logits_fn=logits_fn,
            )
            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            grads = jax.lax.psum(grads, AXIS)
            return grads, aux

        from ..ops.segment import no_pallas

        with no_pallas():  # vmapped segment ops inside the net stay on XLA
            sharded = shard_map(
                body,
                mesh=self.mesh,
                in_specs=(
                    P(), P(None, AXIS), P(None, AXIS), P(None, AXIS),
                    P(None, None, AXIS), P(), P(), P(), P(), P(),
                ),
                out_specs=(P(), P()),
                check_vma=False,
            )
            grads, aux = sharded(
                params, self._ok, self._dst, self._attr, act_tab,
                batch.x, batch.time, batch.log_prob, advantages, returns,
            )
        total = aux[0]
        return (total, aux[1:]), grads

    # -- PPO iteration with sharded minibatch gradients ---------------------
    def _update_epochs(self, params, opt_state, buffer, advantages, returns,
                       key):
        ppo = self.ppo
        n = advantages.shape[0]
        mb = min(ppo.rl.minibatch_size, n)
        n_mb = max(n // mb, 1)

        def epoch(carry, _):
            params, opt_state, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, n)

            def mb_step(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                batch = jax.tree.map(lambda a: a[idx], buffer)
                (loss, aux), grads = self._grads(
                    params, batch, advantages[idx], returns[idx]
                )
                updates, opt_state = ppo.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                gnorm = optax.global_norm(grads)
                return (params, opt_state), (loss, aux, gnorm)

            (params, opt_state), stats = jax.lax.scan(
                mb_step, (params, opt_state), jnp.arange(n_mb)
            )
            return (params, opt_state, key), stats

        return jax.lax.scan(
            epoch, (params, opt_state, key), length=ppo.rl.num_epochs
        )

    def _train_iteration_impl(self, ts: TrainState):
        ppo = self.ppo
        env, obs, key, traj, last_value = ppo._rollout(
            ts.params, ts.env, ts.obs, ts.key
        )
        advantages, returns = gae(
            traj.reward, traj.value, last_value, traj.done,
            ppo.rl.gamma, ppo.rl.gae_lambda,
        )
        advantages = normalize(advantages)
        (params, opt_state, key), stats = self._update_epochs(
            ts.params, ts.opt_state, traj, advantages, returns, key
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
        new_ts = TrainState(
            params=params, opt_state=opt_state, env=env, obs=obs, key=key,
            iteration=ts.iteration + 1,
        )
        return new_ts, metrics

    def train_iteration(self, ts: TrainState):
        """One jitted PPO iteration with node-sharded gradient steps."""
        return self._train(ts)
