"""Fully in-graph PPO: rollout, GAE, clipped updates — one compiled program.

Replaces the reference's TorchRL pipeline (rl/ppo_trainer.py:12-160:
SyncDataCollector + GAE + ClipPPOLoss + ReplayBuffer + host epoch loop) with
idiomatic JAX: the rollout is a ``lax.scan`` of ``policy -> env_step``, the
update epochs/minibatches are nested scans, and the entire training iteration
— collect T transitions, compute advantages, run E epochs of clipped updates
— is a single jitted function.  There is no host<->device stepping anywhere
(the BASELINE.json north star).

Auto-reset: when an episode terminates mid-rollout the environment resets in
place (``lax.cond``), matching the collector's ``reset_at_each_iter`` +
done-masked GAE semantics.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import (
    DEFAULT_PHYSICS,
    DEFAULT_RL,
    DEFAULT_SIM,
    PhysicsConfig,
    RLConfig,
    SimConfig,
)
from ..network import Network
from ..schema import agent_features_matrix
from .distribution import GraphDistribution
from .env import EnvState, Observation, env_reset, env_step
from .gae import gae, normalize


class Transition(NamedTuple):
    """Per-step rollout record (the reference's tensordict rows)."""

    x: jnp.ndarray        # [N, 16] node context (policy/value input)
    time: jnp.ndarray     # [1]
    action: jnp.ndarray   # [Ef] bool multi-hot
    log_prob: jnp.ndarray  # []
    value: jnp.ndarray    # []
    reward: jnp.ndarray   # []
    done: jnp.ndarray     # [] bool
    on_network: jnp.ndarray  # [] — occupancy after the step (metrics only)


class TrainState(NamedTuple):
    params: Any              # {"policy": ..., "value": ...}
    opt_state: Any
    env: EnvState
    obs: Observation
    key: jax.Array
    iteration: jnp.ndarray   # int32[]


class IterationMetrics(NamedTuple):
    """Scalars logged per training iteration (mirrors the reference's
    TensorBoard scalar set, rl/ppo_trainer.py:41-87)."""

    loss_objective: jnp.ndarray
    loss_critic: jnp.ndarray
    loss_entropy: jnp.ndarray
    loss_total: jnp.ndarray
    approx_kl: jnp.ndarray
    clip_fraction: jnp.ndarray
    grad_norm: jnp.ndarray
    avg_reward: jnp.ndarray
    avg_return: jnp.ndarray
    avg_on_network: jnp.ndarray


class PPO:
    """Factory binding network/scenario statics into jitted train functions.

    Usage::

        ppo = PPO(network, policy_net, value_net, rl=RLConfig(...))
        ts = ppo.init(sim_state, jax.random.PRNGKey(0))
        ts, metrics = ppo.train_iteration(ts)      # jitted end-to-end
        actions = ppo.act(ts.params, obs, key)      # greedy/stochastic
    """

    def __init__(
        self,
        network: Network,
        policy_net,
        value_net,
        *,
        rl: RLConfig = DEFAULT_RL,
        sim_cfg: SimConfig = DEFAULT_SIM,
        physics: PhysicsConfig = DEFAULT_PHYSICS,
        optimizer: Optional[optax.GradientTransformation] = None,
        value_uses_graph: bool = False,
    ):
        self.network = network
        self.policy_net = policy_net
        self.value_net = value_net
        self.rl = rl
        self.sim_cfg = sim_cfg
        self.physics = physics
        self.value_uses_graph = value_uses_graph
        if optimizer is not None:
            tx = optimizer
        elif rl.lr_anneal_updates:
            # Terminal cosine lr anneal (config.RLConfig docstring): hold,
            # then decay to floor over the final lr_anneal_updates updates.
            lr = optax.join_schedules(
                [optax.constant_schedule(rl.learning_rate),
                 optax.cosine_decay_schedule(
                     rl.learning_rate, rl.lr_anneal_updates,
                     alpha=rl.lr_anneal_floor)],
                [max(rl.lr_anneal_start, 0)],
            )
            tx = optax.adam(lr)
        else:
            tx = optax.adam(rl.learning_rate)
        if rl.max_grad_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(rl.max_grad_norm), tx)
        self.tx = tx

        net = network
        self._edge_features = net.full_attr.reshape(-1, 1)
        self._edge_src = net.full_src
        self._edge_dst = net.full_dst
        self._num_nodes = net.num_nodes

        # Static free-flow all-pairs distances for potential-based shaping
        # (rl.reward_mode="progress") and/or the policy's distance prior
        # (MPNNPolicyNet.use_distance_prior); None otherwise.
        self._dist_ff = None
        if rl.reward_mode == "progress" or getattr(
            policy_net, "use_distance_prior", False
        ):
            from ..routing.bellman_ford import all_pairs_next_hop_nbr

            self._dist_ff, _ = all_pairs_next_hop_nbr(
                net.nbr, net.nbr_ok, net.entry_cost()
            )
        self._policy_dist = (
            self._dist_ff
            if getattr(policy_net, "use_distance_prior", False) else None
        )

        self._train_iteration = jax.jit(self._train_iteration_impl)
        self._eval_cache: dict = {}

    # ------------------------------------------------------------------
    def _policy_logits(self, policy_params, x):
        if self._policy_dist is not None:
            return self.policy_net.apply(
                policy_params, x, self._edge_features,
                self._edge_src, self._edge_dst, self._policy_dist,
            )
        return self.policy_net.apply(
            policy_params, x, self._edge_features, self._edge_src, self._edge_dst
        )

    def _value(self, value_params, x, time):
        if self.value_uses_graph:
            return self.value_net.apply(
                value_params, x, self._edge_features,
                self._edge_src, self._edge_dst, time,
            )
        return self.value_net.apply(value_params, x, time)

    def _dist(self, logits) -> GraphDistribution:
        return GraphDistribution(logits, self._edge_src, self._num_nodes)

    # Agent-row columns kept for VIRTUAL (SRC/DEST) nodes in the context:
    # origin + destination.  With observe_pending_entrants the surfaced agent
    # changes step to step; its demographics/time columns would make the
    # entry-edge logits flap (measured: Braess training gets stuck at the
    # 150 s route instead of finding the 105 s shortcut equilibrium).
    _VIRTUAL_KEEP = (1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)

    def _context(self, env: EnvState, obs: Observation) -> jnp.ndarray:
        """x[N, 16] = observation columns ++ FIFO-head agent row (routing
        columns only at virtual nodes, see _VIRTUAL_KEEP).  With
        ``rl.extra_obs`` the three congestion columns of
        ``observation.extra_node_features`` are appended (x[N, 19]) —
        mirrored exactly by ``learned_policy.rollout_context`` so trained
        params transfer verbatim to classical rollouts."""
        agent_mat = agent_features_matrix(env.sim.agents)
        rows = agent_mat[obs.agent_index]
        is_virtual = obs.node_features[:, 6:7] < 0  # ROAD_INDEX == -1
        keep = jnp.asarray(self._VIRTUAL_KEEP, jnp.float32)
        rows = jnp.where(is_virtual, rows * keep[None, :], rows)
        cols = [obs.node_features, rows]
        if self.rl.extra_obs:
            from .observation import extra_node_features

            cols.append(
                extra_node_features(env.sim, self.network, self.physics)
            )
        return jnp.concatenate(cols, axis=-1)

    # ------------------------------------------------------------------
    def init(self, sim_state, key: jax.Array) -> TrainState:
        env, obs = env_reset(sim_state, self.network, self.rl,
                             self.physics, self._dist_ff)
        k1, k2, k3 = jax.random.split(key, 3)
        x = self._context(env, obs)
        policy_params = self.policy_net.init(
            k1, x, self._edge_features, self._edge_src, self._edge_dst
        )
        if self.value_uses_graph:
            value_params = self.value_net.init(
                k2, x, self._edge_features, self._edge_src, self._edge_dst, obs.time
            )
        else:
            value_params = self.value_net.init(k2, x, obs.time)
        params = {"policy": policy_params, "value": value_params}
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            env=env,
            obs=obs,
            key=k3,
            iteration=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def _rollout(self, params, env, obs, key):
        """Collect ``rl.rollout_steps`` transitions via lax.scan."""

        def step(carry, _):
            env, obs, key = carry
            key, k_sample = jax.random.split(key)
            x = self._context(env, obs)
            logits = self._policy_logits(params["policy"], x)
            dist = self._dist(logits)
            action = dist.sample(k_sample)
            log_prob = dist.log_prob(action)
            value = self._value(params["value"], x, obs.time)

            env2, obs2, reward, done, info = env_step(
                env, action, self.network, self.rl, self.sim_cfg, self.physics,
                dist_ff=self._dist_ff,
            )
            env2, obs2 = jax.lax.cond(
                done,
                lambda: env_reset(env2.sim, self.network, self.rl,
                                  self.physics, self._dist_ff),
                lambda: (env2, obs2),
            )
            tr = Transition(
                x=x, time=obs.time, action=action, log_prob=log_prob,
                value=value, reward=reward, done=done,
                on_network=info["on_network"],
            )
            return (env2, obs2, key), tr

        (env, obs, key), traj = jax.lax.scan(
            step, (env, obs, key), length=self.rl.rollout_steps
        )
        x_last = self._context(env, obs)
        last_value = self._value(params["value"], x_last, obs.time)
        return env, obs, key, traj, last_value

    # ------------------------------------------------------------------
    def _loss(self, params, batch: Transition, advantages, returns):
        from ..ops.segment import no_pallas

        with no_pallas():  # vmapped segment ops must stay on XLA (see ops.segment)
            return self._loss_impl(params, batch, advantages, returns)

    def _loss_impl(self, params, batch: Transition, advantages, returns):
        logits = jax.vmap(lambda x: self._policy_logits(params["policy"], x))(
            batch.x
        )

        def lp_ent(lg, act):
            d = self._dist(lg)
            return d.log_prob(act), d.entropy()

        new_log_prob, entropy = jax.vmap(lp_ent)(logits, batch.action)
        log_ratio = new_log_prob - batch.log_prob
        ratio = jnp.exp(log_ratio)
        eps = self.rl.clip_epsilon
        obj = jnp.minimum(
            ratio * advantages,
            jnp.clip(ratio, 1.0 - eps, 1.0 + eps) * advantages,
        )
        loss_obj = -jnp.mean(obj)

        values = jax.vmap(
            lambda x, t: self._value(params["value"], x, t)
        )(batch.x, batch.time)
        loss_critic = jnp.mean((values - returns) ** 2)

        loss_entropy = -jnp.mean(entropy)
        total = (
            loss_obj
            + self.rl.value_coef * loss_critic
            + self.rl.entropy_coef * loss_entropy
        )
        approx_kl = jnp.mean((ratio - 1.0) - log_ratio)
        clip_frac = jnp.mean((jnp.abs(ratio - 1.0) > eps).astype(jnp.float32))
        return total, (loss_obj, loss_critic, loss_entropy, approx_kl, clip_frac)

    # ------------------------------------------------------------------
    def _update_epochs(self, params, opt_state, buffer, advantages, returns,
                       key, constrain=None):
        """``num_epochs`` x permuted-minibatch clipped updates over a flat
        transition buffer (reference rl/ppo_trainer.py:129-146: ReplayBuffer
        + SamplerWithoutReplacement).  Shared by the single-env and the
        multi-device (BatchedPPO) paths so both run the SAME algorithm;
        ``constrain`` lets the sharded caller pin minibatch layout."""
        constrain = constrain or (lambda a: a)
        n = advantages.shape[0]
        mb = min(self.rl.minibatch_size, n)
        n_mb = max(n // mb, 1)

        def epoch(carry, _):
            params, opt_state, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, n)

            def mb_step(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                batch = jax.tree.map(lambda a: constrain(a[idx]), buffer)
                (loss, aux), grads = jax.value_and_grad(
                    self._loss, has_aux=True
                )(params, batch, advantages[idx], returns[idx])
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                gnorm = optax.global_norm(grads)
                return (params, opt_state), (loss, aux, gnorm)

            (params, opt_state), stats = jax.lax.scan(
                mb_step, (params, opt_state), jnp.arange(n_mb)
            )
            return (params, opt_state, key), stats

        return jax.lax.scan(
            epoch, (params, opt_state, key), length=self.rl.num_epochs
        )

    def _train_iteration_impl(self, ts: TrainState):
        env, obs, key, traj, last_value = self._rollout(
            ts.params, ts.env, ts.obs, ts.key
        )
        advantages, returns = gae(
            traj.reward, traj.value, last_value, traj.done,
            self.rl.gamma, self.rl.gae_lambda,
        )
        advantages = normalize(advantages)

        (params, opt_state, key), stats = self._update_epochs(
            ts.params, ts.opt_state, traj, advantages, returns, key
        )
        loss, (l_obj, l_crit, l_ent, kl, clip_frac), gnorm = stats

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
        """One jitted PPO iteration: rollout + GAE + epochs of updates."""
        return self._train_iteration(ts)

    # ------------------------------------------------------------------
    def act(self, params, env: EnvState, obs: Observation, key=None,
            deterministic: bool = True) -> jnp.ndarray:
        """Action for evaluation rollouts (ExplorationType.MODE / RANDOM,
        rl/ppo_trainer.py:89-102)."""
        x = self._context(env, obs)
        dist = self._dist(self._policy_logits(params["policy"], x))
        if deterministic:
            return dist.mode()
        return dist.sample(key)

    def eval_rollout(self, params, sim_state, key, num_steps: int,
                     deterministic: bool = True):
        """Greedy/stochastic evaluation episode, fully on device.

        Returns ``(env_state, rewards [T], dones [T], logs)`` where ``logs``
        is a dict of per-step series (arrivals, on_network, time) — the data
        the classical path records for the leg histogram
        (transportation_simulator.py:344-349).
        """
        cache_key = (num_steps, deterministic)
        run = self._eval_cache.get(cache_key)
        if run is None:
            # One jitted program per (length, mode): defining the closure
            # inline per call would make every eval a fresh trace.
            @jax.jit
            def run(params, sim_state, key):
                env, obs = env_reset(sim_state, self.network, self.rl,
                                     self.physics, self._dist_ff)

                def step(carry, _):
                    env, obs, key = carry
                    key, k = jax.random.split(key)
                    action = self.act(params, env, obs, k, deterministic)
                    env, obs, reward, done, info = env_step(
                        env, action, self.network, self.rl, self.sim_cfg,
                        self.physics, dist_ff=self._dist_ff,
                    )
                    out = (reward, done, info["arrivals"], info["on_network"],
                           env.sim.time)
                    return (env, obs, key), out

                (env, obs, key), (rewards, dones, arrivals, on_net, times) = (
                    jax.lax.scan(step, (env, obs, key), length=num_steps)
                )
                return env, rewards, dones, arrivals, on_net, times

            self._eval_cache[cache_key] = run

        env, rewards, dones, arrivals, on_net, times = run(params, sim_state, key)
        logs = {"arrivals": arrivals, "on_network": on_net, "time": times}
        return env, rewards, dones, logs
