"""Multi-device PPO training: env replicas over ``dp``, update batch over
``dp x sp``.

The reference is strictly single-process / single-device (SURVEY.md §2.10) —
its only "batching" is the 3-D observation reshape hack in the policy nets
(mpnn_agent.py:138-165).  Here the scale-out story is native SPMD:

* **Rollout phase (dp)**: ``num_envs`` independent environment replicas are
  stacked on a leading batch axis sharded over the ``dp`` mesh axis; the
  vmapped rollout partitions with zero communication (each device steps its
  own simulators).
* **Update phase (dp x sp)**: the ``[B, T]`` trajectory buffer is flattened
  to ``[B*T]`` and resharded over the *whole* mesh, so the PPO gradient
  all-reduce rides every ICI link; parameters are replicated.  Updates run
  as permuted minibatches over the flat buffer — the SAME algorithm as the
  single-env path (rl/ppo.py epoch/minibatch scans; reference
  rl/ppo_trainer.py:129-146 ReplayBuffer + SamplerWithoutReplacement) — so
  clip-fraction/KL statistics are comparable across num_envs.

All of it is one ``jax.jit`` with NamedSharding annotations — XLA GSPMD
inserts the collectives.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..rl.env import env_reset
from ..rl.gae import gae, normalize
from ..rl.ppo import PPO, IterationMetrics


class BatchTrainState(NamedTuple):
    params: Any           # replicated
    opt_state: Any        # replicated
    envs: Any             # EnvState leaves stacked [B, ...], sharded over dp
    obss: Any             # Observation leaves stacked [B, ...]
    keys: jnp.ndarray     # [B, 2] per-env PRNG keys
    update_key: jax.Array  # scalar key for minibatch permutations
    iteration: jnp.ndarray


class BatchedPPO:
    """Data-parallel PPO over a device mesh.

    Wraps a single-env :class:`~tarl_tpu.rl.ppo.PPO` (reusing its rollout and
    loss) and runs ``num_envs`` replicas per iteration.  ``num_envs`` must be
    a multiple of the mesh's ``dp`` size and ``rollout_steps * num_envs`` a
    multiple of ``dp * sp``.
    """

    def __init__(self, ppo: PPO, mesh: Mesh, num_envs: int):
        self.ppo = ppo
        self.mesh = mesh
        self.num_envs = num_envs
        dp = mesh.shape["dp"]
        sp = mesh.shape["sp"]
        assert num_envs % dp == 0, f"num_envs {num_envs} % dp {dp} != 0"
        assert (num_envs * ppo.rl.rollout_steps) % (dp * sp) == 0

        self._repl = NamedSharding(mesh, P())
        self._batch = NamedSharding(mesh, P("dp"))
        self._flat = NamedSharding(mesh, P(("dp", "sp")))

        BT = num_envs * ppo.rl.rollout_steps
        self.minibatch_size = min(ppo.rl.minibatch_size, BT)
        self.num_minibatches = max(BT // self.minibatch_size, 1)

        self._train_step = jax.jit(self._train_step_impl)

    # ------------------------------------------------------------------
    def init(self, sim_state, key: jax.Array) -> BatchTrainState:
        ts = self.ppo.init(sim_state, key)
        env0, obs0 = env_reset(ts.env.sim, self.ppo.network, self.ppo.rl,
                               self.ppo.physics, self.ppo._dist_ff)

        keys = jax.random.split(key, self.num_envs)

        def stack(leaf):
            return jnp.broadcast_to(leaf, (self.num_envs,) + leaf.shape)

        envs = jax.tree.map(stack, env0)
        # Decorrelate the per-env PRNG streams.
        sim_keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
            env0.sim.key, jnp.arange(self.num_envs)
        )
        envs = envs._replace(sim=envs.sim._replace(key=sim_keys))
        obss = jax.tree.map(stack, obs0)

        envs = jax.device_put(envs, self._batch)
        obss = jax.device_put(obss, self._batch)
        keys = jax.device_put(keys, self._batch)
        params = jax.device_put(ts.params, self._repl)
        opt_state = jax.device_put(ts.opt_state, self._repl)
        return BatchTrainState(
            params=params, opt_state=opt_state, envs=envs, obss=obss,
            keys=keys, update_key=jax.random.fold_in(key, 7),
            iteration=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def _train_step_impl(self, ts: BatchTrainState):
        from ..rl.env import env_reset  # noqa: F401 (kept for readability)
        from ..ops.segment import no_pallas

        with no_pallas():  # whole step traces under vmap (see ops.segment)
            return self._train_step_body(ts)

    def _train_step_body(self, ts: BatchTrainState):
        ppo = self.ppo
        B = self.num_envs
        T = ppo.rl.rollout_steps

        def one_rollout(env, obs, key):
            return ppo._rollout(ts.params, env, obs, key)

        envs, obss, keys, trajs, last_values = jax.vmap(one_rollout)(
            ts.envs, ts.obss, ts.keys
        )

        adv, ret = jax.vmap(
            lambda r, v, lv, d: gae(r, v, lv, d, ppo.rl.gamma, ppo.rl.gae_lambda)
        )(trajs.reward, trajs.value, last_values, trajs.done)

        # Flatten [B, T] -> [B*T] and respread over the whole mesh.
        flat = jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(
                a.reshape((B * T,) + a.shape[2:]), self._flat
            ),
            trajs,
        )
        adv = normalize(adv.reshape(B * T))
        ret = ret.reshape(B * T)

        # Permuted minibatches over the flat buffer — literally the same
        # update code as the single-env path (PPO._update_epochs; reference
        # rl/ppo_trainer.py:129-146) so clip/KL statistics are comparable
        # across num_envs.  Minibatches respread over the whole mesh when
        # evenly divisible.
        dp_sp = self.mesh.shape["dp"] * self.mesh.shape["sp"]
        mb_sharding = (
            self._flat if self.minibatch_size % dp_sp == 0 else self._repl
        )

        def constrain(a):
            return jax.lax.with_sharding_constraint(a, mb_sharding)

        (params, opt_state, upd_key), (loss, aux, gnorm) = ppo._update_epochs(
            ts.params, ts.opt_state, flat, adv, ret, ts.update_key,
            constrain=constrain,
        )
        l_obj, l_crit, l_ent, kl, clip_frac = aux

        metrics = IterationMetrics(
            loss_objective=l_obj.mean(),
            loss_critic=l_crit.mean(),
            loss_entropy=l_ent.mean(),
            loss_total=loss.mean(),
            approx_kl=kl.mean(),
            clip_fraction=clip_frac.mean(),
            grad_norm=gnorm.mean(),
            avg_reward=trajs.reward.mean(),
            avg_return=ret.mean(),
            avg_on_network=trajs.on_network.mean(),
        )
        new_ts = BatchTrainState(
            params=params, opt_state=opt_state, envs=envs, obss=obss,
            keys=keys, update_key=upd_key, iteration=ts.iteration + 1,
        )
        return new_ts, metrics

    def train_step(self, ts: BatchTrainState):
        """One jitted data-parallel PPO iteration over the mesh."""
        with self.mesh:
            return self._train_step(ts)

    # --- trainer-shell interface parity with rl.ppo.PPO -------------------
    train_iteration = train_step

    @property
    def network(self):
        return self.ppo.network

    @property
    def rl(self):
        return self.ppo.rl

    def eval_rollout(self, params, sim_state, key, num_steps: int,
                     deterministic: bool = True):
        """Single-env evaluation rollout (delegated)."""
        return self.ppo.eval_rollout(params, sim_state, key, num_steps,
                                     deterministic=deterministic)
