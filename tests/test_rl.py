"""RL stack tests: distribution law, env contract, in-graph PPO training.

Mirrors the reference's rl_metrics_test.py pattern (drive _reset/_step
manually, assert time progress / parameter updates / metric logs) plus
distribution-law checks the reference lacks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tarl_tpu.config import RLConfig, SimConfig
from tarl_tpu.core.step import init_sim_state, Policy
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import ensure_scenario
from tarl_tpu.models.mpnn import MPNNPolicyNet, MPNNValueNet, MPNNValueNetSimple
from tarl_tpu.rl.distribution import GraphDistribution
from tarl_tpu.rl.env import env_reset, env_step
from tarl_tpu.rl.ppo import PPO
from tarl_tpu.routing.policies import random_choice

import os


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rl_scen"))
    base = ensure_scenario(root, "TwoLink")
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    state = init_sim_state(net, agents, policy=Policy(choice=random_choice))
    return net, agents, state


class TestGraphDistribution:
    def _dist(self):
        # 2 groups: node 0 has edges {0,1,2}, node 1 has edge {3}; node 2 none.
        logits = jnp.array([1.0, 2.0, 0.5, 0.0])
        src = jnp.array([0, 0, 0, 1], dtype=jnp.int32)
        return GraphDistribution(logits, src, num_nodes=3)

    def test_probs_normalize_per_group(self):
        d = self._dist()
        p = np.asarray(d.probs())
        assert p[:3].sum() == pytest.approx(1.0)
        assert p[3] == pytest.approx(1.0)

    def test_sample_one_per_group(self):
        d = self._dist()
        for i in range(10):
            a = np.asarray(d.sample(jax.random.PRNGKey(i)))
            assert a[:3].sum() == 1
            assert a[3] == 1

    def test_sample_law(self):
        """Empirical frequencies track the per-group softmax."""
        d = self._dist()
        keys = jax.random.split(jax.random.PRNGKey(0), 3000)
        acts = jax.vmap(d.sample)(keys)
        freq = np.asarray(acts[:, :3].mean(axis=0))
        expected = np.asarray(d.probs())[:3]
        np.testing.assert_allclose(freq, expected, atol=0.03)

    def test_mode(self):
        a = np.asarray(self._dist().mode())
        np.testing.assert_array_equal(a, [False, True, False, True])

    def test_log_prob_valid_and_invalid(self):
        d = self._dist()
        valid = jnp.array([False, True, False, True])
        lp = float(d.log_prob(valid))
        expect = float(np.log(np.asarray(d.probs())[1]) + 0.0)
        assert lp == pytest.approx(expect, abs=1e-5)
        invalid = jnp.array([True, True, False, True])  # two in group 0
        assert float(d.log_prob(invalid)) == -np.inf

    def test_entropy_matches_manual(self):
        d = self._dist()
        p = np.asarray(d.probs())
        manual = -(p[:3] * np.log(p[:3])).sum()  # group 1 has entropy 0
        assert float(d.entropy()) == pytest.approx(manual, abs=1e-5)


class TestEnv:
    def test_reset_and_step(self, setup):
        net, agents, state = setup
        rl = RLConfig()
        env, obs = env_reset(state, net, rl)
        assert float(env.sim.time) == rl.episode_start
        assert obs.node_features.shape == (net.num_nodes, 7)
        assert obs.agent_index.shape == (net.num_nodes,)

        action = jnp.zeros((net.num_full_edges,), bool)
        env2, obs2, reward, done, info = env_step(env, action, net, rl)
        assert jnp.isfinite(reward)
        assert not bool(done)
        # The pending agent inserts during the step -> occupancy changed ->
        # the event-time clock must NOT advance (rl.py:269-272).
        assert float(env2.sim.time) == rl.episode_start
        assert float(reward) == -1.0  # one agent on the network
        # Second step: occupancy stable -> clock advances.
        env3, *_ = env_step(env2, action, net, rl)
        assert float(env3.sim.time) == rl.episode_start + 1

    def test_action_writes_selected_road(self, setup):
        net, agents, state = setup
        env, obs = env_reset(state, net, RLConfig())
        action = jnp.zeros((net.num_full_edges,), bool).at[0].set(True)
        env2, *_ = env_step(env, action, net, RLConfig())
        u = int(net.full_src[0])
        v = int(net.full_dst[0])
        assert int(env2.sim.selected_road[u]) == v

    def test_done_past_horizon(self, setup):
        net, agents, state = setup
        rl = RLConfig()
        env, obs = env_reset(state, net, rl)
        env = env._replace(sim=env.sim._replace(
            time=jnp.asarray(float(rl.episode_end) + 1.0, jnp.float32)))
        action = jnp.zeros((net.num_full_edges,), bool)
        env2, _, _, done, _ = env_step(env, action, net, rl)
        assert bool(done)


class TestPPO:
    def test_train_iteration_updates_params(self, setup):
        net, agents, state = setup
        rl = RLConfig(rollout_steps=8, minibatch_size=4, num_epochs=2)
        policy_net = MPNNPolicyNet(
            num_nodes=net.num_nodes, num_node_embeddings=net.num_roads + 1
        )
        value_net = MPNNValueNetSimple()
        ppo = PPO(net, policy_net, value_net, rl=rl)
        ts = ppo.init(state, jax.random.PRNGKey(0))
        p0 = jax.tree.map(lambda a: np.asarray(a).copy(), ts.params)
        ts2, metrics = ppo.train_iteration(ts)
        assert int(ts2.iteration) == 1
        assert np.isfinite(float(metrics.loss_total))
        assert np.isfinite(float(metrics.approx_kl))
        changed = jax.tree.reduce(
            lambda acc, leaf: acc or bool(leaf),
            jax.tree.map(
                lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
                p0, ts2.params,
            ),
            False,
        )
        assert changed, "parameters must update"

    def test_train_iteration_with_extra_obs(self, setup):
        """RLConfig.extra_obs widens the context to [N, 16+3] end-to-end:
        init + one jitted training iteration stay finite."""
        net, agents, state = setup
        rl = RLConfig(rollout_steps=8, minibatch_size=4, extra_obs=True)
        ppo = PPO(
            net,
            MPNNPolicyNet(num_nodes=net.num_nodes,
                          num_node_embeddings=net.num_roads + 1),
            MPNNValueNetSimple(),
            rl=rl,
        )
        ts = ppo.init(state, jax.random.PRNGKey(0))
        x = ppo._context(ts.env, ts.obs)
        assert x.shape[1] == 16 + 3
        ts2, metrics = ppo.train_iteration(ts)
        assert np.isfinite(float(metrics.loss_total))

    def test_graph_value_net(self, setup):
        net, agents, state = setup
        rl = RLConfig(rollout_steps=4, minibatch_size=4, num_epochs=1)
        policy_net = MPNNPolicyNet(
            num_nodes=net.num_nodes, num_node_embeddings=net.num_roads + 1,
            mode="embedding",
        )
        value_net = MPNNValueNet(num_nodes=net.num_nodes)
        ppo = PPO(net, policy_net, value_net, rl=rl, value_uses_graph=True)
        ts = ppo.init(state, jax.random.PRNGKey(1))
        ts2, metrics = ppo.train_iteration(ts)
        assert np.isfinite(float(metrics.loss_total))

    def test_eval_rollout(self, setup):
        net, agents, state = setup
        rl = RLConfig(rollout_steps=4)
        ppo = PPO(
            net,
            MPNNPolicyNet(num_nodes=net.num_nodes,
                          num_node_embeddings=net.num_roads + 1),
            MPNNValueNetSimple(),
            rl=rl,
        )
        ts = ppo.init(state, jax.random.PRNGKey(0))
        env, rewards, dones, logs = ppo.eval_rollout(
            ts.params, state, jax.random.PRNGKey(2), 6
        )
        assert logs["arrivals"].shape == (6,)
        assert rewards.shape == (6,)
        assert np.all(np.isfinite(np.asarray(rewards)))


class TestCheckpoint:
    def test_save_restore_roundtrip(self, setup, tmp_path):
        from tarl_tpu.rl.checkpoint import save_checkpoint, restore_checkpoint

        net, agents, state = setup
        rl = RLConfig(rollout_steps=4, minibatch_size=4)
        ppo = PPO(
            net,
            MPNNPolicyNet(num_nodes=net.num_nodes,
                          num_node_embeddings=net.num_roads + 1),
            MPNNValueNetSimple(),
            rl=rl,
        )
        ts = ppo.init(state, jax.random.PRNGKey(0))
        ts, _ = ppo.train_iteration(ts)
        path = str(tmp_path / "ckpt_1")
        save_checkpoint(path, ts.params, ts.opt_state, 1)
        restored = restore_checkpoint(
            path,
            template={"params": ts.params, "opt_state": ts.opt_state,
                      "iteration": 0},
        )
        assert int(restored["iteration"]) == 1
        a = jax.tree.leaves(ts.params)[0]
        b = jax.tree.leaves(restored["params"])[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestTrainerShell:
    @pytest.mark.slow
    def test_ppo_train_logs_equilibrium_and_episode_vc(self, setup, tmp_path):
        """ppo_train writes eval/relative_nash_gap + eval/tstt and the
        episode-averaged (not snapshot) V/C scalars to metrics.csv
        (VERDICT r1 #9 / weak #6)."""
        import csv

        from tarl_tpu.rl.trainer import ppo_train

        net, agents, state = setup
        rl = RLConfig(rollout_steps=8, minibatch_size=8, num_epochs=1)
        ppo = PPO(
            net,
            MPNNPolicyNet(num_nodes=net.num_nodes,
                          num_node_embeddings=net.num_roads + 1),
            MPNNValueNetSimple(),
            rl=rl,
        )
        log_dir = str(tmp_path / "logs")
        ppo_train(ppo, state, num_iterations=2, rl=rl, log_dir=log_dir,
                  eval_interval=1, verbose=False)
        with open(os.path.join(log_dir, "metrics.csv")) as f:
            rows = list(csv.DictReader(f))
        cols = set().union(*(r.keys() for r in rows))
        assert "eval/relative_nash_gap" in cols
        assert "eval/tstt" in cols
        assert "eval/avg_travel_time" in cols
        assert "transport/avg_vc_ratio" in cols
        vals = [float(r["eval/relative_nash_gap"]) for r in rows
                if r.get("eval/relative_nash_gap") not in (None, "")]
        assert vals and all(np.isfinite(v) for v in vals)

    @pytest.mark.slow
    def test_track_best_stochastic_scalar(self, setup, tmp_path):
        """track_best matches tag-prefixed scalars: an eval_stochastic/...
        target selects on the stochastic pass (the Bottleneck mixing demo
        deploys stochastically) and records it in best.json."""
        import json

        from tarl_tpu.rl.trainer import ppo_train

        net, agents, state = setup
        rl = RLConfig(rollout_steps=8, minibatch_size=8, num_epochs=1)
        ppo = PPO(
            net,
            MPNNPolicyNet(num_nodes=net.num_nodes,
                          num_node_embeddings=net.num_roads + 1),
            MPNNValueNetSimple(),
            rl=rl,
        )
        ckpt = str(tmp_path / "ckpt")
        ppo_train(ppo, state, num_iterations=2, rl=rl,
                  log_dir=str(tmp_path / "logs2"), eval_interval=1,
                  verbose=False, stochastic_eval=True, checkpoint_dir=ckpt,
                  track_best="eval_stochastic/avg_travel_time")
        with open(os.path.join(ckpt, "best.json")) as f:
            info = json.load(f)
        assert info["metric"] == "eval_stochastic/avg_travel_time"
        assert np.isfinite(info["value"])
        assert os.path.exists(os.path.join(ckpt, "best"))


class TestEMATrainer:
    def test_ema_eval_and_final_checkpoint(self, setup, tmp_path):
        """rl.trainer ema_decay: evals/selection run on EMA weights, a
        final_ema checkpoint is written, and the EMA params differ from the
        raw final iterate (the anti-churn device, VERDICT r3 #9)."""
        from tarl_tpu.config import RLConfig
        from tarl_tpu.models.mpnn import MPNNPolicyNet, MPNNValueNetSimple
        from tarl_tpu.rl.checkpoint import restore_checkpoint
        from tarl_tpu.rl.ppo import PPO
        from tarl_tpu.rl.trainer import ppo_train

        net, agents, state = setup
        rl = RLConfig(rollout_steps=8, minibatch_size=4, num_epochs=1)
        ppo = PPO(
            net,
            MPNNPolicyNet(num_nodes=net.num_nodes,
                          num_node_embeddings=net.num_roads + 1),
            MPNNValueNetSimple(),
            rl=rl,
        )
        ckpt = str(tmp_path / "ckpt")
        ts = ppo_train(
            ppo, state, num_iterations=4, rl=rl, verbose=False,
            checkpoint_dir=ckpt, checkpoint_interval=100,
            eval_interval=2, eval_steps=8,
            track_best="eval/avg_travel_time", ema_decay=0.9,
        )
        final_ema = os.path.join(ckpt, "final_ema")
        assert os.path.exists(final_ema)
        restored = restore_checkpoint(
            final_ema, template={"params": ts.params,
                                 "opt_state": ts.opt_state, "iteration": 0}
        )
        import numpy as _np

        diff = jax.tree.reduce(
            max,
            jax.tree.map(
                lambda a, b: float(_np.abs(_np.asarray(a)
                                           - _np.asarray(b)).max()),
                restored["params"], ts.params,
            ),
            0.0,
        )
        assert diff > 0.0, "EMA params must lag the raw iterate"
        assert os.path.exists(os.path.join(ckpt, "best.json"))
