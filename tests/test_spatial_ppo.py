"""Fully spatially-sharded PPO (parallel.spatial_ppo): the road-sharded
rollout must reproduce PPO._rollout's trajectory — ACTIONS bitwise, rewards
and the event clock exact — and a full train iteration must track the
unsharded one, on the 8-CPU mesh.
"""
import os

import jax
import numpy as np
import pytest

from tarl_tpu.config import RLConfig
from tarl_tpu.core.step import Policy, init_sim_state
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import ensure_scenario
from tarl_tpu.models.mpnn import MPNNPolicyNet, MPNNValueNetSimple
from tarl_tpu.parallel.spatial_ppo import SpatialPPO, make_spatial_mesh
from tarl_tpu.rl.ppo import PPO
from tarl_tpu.routing.policies import random_choice


def _setup(reward_mode: str, tmp_root: str):
    base = ensure_scenario(tmp_root, "Braess")
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    state = init_sim_state(net, agents, policy=Policy(choice=random_choice))
    rl = RLConfig(rollout_steps=8, minibatch_size=4, num_epochs=2,
                  entropy_coef=0.01, reward_mode=reward_mode)
    ppo = PPO(
        net,
        MPNNPolicyNet(num_nodes=net.num_nodes,
                      num_node_embeddings=net.num_roads + 1),
        MPNNValueNetSimple(),
        rl=rl,
    )
    ts = ppo.init(state, jax.random.PRNGKey(0))
    return net, ppo, ts


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    return _setup("on_network", str(tmp_path_factory.mktemp("spat_scen")))


def _tree_allclose(a, b, rtol=2e-5, atol=1e-6):
    oks = jax.tree.map(
        lambda x, y: np.allclose(np.asarray(x), np.asarray(y),
                                 rtol=rtol, atol=atol), a, b,
    )
    assert jax.tree.reduce(lambda p, q: p and q, oks, True), (
        jax.tree.map(
            lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()),
            a, b,
        )
    )


def test_spatial_rollout_matches_unsharded(setup):
    net, ppo, ts = setup
    mesh = make_spatial_mesh(8)
    sp = SpatialPPO(ppo, mesh)

    _, _, _, traj_ref, _ = jax.jit(ppo._rollout)(
        ts.params, ts.env, ts.obs, ts.key
    )
    traj_sp = sp.rollout(ts)

    # Discrete outcomes are bitwise: same action stream, same event clock.
    assert np.array_equal(np.asarray(traj_sp.action),
                          np.asarray(traj_ref.action))
    assert np.array_equal(np.asarray(traj_sp.done),
                          np.asarray(traj_ref.done))
    assert np.array_equal(np.asarray(traj_sp.on_network),
                          np.asarray(traj_ref.on_network))
    np.testing.assert_array_equal(np.asarray(traj_sp.reward),
                                  np.asarray(traj_ref.reward))
    np.testing.assert_array_equal(np.asarray(traj_sp.time),
                                  np.asarray(traj_ref.time))
    # Context/logits agree; log-probs to float tolerance (summation order).
    np.testing.assert_allclose(np.asarray(traj_sp.x),
                               np.asarray(traj_ref.x), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(traj_sp.log_prob),
                               np.asarray(traj_ref.log_prob),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(traj_sp.value),
                               np.asarray(traj_ref.value),
                               rtol=1e-5, atol=1e-6)


def test_spatial_train_iteration_tracks_unsharded(setup):
    """Params after one full spatially-sharded iteration track the unsharded
    ones (same tolerance rationale as test_sharded_ppo: Adam normalizes, so
    ~1e-6 gradient noise on dead rows drifts O(lr))."""
    net, ppo, ts = setup
    mesh = make_spatial_mesh(8)
    sp = SpatialPPO(ppo, mesh)
    ts_ref, m_ref = ppo.train_iteration(ts)
    ts_sp, m_sp = sp.train_iteration(ts)
    assert float(m_sp.avg_reward) == pytest.approx(
        float(m_ref.avg_reward), rel=1e-6
    )
    assert float(m_sp.loss_total) == pytest.approx(
        float(m_ref.loss_total), rel=1e-4, abs=1e-6
    )
    _tree_allclose(ts_ref.params, ts_sp.params, rtol=1e-3, atol=5e-3)
    assert int(ts_sp.iteration) == int(ts.iteration) + 1
    # The carried env state is exact (bitwise physics).
    np.testing.assert_array_equal(
        np.asarray(ts_sp.env.sim.road.count),
        np.asarray(ts_ref.env.sim.road.count),
    )
    assert float(ts_sp.env.sim.time) == float(ts_ref.env.sim.time)


@pytest.mark.slow
def test_spatial_progress_reward_matches(tmp_path_factory):
    """The potential-based progress reward (psum'd local potentials) matches
    the unsharded fifo_potential stream."""
    net, ppo, ts = _setup(
        "progress", str(tmp_path_factory.mktemp("spat_prog"))
    )
    mesh = make_spatial_mesh(8)
    sp = SpatialPPO(ppo, mesh)
    _, _, _, traj_ref, _ = jax.jit(ppo._rollout)(
        ts.params, ts.env, ts.obs, ts.key
    )
    traj_sp = sp.rollout(ts)
    assert np.array_equal(np.asarray(traj_sp.action),
                          np.asarray(traj_ref.action))
    np.testing.assert_allclose(np.asarray(traj_sp.reward),
                               np.asarray(traj_ref.reward),
                               rtol=1e-6, atol=1e-5)
