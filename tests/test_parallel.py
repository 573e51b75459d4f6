"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 'multi-node story')."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tarl_tpu.config import RLConfig
from tarl_tpu.core.step import Policy, init_sim_state
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import ensure_scenario
from tarl_tpu.models.mpnn import MPNNPolicyNet, MPNNValueNetSimple
from tarl_tpu.parallel.mesh import make_mesh
from tarl_tpu.parallel.shard import BatchedPPO
from tarl_tpu.rl.ppo import PPO
from tarl_tpu.routing.policies import random_choice


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("par_scen"))
    base = ensure_scenario(root, "TwoLink")
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    state = init_sim_state(net, agents, policy=Policy(choice=random_choice))
    return net, state


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["dp"] * mesh.shape["sp"] == 8
    mesh = make_mesh(2)
    assert mesh.shape["sp"] == 1


@pytest.mark.slow
def test_batched_ppo_train_step(setup):
    net, state = setup
    assert jax.device_count() == 8, "conftest must force an 8-device CPU mesh"
    mesh = make_mesh(8)  # dp=4, sp=2
    rl = RLConfig(rollout_steps=8, minibatch_size=8, num_epochs=1)
    ppo = PPO(
        net,
        MPNNPolicyNet(num_nodes=net.num_nodes,
                      num_node_embeddings=net.num_roads + 1),
        MPNNValueNetSimple(),
        rl=rl,
    )
    bp = BatchedPPO(ppo, mesh, num_envs=4)
    # Updates are permuted minibatches over the flat [B*T] buffer — same
    # algorithm as single-env (reference ppo_trainer.py:129-146).
    assert bp.minibatch_size == 8
    assert bp.num_minibatches == (4 * 8) // 8
    ts = bp.init(state, jax.random.PRNGKey(0))
    # env leaves carry the dp sharding
    spec = ts.envs.sim.road.count.sharding.spec
    assert spec[0] == "dp"
    ts2, metrics = bp.train_step(ts)
    assert int(ts2.iteration) == 1
    assert np.isfinite(float(metrics.loss_total))
    # params stay replicated
    leaf = jax.tree.leaves(ts2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_batched_ppo_minibatch_algorithm_matches_single_env(setup):
    """With num_envs=1 the batched trainer must run the exact single-env
    update: same shared ``PPO._update_epochs`` code, same minibatch count,
    and — given the same rollout buffer and update key — identical params."""
    net, state = setup
    rl = RLConfig(rollout_steps=16, minibatch_size=4, num_epochs=2)
    ppo = PPO(
        net,
        MPNNPolicyNet(num_nodes=net.num_nodes,
                      num_node_embeddings=net.num_roads + 1),
        MPNNValueNetSimple(),
        rl=rl,
    )
    mesh = make_mesh(1)
    bp = BatchedPPO(ppo, mesh, num_envs=1)
    assert bp.num_minibatches == 16 // 4

    # Drive the shared update path directly with one rollout's buffer: the
    # batched trainer invokes PPO._update_epochs verbatim, so equal inputs
    # must give bitwise-equal parameters.
    ts = ppo.init(state, jax.random.PRNGKey(0))
    env, obs, key, traj, last_value = ppo._rollout(
        ts.params, ts.env, ts.obs, ts.key
    )
    from tarl_tpu.rl.gae import gae, normalize

    adv, ret = gae(traj.reward, traj.value, last_value, traj.done,
                   rl.gamma, rl.gae_lambda)
    adv = normalize(adv)
    k_upd = jax.random.PRNGKey(42)
    (p1, _, _), stats1 = ppo._update_epochs(
        ts.params, ts.opt_state, traj, adv, ret, k_upd
    )
    (p2, _, _), stats2 = ppo._update_epochs(
        ts.params, ts.opt_state, traj, adv, ret, k_upd,
        constrain=lambda a: jax.lax.with_sharding_constraint(
            a, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        ),
    )
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # stats leaves are [num_epochs, num_minibatches]
    assert jax.tree.leaves(stats1)[0].shape == (2, 4)


def test_batched_envs_decorrelated(setup):
    net, state = setup
    mesh = make_mesh(8)
    rl = RLConfig(rollout_steps=8, minibatch_size=8)
    ppo = PPO(
        net,
        MPNNPolicyNet(num_nodes=net.num_nodes,
                      num_node_embeddings=net.num_roads + 1),
        MPNNValueNetSimple(),
        rl=rl,
    )
    bp = BatchedPPO(ppo, mesh, num_envs=4)
    ts = bp.init(state, jax.random.PRNGKey(0))
    keys = np.asarray(ts.envs.sim.key)
    assert len({tuple(k) for k in keys}) == 4, "per-env PRNG streams must differ"


def test_sharded_episode_matches_unsharded(tmp_path_factory):
    """The same episode run with road/agent state sharded across 8 devices
    produces the same trajectory (same program, same PRNG stream)."""
    import os
    from tarl_tpu.config import SimConfig
    from tarl_tpu.core.step import run_episode, init_sim_state
    from tarl_tpu.io.matsim import load_network, load_population
    from tarl_tpu.io.scenarios import ensure_scenario
    from tarl_tpu.parallel.sharded_episode import (
        pad_agents, run_episode_sharded, shard_sim_state,
    )

    root = str(tmp_path_factory.mktemp("shard_scen"))
    base = ensure_scenario(root, "Grid4x4")
    net = load_network(os.path.join(base, "network"))
    assert net.num_roads % 8 == 0  # 48 roads over 8 devices
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    agents = pad_agents(agents, 8)
    assert agents.num_agents % 8 == 0

    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 400,
                    record_road_optimality=False)
    from tarl_tpu.routing.policies import random_choice
    from tarl_tpu.core.step import Policy

    policy = Policy(choice=random_choice)
    state = init_sim_state(net, agents, sim=sim, policy=policy)

    ref, _ = run_episode(state, net, policy, 400, sim=sim)

    mesh = make_mesh(8)
    sharded_final, _ = run_episode_sharded(state, net, policy, 400, mesh, sim=sim)

    np.testing.assert_array_equal(
        np.asarray(ref.agents.done), np.asarray(sharded_final.agents.done)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.road.count), np.asarray(sharded_final.road.count)
    )
    np.testing.assert_allclose(
        np.asarray(ref.agents.arrival), np.asarray(sharded_final.agents.arrival)
    )
    # The road shards really live on different devices.
    spec = sharded_final.road.count.sharding
    assert not spec.is_fully_replicated
