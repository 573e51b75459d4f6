"""Node-sharded PPO gradients (parallel.sharded_ppo): the shard_map loss
must reproduce PPO._loss's gradients to float tolerance on the 8-CPU mesh,
and a full sharded train iteration must track the unsharded one.
"""
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
from tarl_tpu.parallel.sharded_ppo import ShardedPPO, make_node_mesh
from tarl_tpu.rl.gae import gae, normalize
from tarl_tpu.rl.ppo import PPO
from tarl_tpu.routing.policies import random_choice


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sppo_scen"))
    base = ensure_scenario(root, "Braess")
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    state = init_sim_state(net, agents, policy=Policy(choice=random_choice))
    rl = RLConfig(rollout_steps=8, minibatch_size=4, num_epochs=2,
                  entropy_coef=0.01)
    ppo = PPO(
        net,
        MPNNPolicyNet(num_nodes=net.num_nodes,
                      num_node_embeddings=net.num_roads + 1),
        MPNNValueNetSimple(),
        rl=rl,
    )
    ts = ppo.init(state, jax.random.PRNGKey(0))
    return net, ppo, ts


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


@pytest.mark.slow
def test_sharded_grads_match_unsharded(setup):
    net, ppo, ts = setup
    mesh = make_node_mesh(8)
    sp = ShardedPPO(ppo, mesh)

    env, obs, key, traj, last_value = jax.jit(ppo._rollout)(
        ts.params, ts.env, ts.obs, ts.key
    )
    advantages, returns = gae(
        traj.reward, traj.value, last_value, traj.done,
        ppo.rl.gamma, ppo.rl.gae_lambda,
    )
    advantages = normalize(advantages)

    (loss_ref, aux_ref), grads_ref = jax.value_and_grad(
        ppo._loss, has_aux=True
    )(ts.params, traj, advantages, returns)
    (loss_sh, aux_sh), grads_sh = sp._grads(
        ts.params, traj, advantages, returns
    )
    assert float(loss_sh) == pytest.approx(float(loss_ref), rel=1e-5)
    # objective / critic / entropy / kl / clip-fraction all agree
    for a, b in zip(aux_ref, aux_sh):
        assert float(b) == pytest.approx(float(a), rel=1e-4, abs=1e-6)
    _tree_allclose(grads_ref, grads_sh)


def test_sharded_train_iteration_tracks_unsharded(setup):
    """Params after one full iteration track the unsharded ones.  Tolerance
    note: gradients agree to ~1e-6 (previous test), but Adam NORMALIZES —
    where a true gradient is ~0 (dead bias rows), a 1e-8 float-order
    difference flips the update sign and the per-step drift is O(lr)."""
    net, ppo, ts = setup
    mesh = make_node_mesh(8)
    sp = ShardedPPO(ppo, mesh)
    ts_ref, m_ref = ppo.train_iteration(ts)
    ts_sh, m_sh = sp.train_iteration(ts)
    assert float(m_sh.loss_total) == pytest.approx(
        float(m_ref.loss_total), rel=1e-4, abs=1e-6
    )
    _tree_allclose(ts_ref.params, ts_sh.params, rtol=1e-3, atol=5e-3)
    assert int(ts_sh.iteration) == int(ts.iteration) + 1


@pytest.fixture(scope="module")
def setup_transformer(tmp_path_factory):
    """The attention (GTConv) stack as policy+value nets — the case where
    logits are NOT edge-row-independent and the sharded loss must route
    through the slot-twin trunk with all_gather node halos (VERDICT r4 #7)."""
    from tarl_tpu.models.transformer.agent import (
        TransformerRoutePolicy,
        TransformerValueNet,
        network_positional_encoding,
    )

    root = str(tmp_path_factory.mktemp("sppo_tf_scen"))
    base = ensure_scenario(root, "Braess")
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    state = init_sim_state(net, agents, policy=Policy(choice=random_choice))
    rl = RLConfig(rollout_steps=8, minibatch_size=4, num_epochs=2,
                  entropy_coef=0.01)
    pe = network_positional_encoding(net, 8)
    ppo = PPO(
        net,
        TransformerRoutePolicy(pe=pe, hidden_dim=8, num_layers=2, num_heads=2),
        TransformerValueNet(pe=pe, hidden_dim=8, num_layers=1, num_heads=2),
        rl=rl, value_uses_graph=True,
    )
    ts = ppo.init(state, jax.random.PRNGKey(0))
    return net, ppo, ts


@pytest.mark.slow
def test_attention_sharded_grads_match_unsharded(setup_transformer):
    """Transformer-policy gradients under the node-sharded loss equal
    jax.grad(PPO._loss) to float tolerance (the twin reorders the softmax
    reductions, so ~1e-5, not bitwise)."""
    net, ppo, ts = setup_transformer
    mesh = make_node_mesh(8)
    sp = ShardedPPO(ppo, mesh)
    assert sp._attention

    env, obs, key, traj, last_value = jax.jit(ppo._rollout)(
        ts.params, ts.env, ts.obs, ts.key
    )
    advantages, returns = gae(
        traj.reward, traj.value, last_value, traj.done,
        ppo.rl.gamma, ppo.rl.gae_lambda,
    )
    advantages = normalize(advantages)

    (loss_ref, aux_ref), grads_ref = jax.value_and_grad(
        ppo._loss, has_aux=True
    )(ts.params, traj, advantages, returns)
    (loss_sh, aux_sh), grads_sh = sp._grads(
        ts.params, traj, advantages, returns
    )
    assert float(loss_sh) == pytest.approx(float(loss_ref), rel=1e-4)
    for a, b in zip(aux_ref, aux_sh):
        assert float(b) == pytest.approx(float(a), rel=1e-3, abs=1e-5)
    _tree_allclose(grads_ref, grads_sh, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_attention_sharded_train_iteration(setup_transformer):
    net, ppo, ts = setup_transformer
    mesh = make_node_mesh(8)
    sp = ShardedPPO(ppo, mesh)
    ts_ref, m_ref = ppo.train_iteration(ts)
    ts_sh, m_sh = sp.train_iteration(ts)
    assert float(m_sh.loss_total) == pytest.approx(
        float(m_ref.loss_total), rel=1e-3, abs=1e-5
    )
    _tree_allclose(ts_ref.params, ts_sh.params, rtol=1e-3, atol=5e-3)
    assert int(ts_sh.iteration) == int(ts.iteration) + 1
