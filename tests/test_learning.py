"""PPO learning regression (VERDICT r1 #2): trained mpnn+ppo must measurably
improve routing on Braess.

Setup = the recorded demo (scripts/train_rl_demo.py): edge-MLP policy with
the reference's intended distance prior (mpnn_agent.py:84-113), dense
potential-based "progress" reward, gamma 0.98.  100 iterations take the
greedy policy from ~150 s avg travel / 0.43 relative Nash gap to ~123 s /
~0.17 (full demo run: 105.1 s / 0.001, vs classical dijkstra 105.2 s);
the assertions leave slack for seed drift.
"""
import os

import jax
import jax.numpy as jnp
import pytest

from tarl_tpu.config import RLConfig
from tarl_tpu.core.step import Policy, init_sim_state
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import ensure_scenario
from tarl_tpu.metrics.equilibrium import nash_gap
from tarl_tpu.models.mpnn import MPNNPolicyNet, MPNNValueNetSimple
from tarl_tpu.rl.ppo import PPO
from tarl_tpu.routing.policies import random_choice


def _eval(ppo, params, st, net, steps=9000):
    env, *_ = ppo.eval_rollout(params, st, jax.random.PRNGKey(0), steps)
    a = env.sim.agents
    done_n = int(a.done[1:].sum())
    att = float(
        jnp.where(a.done, a.arrival - a.departure, 0).sum() / max(done_n, 1)
    )
    gap = float(nash_gap(a, env.sim.road, net)["relative_gap"])
    return done_n, att, gap


def test_ppo_learns_braess_routing(tmp_path):
    base = ensure_scenario(str(tmp_path), "Braess")
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    st = init_sim_state(net, agents, policy=Policy(choice=random_choice))
    rl = RLConfig(rollout_steps=512, minibatch_size=128, num_epochs=4,
                  entropy_coef=0.003, learning_rate=1e-3,
                  reward_mode="progress", gamma=0.98, gae_lambda=0.9)
    pnet = MPNNPolicyNet(
        num_nodes=net.num_nodes, num_node_embeddings=net.num_roads + 1,
        use_distance_prior=True, prior_scale=30.0,
    )
    ppo = PPO(net, pnet, MPNNValueNetSimple(), rl=rl)
    ts = ppo.init(st, jax.random.PRNGKey(0))

    done0, att0, gap0 = _eval(ppo, ts.params, st, net)
    for _ in range(100):
        ts, _ = ppo.train_iteration(ts)
    done1, att1, gap1 = _eval(ppo, ts.params, st, net)

    assert done1 == 200, f"trained policy must deliver everyone, got {done1}"
    # Calibrated: untrained ~150 s / 0.43; 100 iters ~123 s / 0.17.
    assert att1 < att0 - 10, f"no learning: {att0:.1f} -> {att1:.1f}"
    assert att1 < 135.0, f"trained avg travel {att1:.1f} >= 135"
    assert gap1 < gap0, f"Nash gap did not shrink: {gap0:.3f} -> {gap1:.3f}"
    assert gap1 < 0.30, f"trained relative Nash gap {gap1:.3f} >= 0.30"
