"""PPO learning regression (VERDICT r1 #2): mpnn+ppo must learn routing on
Braess FROM SCRATCH (no distance prior).

Setup mirrors the recorded demo (scripts/train_rl_demo.py, docs/LEARNING.md)
minus the shortest-path prior, so the improvement is attributable to PPO:
untrained policies strand most agents (calibrated: 0-141 of 200 delivered,
avg travel >1400 s when any finish); 350 iterations reliably reach all-200
delivered at ~113-123 s / relative Nash gap 0.08-0.18 across seeds
(recalibrated for the slot-major sampling stream, core/direction.py — seed 0
needs more than the previous 200 iterations under the new stream).  The
full demo (with the corrected fftt+distance prior) starts AT the 105 s
equilibrium and training preserves it.
"""
import os

import pytest
import jax
import jax.numpy as jnp

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


@pytest.mark.slow
def test_ppo_learns_braess_routing_from_scratch(tmp_path):
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
        use_distance_prior=False,
    )
    ppo = PPO(net, pnet, MPNNValueNetSimple(), rl=rl)
    ts = ppo.init(st, jax.random.PRNGKey(0))

    done0, att0, gap0 = _eval(ppo, ts.params, st, net)
    for _ in range(350):
        ts, _ = ppo.train_iteration(ts)
    done1, att1, gap1 = _eval(ppo, ts.params, st, net)

    assert done1 == 200, f"trained policy must deliver everyone, got {done1}"
    # Calibrated margins (measured 112.9-122.6 s / gap 0.08-0.18 over seeds).
    assert att1 < 135.0, f"trained avg travel {att1:.1f} >= 135"
    assert gap1 < 0.30, f"trained relative Nash gap {gap1:.3f} >= 0.30"
    assert done0 < 200 or att1 < att0 - 10, (
        f"no learning: untrained ({done0} done, {att0:.1f}s) vs "
        f"trained ({done1} done, {att1:.1f}s)"
    )


@pytest.mark.slow
def test_ppo_learns_bottleneck_mixing(tmp_path):
    """Equilibrium-mixing regression (docs/LEARNING.md, Bottleneck): under
    the "system" reward (TSTT with the stranding exploit closed) and an
    entropy coefficient that keeps the two good routes mixed, the stochastic
    trained policy must deliver everyone and decisively beat both the
    untrained policy (~375 s, floods the fast route) and uniform random
    (~123 s, wastes a third of demand on the decoy).  Calibrated: 600
    iterations reach 81.8-89.9 s across seeds; classical dijkstra scores
    80.5 s (the full 1500-iteration demo reaches 73.4 s, beating it)."""
    from tarl_tpu.io.scenarios import bottleneck_scenario

    base = bottleneck_scenario(str(tmp_path))
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    st = init_sim_state(net, agents, policy=Policy(choice=random_choice))
    rl = RLConfig(rollout_steps=512, minibatch_size=128, num_epochs=4,
                  entropy_coef=0.03, learning_rate=1e-3,
                  reward_mode="system", progress_scale=100.0,
                  gamma=0.997, gae_lambda=0.95)
    pnet = MPNNPolicyNet(
        num_nodes=net.num_nodes, num_node_embeddings=net.num_roads + 1,
        use_distance_prior=True, prior_scale=30.0,
    )
    ppo = PPO(net, pnet, MPNNValueNetSimple(), rl=rl)
    ts = ppo.init(st, jax.random.PRNGKey(0))
    for _ in range(600):
        ts, _ = ppo.train_iteration(ts)

    env, *_ = ppo.eval_rollout(
        ts.params, st, jax.random.PRNGKey(3), 5000, deterministic=False
    )
    a = env.sim.agents
    done_n = int(a.done[1:].sum())
    att = float(
        jnp.where(a.done, a.arrival - a.departure, 0).sum() / max(done_n, 1)
    )
    assert done_n == agents.num_agents - 1, f"delivered {done_n}"
    assert att < 110.0, f"stochastic avg travel {att:.1f} >= 110"
