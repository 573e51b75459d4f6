"""Road-optimality observability (VERDICT r1 #3): the O(H*R) on-device
hourly congestion-delay accumulator must agree with the per-tick [T, R]
series, and the artifact must survive runs where the per-tick series is
disabled."""
import os

import jax
import numpy as np
import pytest

from tarl_tpu.config import SimConfig
from tarl_tpu.core.step import Policy, init_sim_state, run_episode
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import ensure_scenario
from tarl_tpu.routing.policies import random_choice


@pytest.fixture(scope="module")
def grid(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("obs_scen"))
    base = ensure_scenario(root, "Grid4x4")
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    return net, agents


def _run(net, agents, steps, **sim_kw):
    sim = SimConfig(start_time=6 * 3600, timestep=1, **sim_kw)
    policy = Policy(choice=random_choice)
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    return run_episode(state, net, policy, steps, sim=sim)


def test_hourly_delta_matches_per_tick_series(grid):
    net, agents = grid
    final, logs = _run(net, agents, 600)
    per_tick = np.asarray(logs.road_delta_tt)            # [T, R]
    assert per_tick.shape == (600, net.num_roads)
    hourly = np.asarray(final.metrics.delta_tt_hourly)   # [H, R]
    np.testing.assert_allclose(
        hourly.sum(axis=0), per_tick.sum(axis=0), rtol=1e-5, atol=1e-3
    )
    assert per_tick.sum() > 0.0, "random routing on Grid4x4 must congest"


def test_hourly_delta_survives_disabled_per_tick_series(grid):
    net, agents = grid
    final, logs = _run(net, agents, 600, record_road_optimality=False)
    assert np.asarray(logs.road_delta_tt).size == 0
    hourly = np.asarray(final.metrics.delta_tt_hourly)
    assert hourly.sum() > 0.0

    # Same seed/config => same accumulated delay as the per-tick run.
    final2, _ = _run(net, agents, 600)
    np.testing.assert_allclose(
        hourly, np.asarray(final2.metrics.delta_tt_hourly), rtol=1e-6
    )


def test_env_step_accumulates_hourly_delta(grid):
    """The RL env path (choice->core->withdraw->insert) logs the same
    road-optimality series (reference rl.py:279-294)."""
    import jax.numpy as jnp

    from tarl_tpu.config import RLConfig
    from tarl_tpu.rl.env import env_reset, env_step

    net, agents = grid
    sim = SimConfig(start_time=6 * 3600, timestep=1)
    state = init_sim_state(net, agents, sim=sim,
                           policy=Policy(choice=random_choice))
    rl = RLConfig(episode_start=6 * 3600)
    env, obs = env_reset(state, net, rl)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def steps(env, key):
        def body(carry, _):
            env, key = carry
            key, k = jax.random.split(key)
            action = jax.random.bernoulli(k, 0.5, (net.full_src.shape[0],))
            env, _, _, _, _ = env_step(env, action, net, rl, sim)
            return (env, key), None

        (env, _), _ = jax.lax.scan(body, (env, key), length=400)
        return env

    env = steps(env, key)
    assert float(jnp.sum(env.sim.metrics.delta_tt_hourly)) > 0.0
