"""Windowed insert under shard_map (r5).

The shard tick used to re-scan the whole population every tick (an
O(A log A) argsort + five [A]-index scatters measured at 16-50 ms/tick,
scripts/diagnose_shard.py); the windowed branch must be BITWISE-equal to
the serial windowed/escalating insert — same window, same escalation
semantics, same stamps — on divisible and padded road counts.
"""
import os

import numpy as np
import pytest

from tarl_tpu.config import SimConfig
from tarl_tpu.core.step import Policy, init_sim_state, run_episode
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import grid_scenario
from tarl_tpu.parallel.shard_map_episode import (
    make_road_mesh,
    run_episode_shard_map,
)
from tarl_tpu.routing.policies import random_choice
from tarl_tpu.state import sort_agents_by_departure


@pytest.fixture(scope="module")
def saturated(tmp_path_factory):
    """4x4 grid, 60 s / 3000-agent burst: blocked entrants pin the window
    and fire the escalation passes."""
    root = str(tmp_path_factory.mktemp("shard_win_scen"))
    base = grid_scenario(root, "SWGrid4", rows=4, cols=4, num_agents=3000,
                         peak_start=6 * 3600, peak_spread=60)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    return net, sort_agents_by_departure(agents)


def _assert_bitwise(fa, fb):
    np.testing.assert_array_equal(np.asarray(fa.road.fifo_ids),
                                  np.asarray(fb.road.fifo_ids))
    np.testing.assert_array_equal(np.asarray(fa.road.fifo_departure),
                                  np.asarray(fb.road.fifo_departure))
    np.testing.assert_array_equal(np.asarray(fa.road.count),
                                  np.asarray(fb.road.count))
    np.testing.assert_array_equal(np.asarray(fa.road.head),
                                  np.asarray(fb.road.head))
    np.testing.assert_array_equal(np.asarray(fa.agents.arrival),
                                  np.asarray(fb.agents.arrival))
    np.testing.assert_array_equal(np.asarray(fa.agents.inserted),
                                  np.asarray(fb.agents.inserted))


@pytest.mark.parametrize("shards", [1, 8])
@pytest.mark.parametrize("escalate", [True, False])
def test_shard_windowed_bitwise(saturated, shards, escalate):
    net, agents = saturated
    sim = SimConfig(timestep=1, start_time=6 * 3600,
                    record_road_optimality=False,
                    sorted_population=True, insert_window=64,
                    insert_escalate=escalate, withdraw_depth=2,
                    withdraw_escalate=True)
    pol = Policy(choice=random_choice)
    ticks = 160

    st = init_sim_state(net, agents, sim=sim, policy=pol)
    f_ser, log_ser = run_episode(st, net, pol, ticks, sim=sim)

    mesh = make_road_mesh(shards)
    f_sh, log_sh = run_episode_shard_map(st, net, pol, ticks, mesh, sim=sim)
    _assert_bitwise(f_ser, f_sh)
    # Escalation pass counts / saturation flags agree tick for tick.
    np.testing.assert_array_equal(
        np.asarray(log_ser.window_saturated, dtype=np.float32),
        np.asarray(log_sh.window_saturated, dtype=np.float32),
    )


def test_shard_windowed_unsorted_order(saturated):
    """The order-array (non-sorted-population) window path."""
    net, agents = saturated
    sim = SimConfig(timestep=1, start_time=6 * 3600,
                    record_road_optimality=False,
                    sorted_population=False, insert_window=64,
                    insert_escalate=True, withdraw_depth=2)
    pol = Policy(choice=random_choice)
    ticks = 120
    st = init_sim_state(net, agents, sim=sim, policy=pol)
    f_ser, _ = run_episode(st, net, pol, ticks, sim=sim)
    f_sh, _ = run_episode_shard_map(
        st, net, pol, ticks, make_road_mesh(8), sim=sim
    )
    _assert_bitwise(f_ser, f_sh)
