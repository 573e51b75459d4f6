"""Exact (backlog) insert under shard_map (VERDICT r4 #4).

The per-SRC queue state is replicated: appends are road-state-free and run
the SAME code as the serial path (core.insert.backlog_frontier_append);
drains compute the per-SRC take from the halo-gathered global counts
(replicated) and mask the FIFO writes to each shard's road block.  The
sharded backlog episode must therefore be BITWISE-identical to the serial
backlog run — including the queue state, the overflow monitor, and the
reconstructed lazy inserted flag — on both divisible and padded road
counts, in the oversaturated regime the backlog exists for.
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
from tarl_tpu.parallel.sharded_episode import pad_agents
from tarl_tpu.routing.policies import random_choice
from tarl_tpu.state import sort_agents_by_departure


def _scenario(tmp_path_factory, name, rows, cols, num_agents):
    root = str(tmp_path_factory.mktemp("shard_bl"))
    base = grid_scenario(root, name, rows=rows, cols=cols,
                         num_agents=num_agents, peak_start=6 * 3600,
                         peak_spread=60)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    return net, sort_agents_by_departure(pad_agents(agents, 8))


@pytest.mark.parametrize("dims", [(4, 4), (4, 5)])  # R=48 | R=62 (padded)
def test_shard_backlog_bitwise(tmp_path_factory, dims):
    rows, cols = dims
    net, agents = _scenario(
        tmp_path_factory, f"SBL{rows}x{cols}", rows, cols, 3000
    )
    steps = 900
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + steps,
                    insert_window=64, sorted_population=True,
                    insert_backlog=2048, record_road_optimality=False)
    policy = Policy(choice=random_choice)
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    assert state.backlog is not None

    ref_final, ref_logs = run_episode(state, net, policy, steps, sim=sim)
    mesh = make_road_mesh(8)
    sm_final, sm_logs = run_episode_shard_map(
        state, net, policy, steps, mesh, sim=sim
    )

    # The oversaturated regime is actually exercised: queues held agents.
    assert float(np.asarray(ref_logs.on_way).max()) > 0
    np.testing.assert_array_equal(np.asarray(ref_final.road.fifo_ids),
                                  np.asarray(sm_final.road.fifo_ids))
    np.testing.assert_array_equal(np.asarray(ref_final.road.count),
                                  np.asarray(sm_final.road.count))
    np.testing.assert_array_equal(np.asarray(ref_final.agents.arrival),
                                  np.asarray(sm_final.agents.arrival))
    np.testing.assert_array_equal(np.asarray(ref_final.agents.inserted),
                                  np.asarray(sm_final.agents.inserted))
    np.testing.assert_array_equal(np.asarray(ref_final.agents.done),
                                  np.asarray(sm_final.agents.done))
    # Queue state itself matches (replicated appends + consistent drains).
    np.testing.assert_array_equal(np.asarray(ref_final.backlog.qpack),
                                  np.asarray(sm_final.backlog.qpack))
    np.testing.assert_array_equal(np.asarray(ref_final.backlog.qhead),
                                  np.asarray(sm_final.backlog.qhead))
    np.testing.assert_array_equal(np.asarray(ref_final.backlog.qcount),
                                  np.asarray(sm_final.backlog.qcount))
    np.testing.assert_array_equal(np.asarray(ref_final.insert_ptr),
                                  np.asarray(sm_final.insert_ptr))
    # Overflow monitor rides the shard log (all-zero == reference-exact).
    np.testing.assert_array_equal(np.asarray(ref_logs.window_saturated),
                                  np.asarray(sm_logs.window_saturated))
    np.testing.assert_array_equal(np.asarray(ref_logs.on_way),
                                  np.asarray(sm_logs.on_way))
    np.testing.assert_array_equal(np.asarray(ref_logs.arrivals),
                                  np.asarray(sm_logs.arrivals))


def test_shard_backlog_overflow_monitor(tmp_path_factory):
    """A too-shallow replicated queue flags the bounded deviation on the
    shard log exactly like the serial monitor."""
    net, agents = _scenario(tmp_path_factory, "SBLov", 4, 4, 3000)
    steps = 600
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + steps,
                    insert_window=64, sorted_population=True,
                    insert_backlog=32, record_road_optimality=False)
    policy = Policy(choice=random_choice)
    state = init_sim_state(net, agents, sim=sim, policy=policy)

    ref_final, ref_logs = run_episode(state, net, policy, steps, sim=sim)
    mesh = make_road_mesh(8)
    sm_final, sm_logs = run_episode_shard_map(
        state, net, policy, steps, mesh, sim=sim
    )
    assert float(np.asarray(ref_logs.window_saturated).sum()) > 0
    np.testing.assert_array_equal(np.asarray(ref_logs.window_saturated),
                                  np.asarray(sm_logs.window_saturated))
    np.testing.assert_array_equal(np.asarray(ref_final.agents.arrival),
                                  np.asarray(sm_final.agents.arrival))
    np.testing.assert_array_equal(np.asarray(ref_final.agents.inserted),
                                  np.asarray(sm_final.agents.inserted))
