"""Per-SRC candidate queues + departure-frontier insertion
(core.insert.insert_agents_backlogged) and compacted admission scatters
(SimConfig.insert_compact).

With queues deep enough (monitor all-zero) the backlog path must be
BITWISE-identical to the unbounded whole-population insert (reference
semantics: every due agent re-bids each tick with a fresh entry-road read,
agents/base.py:247-299).  Queue overflow is the one bounded deviation and
must be flagged by the monitor.
"""
import os

import numpy as np
import pytest

from tarl_tpu.config import SimConfig
from tarl_tpu.core.step import Policy, init_sim_state, run_episode
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import grid_scenario
from tarl_tpu.routing.policies import random_choice
from tarl_tpu.state import sort_agents_by_departure


@pytest.fixture(scope="module")
def saturated(tmp_path_factory):
    """4x4 grid with a 60 s / 5000-agent departure burst: road capacities
    block thousands of entrants, so the SRC queues fill deep — the
    oversaturated regime the backlog exists for."""
    root = str(tmp_path_factory.mktemp("backlog_scen"))
    base = grid_scenario(root, "BLGrid4", rows=4, cols=4, num_agents=5000,
                         peak_start=6 * 3600, peak_spread=60)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    return net, sort_agents_by_departure(agents)


def _episode(net, agents, sim, policy, steps):
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    final, logs = run_episode(state, net, policy, steps, sim=sim)
    return final, logs


def _assert_bitwise(fa, fb):
    np.testing.assert_array_equal(np.asarray(fa.road.fifo_ids),
                                  np.asarray(fb.road.fifo_ids))
    np.testing.assert_array_equal(np.asarray(fa.road.count),
                                  np.asarray(fb.road.count))
    np.testing.assert_array_equal(np.asarray(fa.agents.arrival),
                                  np.asarray(fb.agents.arrival))
    np.testing.assert_array_equal(np.asarray(fa.agents.inserted),
                                  np.asarray(fb.agents.inserted))


@pytest.mark.parametrize("window", [64, 256])
def test_backlog_bitwise_exact(saturated, window):
    """Bitwise equality vs whole-population insert with queues deep enough
    (monitor all-zero), at a frontier width below AND above the ~83/tick
    departure burst (the narrow one exercises the escalation re-pass)."""
    net, agents = saturated
    policy = Policy(choice=random_choice)
    steps = 1800
    sim_bl = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + steps,
                       insert_window=window, sorted_population=True,
                       insert_backlog=4096, record_road_optimality=False)
    sim_ex = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + steps,
                       insert_window=None, record_road_optimality=False)
    fa, logs = _episode(net, agents, sim_bl, policy, steps)
    fb, _ = _episode(net, agents, sim_ex, policy, steps)
    assert float(np.asarray(logs.window_saturated).sum()) == 0.0
    _assert_bitwise(fa, fb)


def test_backlog_overflow_monitor(saturated):
    """A too-shallow queue must FLAG the bounded deviation (monitor > 0)
    and still conserve agents / keep the frontier moving."""
    net, agents = saturated
    policy = Policy(choice=random_choice)
    steps = 1200
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + steps,
                    insert_window=64, sorted_population=True,
                    insert_backlog=16, record_road_optimality=False)
    fa, logs = _episode(net, agents, sim, policy, steps)
    assert float(np.asarray(logs.window_saturated).sum()) > 0.0
    assert int(np.asarray(fa.road.count).sum()) == int(
        np.asarray(fa.agents.on_way).sum()
    )
    assert int(np.asarray(fa.agents.done)[1:].sum()) > 0


def test_backlog_engages(saturated):
    """Mid-episode the queues must hold thousands of blocked agents (the
    structure is really carrying the oversaturated peak) with the monitor
    at zero (no overflow, no deviation)."""
    net, agents = saturated
    policy = Policy(choice=random_choice)
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 600,
                    insert_window=256, sorted_population=True,
                    insert_backlog=4096, record_road_optimality=False)
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    live_max, ovf = 0, 0.0
    for _ in range(6):
        state, logs = run_episode(state, net, policy, 100, sim=sim)
        live_max = max(live_max, int(np.asarray(state.backlog.qcount).sum()))
        ovf += float(np.asarray(logs.window_saturated).sum())
    assert live_max > 1000
    assert ovf == 0.0


def test_backlog_queue_invariants(saturated):
    """Every live entry is a real, due, uninserted agent in ascending-id
    FIFO order per SRC; in-queue set == due & ~inserted; conservation."""
    net, agents = saturated
    policy = Policy(choice=random_choice)
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 400,
                    insert_window=256, sorted_population=True,
                    insert_backlog=4096, record_road_optimality=False)
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    state, _ = run_episode(state, net, policy, 400, sim=sim)
    bl = state.backlog
    qids = np.asarray(bl.qids)
    qhead = np.asarray(bl.qhead)
    qcount = np.asarray(bl.qcount)
    S, Q = qids.shape
    live = []
    for s in range(S):
        idx = (qhead[s] + np.arange(qcount[s])) % Q
        entries = qids[s, idx]
        assert np.all(np.diff(entries) > 0)   # per-SRC ascending id order
        live.extend(entries.tolist())
    live = np.asarray(sorted(live))
    inserted = np.asarray(state.agents.inserted)
    dep = np.asarray(state.agents.departure)
    t = float(np.asarray(state.time))
    assert live.size > 0
    assert np.all(~inserted[live])
    assert np.all(dep[live] < t)
    # frontier semantics: every processed agent is inserted or in-queue,
    # and the in-queue set is exactly due & ~inserted (no one dropped).
    ptr = int(np.asarray(state.insert_ptr))
    due = dep < t
    due_uninserted = set(np.nonzero(due & ~inserted)[0].tolist()) - {0}
    assert set(live.tolist()) == due_uninserted
    assert ptr >= max(due_uninserted | {0})
    assert int(np.asarray(state.road.count).sum()) == int(
        np.asarray(state.agents.on_way).sum()
    )


def test_insert_compact_bitwise(saturated):
    """Compacted admission scatters are bitwise-identical at any budget
    (overflow ticks fall back to the full scatter via lax.cond)."""
    net, agents = saturated
    policy = Policy(choice=random_choice)
    steps = 600
    base = dict(start_time=6 * 3600, end_time=6 * 3600 + steps,
                insert_window=128, sorted_population=True,
                record_road_optimality=False)
    fa, _ = _episode(net, agents,
                     SimConfig(insert_compact=16, **base), policy, steps)
    fb, _ = _episode(net, agents,
                     SimConfig(insert_compact=None, **base), policy, steps)
    _assert_bitwise(fa, fb)


def test_backlog_config_validation():
    from tarl_tpu.state import init_agent_state
    import tarl_tpu.core.step as step

    agents = init_agent_state([0], [1], [1.0])

    class FakeNet:
        num_roads, nmax, num_intersections = 1, 4, 1

    with pytest.raises(ValueError, match="insert_backlog requires"):
        step.init_sim_state(
            FakeNet(), agents,
            sim=SimConfig(insert_backlog=64, insert_window=None),
        )
    # Per-agent entry policies break the one-road-per-SRC invariant.
    pol = step.Policy(choice=random_choice, entry=lambda s, n: None)
    with pytest.raises(ValueError, match="selected_road\\[origin\\]"):
        step.init_sim_state(
            FakeNet(), agents,
            sim=SimConfig(insert_backlog=64, insert_window=64,
                          sorted_population=True),
            policy=pol,
        )
