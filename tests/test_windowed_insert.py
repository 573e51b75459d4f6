"""Windowed insertion equivalence: the O(W log W) moving-window path must
produce the same trajectory as the exact full-population scan when the
window is large enough, and conserve agents when it is small."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tarl_tpu.config import SimConfig
from tarl_tpu.core.step import Policy, init_sim_state, run_episode, average_travel_time
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import ensure_scenario
from tarl_tpu.routing.policies import make_shortest_path_choice


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("win_scen"))
    base = ensure_scenario(root, "Grid4x4")
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    return net, agents


def _run(net, agents, window, steps=3000):
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + steps,
                    insert_window=window, record_road_optimality=False)
    policy = Policy(
        choice=make_shortest_path_choice(),
        entry=lambda s, n: s.next_hop[s.agents.origin, s.agents.dest],
        needs_next_hop=True,
    )
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    final, _ = run_episode(state, net, policy, steps, sim=sim)
    return final


@pytest.mark.slow
def test_large_window_matches_exact(setup):
    """Window >= population: identical trajectory (deterministic policy +
    same PRNG stream)."""
    net, agents = setup
    exact = _run(net, agents, window=None)
    windowed = _run(net, agents, window=agents.num_agents)
    np.testing.assert_array_equal(
        np.asarray(exact.agents.done), np.asarray(windowed.agents.done)
    )
    np.testing.assert_allclose(
        np.asarray(exact.agents.arrival), np.asarray(windowed.agents.arrival)
    )


def test_small_window_conserves_and_completes(setup):
    net, agents = setup
    final = _run(net, agents, window=32, steps=4000)
    done = int(final.agents.done[1:].sum())
    assert done == agents.num_agents - 1  # everyone still arrives
    assert int(jnp.sum(final.road.count)) == 0
    assert int(final.agents.on_way.sum()) == 0
    # Average travel time stays in the same ballpark as the exact path.
    exact = _run(net, agents, window=None, steps=4000)
    att_w = float(average_travel_time(final.agents))
    att_e = float(average_travel_time(exact.agents))
    assert att_w == pytest.approx(att_e, rel=0.25)


def test_escalation_single_tick_matches_exact(setup):
    """Escalating window passes must reproduce the whole-population insert
    BITWISE in a single tick — including the departure stamps of agents
    admitted by later passes on a road that earlier passes already pushed
    to (the tick-start occupancy snapshot, core.insert._admit_candidates
    stamp_count)."""
    from tarl_tpu.config import DEFAULT_PHYSICS
    from tarl_tpu.core.insert import insert_agents, insert_agents_windowed
    from tarl_tpu.state import init_agent_state, init_road_state

    net, _ = setup
    R = net.num_roads
    # 41 agents (id 0 = dummy past the horizon), ALL due at t=100: 30 head
    # for road 0 (spans 4 window passes at W=8), 10 for road 1.
    A = 41
    dep = np.full((A,), 50.0, np.float32)
    dep[0] = 1e9
    agents = init_agent_state(
        origin=np.zeros((A,), np.int32),
        dest=np.ones((A,), np.int32),
        departure=dep,
    )
    entry = np.concatenate(
        [[R], np.zeros(30, np.int32), np.ones(10, np.int32)]
    ).astype(np.int32)
    entry = jnp.asarray(entry)
    t = jnp.asarray(100.0, jnp.float32)
    sel = jnp.zeros((net.num_nodes,), jnp.int32)

    road0 = init_road_state(R, net.nmax)
    # Road 0 must admit across a pass boundary (> W) AND block the tail
    # (< 30 candidates) so both the stamp snapshot and the blocked-suffix
    # invariants are exercised.
    cap0 = float(net.capacity[0])
    assert 8 < cap0 - 3 < 30, f"capacity {cap0} breaks the test premise"

    exact_road, exact_agents = insert_agents(
        road0, agents, sel, net, t, DEFAULT_PHYSICS, entry_road=entry
    )
    for fast in (False, True):
        order = jnp.arange(A, dtype=jnp.int32)  # ids are departure-sorted
        w_road, w_agents, _, extra = insert_agents_windowed(
            road0, agents, sel, net, t, order, jnp.zeros((), jnp.int32),
            8, DEFAULT_PHYSICS, entry_road=entry, sorted_fast=fast,
            escalate=True,
        )
        assert float(extra) >= 2.0  # multi-pass actually happened
        np.testing.assert_array_equal(
            np.asarray(exact_road.fifo_ids), np.asarray(w_road.fifo_ids)
        )
        np.testing.assert_array_equal(
            np.asarray(exact_road.fifo_departure),
            np.asarray(w_road.fifo_departure),
        )
        np.testing.assert_array_equal(
            np.asarray(exact_road.fifo_arrival),
            np.asarray(w_road.fifo_arrival),
        )
        np.testing.assert_array_equal(
            np.asarray(exact_road.fifo_dest), np.asarray(w_road.fifo_dest)
        )
        np.testing.assert_array_equal(
            np.asarray(exact_road.count), np.asarray(w_road.count)
        )
        np.testing.assert_array_equal(
            np.asarray(exact_agents.inserted), np.asarray(w_agents.inserted)
        )


def test_escalation_episode_matches_exact(setup):
    """A burst workload (everyone due at episode start) with a tiny window:
    with SimConfig.insert_escalate the full episode trajectory is bitwise
    equal to the unbounded whole-population insert."""
    from tarl_tpu.state import sort_agents_by_departure

    net, agents = setup
    agents = sort_agents_by_departure(agents)
    start = int(np.asarray(agents.departure)[1:].max()) + 1  # all due at t0
    steps = 2500
    finals, logs = {}, {}
    for window in (None, 16):
        sim = SimConfig(start_time=start, end_time=start + steps,
                        insert_window=window, record_road_optimality=False,
                        sorted_population=window is not None,
                        insert_escalate=True)
        policy = Policy(
            choice=make_shortest_path_choice(),
            entry=lambda s, n: s.next_hop[s.agents.origin, s.agents.dest],
            needs_next_hop=True,
        )
        state = init_sim_state(net, agents, sim=sim, policy=policy)
        finals[window], logs[window] = run_episode(
            state, net, policy, steps, sim=sim
        )
    assert float(np.asarray(logs[16].window_saturated).max()) >= 1.0
    np.testing.assert_array_equal(
        np.asarray(finals[None].agents.arrival),
        np.asarray(finals[16].agents.arrival),
    )
    np.testing.assert_array_equal(
        np.asarray(finals[None].agents.done),
        np.asarray(finals[16].agents.done),
    )
    assert int(np.asarray(finals[16].agents.done)[1:].sum()) > 0


def test_sorted_fast_path_matches_windowed(setup):
    """SimConfig.sorted_population (the gather-free windowed-insert fast
    path) must reproduce the normal windowed trajectory bitwise on a
    departure-relabeled population."""
    from tarl_tpu.state import sort_agents_by_departure

    net, agents = setup
    agents_sorted = sort_agents_by_departure(agents)
    dep = np.asarray(agents_sorted.departure)
    assert (np.diff(dep[1:]) >= 0).all()
    assert float(dep[0]) > float(dep[1:].max())  # dummy past the horizon

    steps = 2000
    sims = {}
    for fast in (False, True):
        sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + steps,
                        insert_window=64, record_road_optimality=False,
                        sorted_population=fast)
        policy = Policy(
            choice=make_shortest_path_choice(),
            entry=lambda s, n: s.next_hop[s.agents.origin, s.agents.dest],
            needs_next_hop=True,
        )
        state = init_sim_state(net, agents_sorted, sim=sim, policy=policy)
        final, _ = run_episode(state, net, policy, steps, sim=sim)
        sims[fast] = final
    np.testing.assert_array_equal(
        np.asarray(sims[True].agents.arrival),
        np.asarray(sims[False].agents.arrival),
    )
    np.testing.assert_array_equal(
        np.asarray(sims[True].agents.done), np.asarray(sims[False].agents.done)
    )
    np.testing.assert_array_equal(
        np.asarray(sims[True].road.count), np.asarray(sims[False].road.count)
    )
    assert int(np.asarray(sims[True].agents.done)[1:].sum()) > 0
