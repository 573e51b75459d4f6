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
