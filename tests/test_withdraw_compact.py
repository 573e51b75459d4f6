"""Compacted withdraw scatter (SimConfig.withdraw_compact) must be
bitwise-identical to the full candidate-list scatter at every budget —
including budgets small enough to force the lax.cond overflow fallback."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tarl_tpu.config import SimConfig
from tarl_tpu.core.step import Policy, init_sim_state, run_episode
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import ensure_scenario
from tarl_tpu.routing.policies import make_shortest_path_choice


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wc_scen"))
    base = ensure_scenario(root, "Grid4x4")
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    return net, agents


def _run(net, agents, compact, steps=2500, depth=None):
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + steps,
                    insert_window=64, withdraw_depth=depth,
                    withdraw_compact=compact, record_road_optimality=False)
    policy = Policy(
        choice=make_shortest_path_choice(),
        entry=lambda s, n: s.next_hop[s.agents.origin, s.agents.dest],
        needs_next_hop=True,
    )
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    final, _ = run_episode(state, net, policy, steps, sim=sim)
    return final


@pytest.mark.parametrize("compact", [1, 8, 64])
def test_compact_matches_full(setup, compact):
    """Budgets from overflow-every-tick (1) to comfortably-large (64)."""
    net, agents = setup
    full = _run(net, agents, compact=None)
    comp = _run(net, agents, compact=compact)
    np.testing.assert_array_equal(
        np.asarray(full.agents.arrival), np.asarray(comp.agents.arrival)
    )
    np.testing.assert_array_equal(
        np.asarray(full.agents.done), np.asarray(comp.agents.done)
    )
    np.testing.assert_array_equal(
        np.asarray(full.road.count), np.asarray(comp.road.count)
    )
    assert int(np.asarray(comp.agents.done)[1:].sum()) > 0


def test_compact_with_bounded_depth(setup):
    """Compaction composes with the bounded-depth unrolled path."""
    net, agents = setup
    full = _run(net, agents, compact=None, depth=2)
    comp = _run(net, agents, compact=16, depth=2)
    np.testing.assert_array_equal(
        np.asarray(full.agents.arrival), np.asarray(comp.agents.arrival)
    )
    assert int(jnp.sum(comp.road.count)) == int(jnp.sum(full.road.count))


def test_auto_gate_resolution():
    """"auto" resolves to the 256 budget once the candidate list reaches 4x
    the budget, plain below, and rejects unknown strings; outcomes match the
    explicit settings (compaction is bitwise-identical either way)."""
    from tarl_tpu.core import withdraw as W

    assert W._COMPACT_AUTO_BUDGET == 256
    assert W._COMPACT_AUTO_MIN == 4 * W._COMPACT_AUTO_BUDGET

    # Small net: "auto" must match the plain path bitwise whichever side of
    # the gate it lands on.
    import tempfile
    base = ensure_scenario(tempfile.mkdtemp(), "Grid4x4")
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    auto = _run(net, agents, compact="auto", steps=1200)
    plain = _run(net, agents, compact=None, steps=1200)
    np.testing.assert_array_equal(
        np.asarray(auto.agents.arrival), np.asarray(plain.agents.arrival)
    )

    with pytest.raises(ValueError, match="withdraw compact"):
        from tarl_tpu.core.withdraw import withdraw_agents
        sim = SimConfig(withdraw_compact="fast")
        state = init_sim_state(net, agents, sim=sim,
                               policy=Policy(choice=make_shortest_path_choice()))
        withdraw_agents(state.road, state.agents, net, state.time,
                        compact="fast")
