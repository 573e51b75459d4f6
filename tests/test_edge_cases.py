"""Robustness edge cases: degenerate networks and populations."""
import jax.numpy as jnp
import numpy as np
import pytest

from tarl_tpu.config import SimConfig
from tarl_tpu.core.step import (
    Policy,
    average_travel_time,
    init_sim_state,
    run_episode,
)
from tarl_tpu.network import build_network
from tarl_tpu.routing.policies import make_shortest_path_choice, random_choice
from tarl_tpu.state import init_agent_state


def _dead_end_network():
    """A -> B -> C with no return from C: road 1 (B->C) has no outgoing turn
    edges; C's DEST node is still reachable."""
    return build_network(
        length=np.array([75.0, 75.0]),
        max_flow=np.array([10.0, 10.0]),
        free_speed=np.array([7.5, 7.5]),
        perm_lanes=np.array([1.0, 1.0]),
        from_inter=np.array([0, 1]),
        to_inter=np.array([1, 2]),
        num_intersections=3,
    )


class TestDegenerateNetworks:
    def test_dead_end_trip_completes(self):
        """Agent travels A -> C through the dead-end chain and withdraws at
        DEST(C); roads with no outgoing turns must not break choice/core."""
        net = _dead_end_network()
        # SRC(A)=2, DEST(C)=7
        agents = init_agent_state(origin=[2, 2], dest=[7, 7],
                                  departure=[1e9, 0.0])
        sim = SimConfig(start_time=0, end_time=100)
        policy = Policy(
            choice=make_shortest_path_choice(),
            entry=lambda s, n: s.next_hop[s.agents.origin, s.agents.dest],
            needs_next_hop=True,
        )
        state = init_sim_state(net, agents, sim=sim, policy=policy)
        final, _ = run_episode(state, net, policy, 100, sim=sim)
        assert bool(final.agents.done[1])
        assert float(average_travel_time(final.agents)) > 0
        assert int(jnp.sum(final.road.count)) == 0

    def test_unreachable_destination_stays_on_network(self):
        """An agent whose destination is unreachable keeps circulating (or
        parks); nothing crashes and conservation holds."""
        net = _dead_end_network()
        # dest = DEST(A) = 3, unreachable from SRC(A) without a return link.
        agents = init_agent_state(origin=[2, 2], dest=[3, 3],
                                  departure=[1e9, 0.0])
        sim = SimConfig(start_time=0, end_time=60)
        policy = Policy(choice=random_choice)
        state = init_sim_state(net, agents, sim=sim, policy=policy)
        final, _ = run_episode(state, net, policy, 60, sim=sim)
        assert not bool(final.agents.done[1])
        total = int(jnp.sum(final.road.count)) + int(
            (~final.agents.on_way[1:] & ~final.agents.done[1:]).sum()
        )
        assert total == 1  # the agent is either queued or still pending

    def test_empty_population(self):
        net = _dead_end_network()
        agents = init_agent_state(origin=[0], dest=[0], departure=[48 * 3600.0])
        sim = SimConfig(start_time=0, end_time=50)
        policy = Policy(choice=random_choice)
        state = init_sim_state(net, agents, sim=sim, policy=policy)
        final, logs = run_episode(state, net, policy, 50, sim=sim)
        assert int(jnp.sum(final.road.count)) == 0
        assert float(logs.arrivals.sum()) == 0.0

    def test_windowed_insert_tiny_population(self):
        """Window larger than the population must clamp cleanly."""
        net = _dead_end_network()
        agents = init_agent_state(origin=[2, 2], dest=[7, 7],
                                  departure=[1e9, 0.0])
        sim = SimConfig(start_time=0, end_time=60, insert_window=4096)
        policy = Policy(choice=random_choice)
        state = init_sim_state(net, agents, sim=sim, policy=policy)
        final, _ = run_episode(state, net, policy, 60, sim=sim)
        assert bool(final.agents.on_way[1]) or bool(final.agents.done[1])


def test_star_junction_high_degree():
    """A 16-spoke star junction: the slot-major core must handle high
    in/out-degree tables (KIN = KOUT = 16 at the hub) — conservation and
    completion through a random episode."""
    import numpy as np
    import jax.numpy as jnp

    from tarl_tpu.config import SimConfig
    from tarl_tpu.core.step import Policy, init_sim_state, run_episode
    from tarl_tpu.network import build_network
    from tarl_tpu.routing.policies import random_choice
    from tarl_tpu.state import init_agent_state

    spokes = 16
    # roads: spoke->hub (i) and hub->spoke (spokes+i) for each spoke
    length = np.full(2 * spokes, 150.0)
    from_inter = np.concatenate([np.arange(1, spokes + 1), np.zeros(spokes)])
    to_inter = np.concatenate([np.zeros(spokes), np.arange(1, spokes + 1)])
    net = build_network(
        length=length,
        max_flow=np.full(2 * spokes, 600.0),
        free_speed=np.full(2 * spokes, 15.0),
        perm_lanes=np.ones(2 * spokes),
        from_inter=from_inter.astype(int),
        to_inter=to_inter.astype(int),
        num_intersections=spokes + 1,
    )
    assert net.in_src_tab.shape[0] >= spokes  # hub's in-degree drives KIN

    rng = np.random.default_rng(0)
    n_agents = 64
    origins = net.num_roads + 2 * rng.integers(1, spokes + 1, n_agents)
    dests = net.num_roads + 2 * rng.integers(1, spokes + 1, n_agents) + 1
    agents = init_agent_state(
        origin=np.concatenate([[0], origins]),
        dest=np.concatenate([[0], dests]),
        departure=np.concatenate([[2 * 86400.0],
                                  rng.uniform(0, 60, n_agents)]),
    )
    sim = SimConfig(start_time=0, timestep=1)
    pol = Policy(choice=random_choice)
    s0 = init_sim_state(net, agents, policy=pol, sim=sim)
    final, _ = run_episode(s0, net, pol, 3000, sim=sim)
    on_way = int(final.road.count.sum())
    done = int(final.agents.done[1:].sum())
    assert done + on_way + int(
        (~final.agents.inserted[1:]).sum()
    ) == n_agents, "agents must be conserved"
    assert done > n_agents // 2, f"random walk should deliver most: {done}"


@pytest.mark.slow
def test_radial_metro_scenario_shortest_path():
    """The ring-and-spoke radial generator (io.scenarios.radial_scenario) —
    a NON-grid network with irregular turn-graph deltas (ring wrap + centre
    spurs) and CBD-concentrated demand — completes a congested shortest-path
    episode with conservation, on both the all-pairs and dest-restricted
    primal backends (which must agree on arrivals)."""
    import os
    import tempfile

    import numpy as np

    from tarl_tpu.config import RoutingConfig, SimConfig
    from tarl_tpu.core.step import init_sim_state, run_episode
    from tarl_tpu.io.matsim import load_network, load_population
    from tarl_tpu.io.scenarios import radial_scenario
    from tarl_tpu.routing.policies import _dest_inter
    from tarl_tpu.simulator import make_policy

    root = tempfile.mkdtemp()
    base = radial_scenario(root, rings=3, spokes=6, num_agents=200,
                           peak_spread=600)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    assert net.num_intersections == 3 * 6 + 1
    sim = SimConfig(start_time=6 * 3600 - 60, timestep=1)
    routing = RoutingConfig(backend="primal", refresh_rate=10)
    finals = {}
    for tag, kwargs in (
        ("full", {}),
        ("restricted", {"dest_inters": np.unique(
            np.asarray(_dest_inter(net, agents.dest)))}),
    ):
        pol = make_policy("dijkstra", routing, network=net, **kwargs)
        s0 = init_sim_state(net, agents, policy=pol, sim=sim)
        final, _ = run_episode(s0, net, pol, 4000, sim=sim)
        finals[tag] = final
    f = finals["full"]
    done = int(f.agents.done[1:].sum())
    on_way = int(f.road.count.sum())
    waiting = int((~f.agents.inserted[1:]).sum())
    real = agents.num_agents - 1  # row 0 is the dummy agent
    assert done + on_way + waiting == real
    assert done == real, (done, on_way, waiting)
    np.testing.assert_array_equal(
        np.asarray(f.agents.arrival),
        np.asarray(finals["restricted"].agents.arrival),
    )
