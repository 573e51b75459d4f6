"""Strict reference-compatibility mode (RoutingConfig.strict_compat).

A/B demonstration of the two reference quirks the default path fixes:

* entry roads — the reference inserts every entrant at a SRC node onto the
  node's SELECTED_ROAD, computed from the SRC's empty FIFO head = the dummy
  agent 0's destination (base.py:573-579); the default path routes each
  entrant toward its own destination;
* Dijkstra edge costs — the reference mixes SOURCE occupancy/capacity with
  the TARGET's congestion constant (base.py:541-549); the default path uses
  the congested entry cost of the target road.
"""
import jax.numpy as jnp
import numpy as np

from tarl_tpu.config import RoutingConfig
from tarl_tpu.core.step import init_sim_state, tick
from tarl_tpu.network import build_network
from tarl_tpu.routing.bellman_ford import reference_edge_costs
from tarl_tpu.simulator import make_policy
from tarl_tpu.state import init_agent_state


def _y_network():
    """Intersection 0 fans out to 1 and 2: road 0 = 0->1, road 1 = 0->2,
    plus return roads so every node can route."""
    return build_network(
        length=np.array([75.0, 75.0, 75.0, 75.0]),
        max_flow=np.array([10.0] * 4),
        free_speed=np.array([7.5] * 4),
        perm_lanes=np.array([1.0] * 4),
        from_inter=np.array([0, 0, 1, 2]),
        to_inter=np.array([1, 2, 0, 0]),
        num_intersections=3,
    )


def _agents(net):
    """Dummy agent 0 heads to DEST(1); the real agent 1 heads to DEST(2)."""
    R = net.num_roads
    src0 = R + 0      # SRC of intersection 0 (sorted order: 0, 1, 2)
    dest1 = R + 2 + 1  # DEST of intersection 1
    dest2 = R + 4 + 1  # DEST of intersection 2
    return init_agent_state(
        origin=[src0, src0],
        dest=[dest1, dest2],
        departure=[48 * 3600.0, 0.0],  # dummy parked past the horizon
    )


def _first_road_of_agent1(strict: bool):
    net = _y_network()
    agents = _agents(net)
    routing = RoutingConfig(refresh_rate=1, strict_compat=strict)
    policy = make_policy("dijkstra", routing=routing)
    state = init_sim_state(net, agents, policy=policy)
    # Tick 1 computes SELECTED_ROAD (choice runs after insert); tick 2
    # inserts the due agent with it.
    for _ in range(2):
        state, _ = tick(state, net, policy)
    on_road = np.asarray(state.road.fifo_ids == 1).any(axis=1)
    assert on_road.sum() == 1, "agent 1 must be on exactly one road"
    return int(np.nonzero(on_road)[0][0])


def test_entry_road_ab():
    # Default: agent 1 (dest = intersection 2) enters road 1 (0->2).
    assert _first_road_of_agent1(strict=False) == 1
    # Strict compat: agent 1 follows the DUMMY's destination (intersection 1)
    # and enters road 0 (0->1) — the reference behaviour.
    assert _first_road_of_agent1(strict=True) == 0


def test_reference_cost_form_values():
    """w(u->v) = max(fftt[u], cc[v] / (cap[u] + 10 - n[u])) verbatim."""
    net = _y_network()
    agents = _agents(net)
    state = init_sim_state(net, agents)
    # Occupy road 0 with 3 agents (counts only; ids irrelevant here).
    road = state.road._replace(count=state.road.count.at[0].set(3))
    w = np.asarray(reference_edge_costs(road, net, ))
    u = np.asarray(net.full_src)
    v = np.asarray(net.full_dst)
    R = net.num_roads
    n = net.num_nodes
    fftt = np.zeros(n); fftt[:R] = np.asarray(net.free_flow)
    cap = np.zeros(n); cap[:R] = np.asarray(net.capacity)
    cc = np.zeros(n); cc[:R] = np.asarray(net.congestion_constant)
    cnt = np.zeros(n); cnt[0] = 3
    expect = np.maximum(fftt[u], cc[v] / (cap[u] + 10.0 - cnt[u]))
    np.testing.assert_allclose(w, expect, rtol=1e-6)
    # The quirk is visible: occupancy on road 0 raises the cost of edges
    # LEAVING road 0 (source-occupancy term), never lowers it.
    empty = np.asarray(reference_edge_costs(state.road, net))
    out_of_0 = (u == 0)
    assert (w[out_of_0] >= empty[out_of_0]).all()
