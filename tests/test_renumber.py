"""Roll-friendly road renumbering (network.roll_friendly_road_order).

Bucket structure is a function of road NUMBERING, not topology: the radial
metro's input (sorted-id-string driven) order scrambles the turn-edge
offsets so the roll plan declines, while the polar tail-major order
concentrates them on ~16 offsets.  The renumbered simulation must equal the
identity-numbered one up to road relabeling — agents are untouched, so
agent-level outcomes (arrival stamps under a deterministic policy, done
counts) pin the equivalence.
"""
import os

import numpy as np
import pytest

from tarl_tpu.config import RoutingConfig, SimConfig
from tarl_tpu.core.step import init_sim_state, run_episode
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import radial_scenario


@pytest.fixture(scope="module")
def radial(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("renum_scen"))
    return radial_scenario(root, "RenumRadial", rings=32, spokes=64,
                           num_agents=3000, peak_start=6 * 3600,
                           peak_spread=600)


def test_renumber_enables_roll_plan(radial, monkeypatch):
    net = load_network(os.path.join(radial, "network"))
    assert net.in_roll_shift.shape[0] > 0, "plan still declined"
    assert net.out_roll_shift.shape[0] > 0
    ro = np.asarray(net.road_order)
    assert not np.array_equal(ro, np.arange(net.num_roads))
    assert sorted(ro.tolist()) == list(range(net.num_roads))  # a permutation
    # Kill switch restores the identity order.  (Since the r5 cost-model
    # acceptance the identity order may still build a small high-exception
    # plan on this fixture — plan presence is no longer asserted, only the
    # numbering.)
    monkeypatch.setenv("TARL_NO_RENUMBER", "1")
    net_id = load_network(os.path.join(radial, "network"))
    np.testing.assert_array_equal(np.asarray(net_id.road_order),
                                  np.arange(net_id.num_roads))


def test_renumber_attrs_are_permuted(radial, monkeypatch):
    """Renumbered per-road attributes are the identity build's, permuted by
    road_order — the build just sees links 'parsed in a different order'."""
    net = load_network(os.path.join(radial, "network"))
    monkeypatch.setenv("TARL_NO_RENUMBER", "1")
    net_id = load_network(os.path.join(radial, "network"))
    ro = np.asarray(net.road_order)
    for field in ("length", "capacity", "free_flow", "max_flow"):
        np.testing.assert_array_equal(
            np.asarray(getattr(net, field)),
            np.asarray(getattr(net_id, field))[ro],
        )
    np.testing.assert_array_equal(np.asarray(net.road_to),
                                  np.asarray(net_id.road_to)[ro])


@pytest.mark.slow
def test_renumber_outcome_parity_deterministic(radial, monkeypatch):
    """Shortest-path episodes on the renumbered and identity networks: the
    agents are untouched by road relabeling, so their arrival stamps must
    match (up to equal-cost tie-breaks, which this radial's irregular link
    lengths avoid)."""
    from tarl_tpu.simulator import make_policy

    agents, _ = load_population(
        os.path.join(radial, "population"), os.path.join(radial, "network")
    )
    steps = 1200
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + steps,
                    record_road_optimality=False)
    # High refresh period + capped sweeps: keeps the CPU run tractable at
    # I=2049 while still exercising two congested refreshes.
    routing = RoutingConfig(refresh_rate=600, max_bf_iters=64,
                            backend="primal")

    def run(net):
        policy = make_policy("dijkstra", routing, network=net)
        state = init_sim_state(net, agents, sim=sim, policy=policy)
        final, _ = run_episode(state, net, policy, steps, sim=sim)
        return final

    fa = run(load_network(os.path.join(radial, "network")))
    monkeypatch.setenv("TARL_NO_RENUMBER", "1")
    fb = run(load_network(os.path.join(radial, "network")))
    np.testing.assert_array_equal(np.asarray(fa.agents.arrival),
                                  np.asarray(fb.agents.arrival))
    np.testing.assert_array_equal(np.asarray(fa.agents.inserted),
                                  np.asarray(fb.agents.inserted))


def test_grid_keeps_identity_order(tmp_path):
    """Grids already roll well under their input order — renumbering must
    not engage (preserves every existing grid baseline bit-for-bit)."""
    from tarl_tpu.io.scenarios import grid_scenario

    base = grid_scenario(str(tmp_path), "RenumGrid", rows=12, cols=12,
                         num_agents=50)
    net = load_network(os.path.join(base, "network"))
    np.testing.assert_array_equal(np.asarray(net.road_order),
                                  np.arange(net.num_roads))


def test_polar_buckets_on_radial(radial):
    """primal_delta_buckets with the polar candidate order now fits the
    radial metro under the default delta cap (was: declined at ~42)."""
    from tarl_tpu.routing import bellman_ford as bf

    net = load_network(os.path.join(radial, "network"))
    buckets = bf.primal_delta_buckets(
        net.inter_out_road, net.inter_out_ok, net.road_to,
        coords=(np.asarray(net.inter_x), np.asarray(net.inter_y)),
    )
    assert buckets is not None
    deltas, slot, perm, inv = buckets
    assert len(deltas) <= 32
    assert perm is not None  # a non-identity order won


@pytest.mark.parametrize("periodic", [False, True])
def test_incremental_lookup_bitwise(tmp_path, monkeypatch, periodic):
    """routing.policies._incremental_sel_roads: recomputing SELECTED_ROAD
    only for roads whose head dest changed is bitwise-identical to the full
    per-tick pass (sel is a pure function of table x head dest), including
    over-budget overflow ticks and refresh invalidation — on both episode
    drivers."""
    from tarl_tpu.io.scenarios import grid_scenario
    from tarl_tpu.routing import policies as pol
    from tarl_tpu.simulator import make_policy
    from tarl_tpu.core.step import run_episode, run_episode_periodic

    base = grid_scenario(str(tmp_path), "IncGrid", rows=6, cols=6,
                         num_agents=800, peak_start=6 * 3600,
                         peak_spread=300)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    steps = 600
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + steps,
                    record_road_optimality=False)
    routing = RoutingConfig(refresh_rate=10, max_bf_iters=16,
                            backend="primal")

    def run(min_roads, budget):
        monkeypatch.setattr(pol, "_LOOKUP_MIN_ROADS", min_roads)
        monkeypatch.setattr(pol, "_LOOKUP_BUDGET", budget)
        policy = make_policy("dijkstra", routing, network=net)
        state = init_sim_state(net, agents, sim=sim, policy=policy)
        runner = run_episode_periodic if (
            periodic and policy.periodic_rate
            and steps % policy.periodic_rate == 0
        ) else run_episode
        final, _ = runner(state, net, policy, steps, sim=sim)
        return final

    full = run(10**9, 256)          # incremental disabled: full every tick
    inc = run(0, 4)                 # tiny budget: inc + overflow both fire
    np.testing.assert_array_equal(np.asarray(full.selected_road),
                                  np.asarray(inc.selected_road))
    np.testing.assert_array_equal(np.asarray(full.agents.arrival),
                                  np.asarray(inc.agents.arrival))
    np.testing.assert_array_equal(np.asarray(full.road.fifo_ids),
                                  np.asarray(inc.road.fifo_ids))
    assert int(np.asarray(inc.agents.done)[1:].sum()) > 0
