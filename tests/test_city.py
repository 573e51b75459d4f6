"""Real-city scenario: generation, quirky-XML ingestion, renumbering, and
exact-semantics episodes on an irregular OSM-like network (io.city).

The reference ingests arbitrary MATSim city exports
(transportation_simulator.py:61-228, agents/base.py:38-242 incl. the
KDTree coordinate-plan fallback); every other test network here is a
template.  These tests pin the full real-data path: gz XML with DOCTYPE /
comments / <attributes> blocks / scientific-notation capacities / float
permlanes / one-ways, coordinate plans and filtered persons in the
population, locality-free node ids (the renumbering hazard), and the
per-SRC exact backlog on the resulting irregular topology.
"""
import gzip
import json
import os

import numpy as np
import pytest

from tarl_tpu.config import RoutingConfig, SimConfig
from tarl_tpu.core.step import init_sim_state, run_episode
from tarl_tpu.io.city import city_scenario
from tarl_tpu.io.matsim import (
    load_network,
    load_population,
    parse_network_xml,
    parse_population_xml,
)
from tarl_tpu.network import (
    _order_exceptions,
    _turn_edge_pairs,
    hilbert_rank,
    rcm_rank,
    roll_friendly_road_order,
)
from tarl_tpu.simulator import make_policy
from tarl_tpu.state import sort_agents_by_departure


@pytest.fixture(scope="module")
def mini_city(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("city_scen"))
    base = city_scenario(root, "MiniCity", num_intersections=900,
                         num_agents=3000, num_dest_zones=32, seed=7)
    return base


@pytest.fixture(scope="module")
def mini_parsed(mini_city):
    return parse_network_xml(os.path.join(mini_city, "network"))


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------

def test_generation_deterministic(mini_city, tmp_path):
    """Same seed -> identical structure (stats json + parsed link table)."""
    base2 = city_scenario(str(tmp_path), "MiniCity", num_intersections=900,
                          num_agents=3000, num_dest_zones=32, seed=7)
    s1 = json.load(open(os.path.join(mini_city, "city_stats.json")))
    s2 = json.load(open(os.path.join(base2, "city_stats.json")))
    assert s1 == s2
    p1 = parse_network_xml(os.path.join(mini_city, "network"))
    p2 = parse_network_xml(os.path.join(base2, "network"))
    np.testing.assert_array_equal(p1.length, p2.length)
    np.testing.assert_array_equal(p1.from_inter, p2.from_inter)
    assert p1.sorted_intersections == p2.sorted_intersections


def test_structure_is_irregular(mini_city, mini_parsed):
    """The city must NOT look like a template: mixed junction degrees,
    one-ways, varied link lengths and capacities, a river with exactly the
    configured bridges."""
    stats = json.load(open(os.path.join(mini_city, "city_stats.json")))
    assert stats["links"] == mini_parsed.num_roads
    assert stats["bridges"] == 9
    assert stats["one_way_links"] > 0
    # Junction degree mix (template grids are all-degree-4 inside).
    hist = stats["degree_hist"]
    assert len(hist) >= 4
    # Varied attributes: at least 3 distinct speeds, lanes, many lengths.
    assert len(np.unique(mini_parsed.free_speed)) >= 3
    assert len(np.unique(mini_parsed.perm_lanes)) >= 2
    assert len(np.unique(np.round(mini_parsed.length, 1))) > 100
    # Strong connectivity (every agent can reach every destination).
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components
    n = mini_parsed.num_intersections
    g = coo_matrix(
        (np.ones(mini_parsed.num_roads),
         (mini_parsed.from_inter, mini_parsed.to_inter)), shape=(n, n)
    )
    ncc, _ = connected_components(g, directed=True, connection="strong")
    assert ncc == 1


# ---------------------------------------------------------------------------
# quirky-XML ingestion (golden)
# ---------------------------------------------------------------------------

def test_network_xml_quirks_golden(mini_city):
    """Pin the parser against the export quirks the generator writes:
    DOCTYPE + comments + <attributes> blocks, scientific-notation
    capacities, float permlanes, extra link attrs — on BOTH parsers."""
    raw = gzip.open(
        os.path.join(mini_city, "network.xml.gz"), "rt"
    ).read()
    assert "<!DOCTYPE network" in raw
    assert "<!--" in raw
    assert 'class="java.lang.String"' in raw
    assert "e3" in raw          # scientific-notation capacity survives
    assert 'oneway="1"' in raw

    os.environ["TARL_NATIVE"] = "0"
    try:
        p_py = parse_network_xml(os.path.join(mini_city, "network"))
    finally:
        os.environ.pop("TARL_NATIVE", None)
    p_nat = parse_network_xml(os.path.join(mini_city, "network"))

    # Scientific notation parsed numerically (2-lane local = 900*2 = 1.8e3).
    assert (p_py.max_flow == 1800.0).any()
    assert set(np.unique(p_py.max_flow)) <= {900.0, 1800.0, 3600.0, 5400.0}
    assert p_py.effective_cell_size == 7.5
    assert (p_py.perm_lanes >= 1.0).all()

    # Native parser agrees field for field (link order is file order).
    np.testing.assert_array_equal(p_py.length, p_nat.length)
    np.testing.assert_array_equal(p_py.max_flow, p_nat.max_flow)
    np.testing.assert_array_equal(p_py.free_speed, p_nat.free_speed)
    np.testing.assert_array_equal(p_py.perm_lanes, p_nat.perm_lanes)
    np.testing.assert_array_equal(p_py.from_inter, p_nat.from_inter)
    np.testing.assert_array_equal(p_py.to_inter, p_nat.to_inter)
    assert p_py.sorted_intersections == p_nat.sorted_intersections
    assert set(p_py.node_positions) == set(p_nat.node_positions)
    keys = sorted(p_py.node_positions)
    np.testing.assert_allclose(
        np.array([p_py.node_positions[k] for k in keys]),
        np.array([p_nat.node_positions[k] for k in keys]), rtol=1e-12,
    )


def test_population_quirks_golden(mini_city, mini_parsed):
    """Population ingestion on the real-export shape: carAvail attribute
    spelling, java class attrs, <leg> elements, coordinate plans resolved
    through the KDTree fallback, filtered persons counted."""
    rows, stats = parse_population_xml(
        os.path.join(mini_city, "population"), mini_parsed
    )
    cstats = json.load(open(os.path.join(mini_city, "city_stats.json")))
    # Every commuter yields exactly one trip; the two filtered persons
    # (carAvail=never, single-activity) are excluded with the right reasons.
    assert stats.selected_agents == cstats["agents"]
    assert stats.total_trips == cstats["agents"]
    assert stats.exclusions["car_avail_not_always"] == 1
    assert stats.exclusions["too_few_activities"] == 1
    # Coordinate plans resolved via KDTree (no invalid-coordinate drops):
    assert cstats["coord_plans"] > 0
    assert stats.invalid_trip_coords == 0
    # Row schema: src/dest in range, departures inside the peak window.
    R = mini_parsed.num_roads
    n_nodes = R + 2 * mini_parsed.num_intersections
    assert rows.shape[1] == 9
    assert (rows[1:, 0] >= R).all() and (rows[1:, 0] < n_nodes).all()
    assert (rows[1:, 2] >= 6 * 3600).all() and (rows[1:, 2] <= 9 * 3600).all()


def test_population_native_vs_python(mini_city, mini_parsed):
    os.environ["TARL_NATIVE"] = "0"
    try:
        rows_py, stats_py = parse_population_xml(
            os.path.join(mini_city, "population"), mini_parsed
        )
    finally:
        os.environ.pop("TARL_NATIVE", None)
    rows_nat, stats_nat = parse_population_xml(
        os.path.join(mini_city, "population"), mini_parsed
    )
    np.testing.assert_array_equal(rows_py, rows_nat)
    assert stats_py.selected_agents == stats_nat.selected_agents
    assert stats_py.exclusions == stats_nat.exclusions


# ---------------------------------------------------------------------------
# locality ranks / renumbering
# ---------------------------------------------------------------------------

def test_hilbert_rank_is_locality_preserving():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 100, 4000)
    y = rng.uniform(0, 100, 4000)
    rank = hilbert_rank(x, y)
    assert sorted(rank) == list(range(4000))
    # Consecutive-rank nodes are spatially close: the median step distance
    # must be far below the random-pair expectation (~52 for a unit square
    # scaled by 100).
    order = np.argsort(rank)
    step = np.hypot(np.diff(x[order]), np.diff(y[order]))
    assert np.median(step) < 8.0


def test_rcm_rank_is_permutation(mini_parsed):
    rank = rcm_rank(mini_parsed.from_inter, mini_parsed.to_inter,
                    mini_parsed.num_intersections)
    assert rank is not None
    assert sorted(rank) == list(range(mini_parsed.num_intersections))


def test_city_renumbering_engages(mini_parsed):
    """The city's node ids are insertion-ordered over a RANDOM blue-noise
    acceptance order — the sorted-id road order carries no locality, the
    identity plan is hopeless, and the candidate search must find a
    viable order (this is where the Hilbert/RCM candidates earn their
    keep on irregular data)."""
    p = mini_parsed
    x = np.array([p.node_positions[i][0] for i in p.sorted_intersections])
    y = np.array([p.node_positions[i][1] for i in p.sorted_intersections])
    e_u, e_v = _turn_edge_pairs(p.from_inter, p.to_inter,
                                p.num_intersections)
    R = p.num_roads
    floor = max(64, e_u.size // 512)
    identity = np.arange(R)
    exc_id = _order_exceptions(identity, e_u, e_v, R, 24, floor)
    assert exc_id > 0.05 * e_u.size  # identity order NOT viable
    order = roll_friendly_road_order(
        p.from_inter, p.to_inter, p.num_intersections, x, y,
        max_buckets=24, max_exc_frac=0.4,
    )
    assert order is not None
    pos = np.empty(R, np.int64)
    pos[order] = np.arange(R)
    exc = _order_exceptions(pos, e_u, e_v, R, 24, floor)
    assert exc < exc_id  # strictly better than identity
    assert exc <= 0.4 * e_u.size


# ---------------------------------------------------------------------------
# end-to-end episode with exact semantics
# ---------------------------------------------------------------------------

def test_city_exact_backlog_episode(mini_city):
    """300 peak ticks on the irregular city: per-SRC backlog insert is
    bitwise-identical to the whole-population insert (overflow 0) and
    conservation holds — the real-data check that the exact path does not
    depend on template structure."""
    net = load_network(os.path.join(mini_city, "network"))
    agents, _ = load_population(
        os.path.join(mini_city, "population"),
        os.path.join(mini_city, "network"),
    )
    agents = sort_agents_by_departure(agents)
    policy = make_policy("random", RoutingConfig())
    ticks = 300

    sim_ref = SimConfig(timestep=1, start_time=6 * 3600,
                        record_road_optimality=False,
                        sorted_population=True, insert_window=None,
                        withdraw_depth=None)
    s_ref = init_sim_state(net, agents, sim=sim_ref, policy=policy)
    f_ref, _ = run_episode(s_ref, net, policy, ticks, sim=sim_ref)

    sim_bl = SimConfig(timestep=1, start_time=6 * 3600,
                       record_road_optimality=False,
                       sorted_population=True, insert_window=32,
                       insert_backlog=2048, withdraw_depth=None)
    s_bl = init_sim_state(net, agents, sim=sim_bl, policy=policy)
    f_bl, log = run_episode(s_bl, net, policy, ticks, sim=sim_bl)

    assert float(np.asarray(log.window_saturated).sum()) == 0.0
    np.testing.assert_array_equal(np.asarray(f_ref.road.fifo_ids),
                                  np.asarray(f_bl.road.fifo_ids))
    np.testing.assert_array_equal(np.asarray(f_ref.road.count),
                                  np.asarray(f_bl.road.count))
    np.testing.assert_array_equal(np.asarray(f_ref.agents.arrival),
                                  np.asarray(f_bl.agents.arrival))
    np.testing.assert_array_equal(np.asarray(f_ref.agents.inserted),
                                  np.asarray(f_bl.agents.inserted))
    # Conservation: every inserted agent is on a road or arrived.
    inserted = int(np.asarray(f_bl.agents.inserted[1:]).sum())
    done = int(np.asarray(f_bl.agents.done[1:]).sum())
    on_way = int(np.asarray(f_bl.road.count).sum())
    assert inserted == done + on_way
