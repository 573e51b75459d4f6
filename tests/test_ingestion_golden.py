"""Golden ingestion tests.

Mirrors the reference's config_agents_from_xml golden test
(tests/config_agents_from_xml_test.py:96-200): independently re-derive the
expected (origin SRC index, dest DEST index, departure-seconds) triples from
a hand-written MATSim scenario and assert exact equality, plus dummy-row and
default-attribute invariants and the person filters.
"""
import os

import numpy as np
import pytest

from tarl_tpu.io.matsim import (
    load_network,
    parse_network_xml,
    parse_population_xml,
)
from tarl_tpu.schema import AgentFeatureHelpers

NETWORK_XML = """<network>
 <nodes>
  <node id="alpha" x="0" y="0"/>
  <node id="beta" x="1000" y="0"/>
  <node id="gamma" x="2000" y="0"/>
 </nodes>
 <links effectivecellsize="7.5">
  <link id="L1" from="alpha" to="beta" length="1000" capacity="600" freespeed="10" permlanes="1"/>
  <link id="L2" from="beta" to="gamma" length="500" capacity="300" freespeed="25" permlanes="2"/>
  <link id="L3" from="gamma" to="alpha" length="2000" capacity="900" freespeed="20" permlanes="1"/>
 </links>
</network>
"""

POPULATION_XML = """<population>
 <person id="keep1">
  <attributes>
   <attribute name="car_avail">always</attribute>
   <attribute name="age">42</attribute>
   <attribute name="sex">f</attribute>
   <attribute name="employed">yes</attribute>
  </attributes>
  <plan>
   <act type="home" link="alpha" end_time="07:15:30"/>
   <act type="work" link="gamma" end_time="17:00"/>
   <act type="home" link="alpha"/>
  </plan>
 </person>
 <person id="drop_no_car">
  <attributes><attribute name="car_avail">never</attribute></attributes>
  <plan>
   <act type="home" link="alpha" end_time="08:00:00"/>
   <act type="work" link="beta"/>
  </plan>
 </person>
 <person id="drop_one_act">
  <plan><act type="home" link="alpha" end_time="08:00:00"/></plan>
 </person>
 <person id="keep_defaults">
  <plan>
   <act type="home" link="beta" end_time="06:30"/>
   <act type="work" link="gamma"/>
  </plan>
 </person>
</population>
"""


@pytest.fixture(scope="module", params=["python", "native"])
def parsed(request, tmp_path_factory):
    root = tmp_path_factory.mktemp(f"golden_{request.param}")
    (root / "network.xml").write_text(NETWORK_XML)
    (root / "population.xml").write_text(POPULATION_XML)
    os.environ["TARL_NATIVE"] = "0" if request.param == "python" else "1"
    try:
        net = parse_network_xml(str(root / "network"))
        rows, stats = parse_population_xml(str(root / "population"), net)
    finally:
        os.environ.pop("TARL_NATIVE", None)
    return net, rows, stats


class TestNetworkGolden:
    def test_link_features(self, parsed):
        net, _, _ = parsed
        np.testing.assert_allclose(net.length, [1000, 500, 2000])
        np.testing.assert_allclose(net.max_flow, [600, 300, 900])
        # fftt = length / freespeed
        np.testing.assert_allclose(
            net.length / net.free_speed, [100.0, 20.0, 100.0]
        )
        # sorted intersections: alpha < beta < gamma
        assert net.sorted_intersections == ["alpha", "beta", "gamma"]

    def test_built_network_constants(self, parsed, tmp_path):
        """Capacity slots, Nmax and congestion constants follow the
        reference formulas (ts.py:122-128,207-210)."""
        (tmp_path / "network.xml").write_text(NETWORK_XML)
        network = load_network(str(tmp_path / "network"))
        # cap = int(length*lanes/7.5) + 1
        np.testing.assert_allclose(
            np.asarray(network.capacity),
            [1000 / 7.5 // 1 + 1, int(500 * 2 / 7.5) + 1, int(2000 / 7.5) + 1],
        )
        assert network.nmax == int(max(np.asarray(network.capacity))) + 1
        fftt = np.asarray(network.free_flow)
        expected_cc = fftt * (
            np.asarray(network.capacity) + 10
            - np.asarray(network.max_flow) * fftt / 3600
        )
        np.testing.assert_allclose(
            np.asarray(network.congestion_constant), expected_cc, rtol=1e-6
        )
        # road_dest: DEST node of the "to" intersection
        # L1->beta(idx1): 3 + 2*1 + 1 = 6; L2->gamma: 3+2*2+1=8; L3->alpha: 4
        np.testing.assert_array_equal(np.asarray(network.road_dest), [6, 8, 4])


class TestPopulationGolden:
    h = AgentFeatureHelpers()

    def test_expected_triples(self, parsed):
        """Exact (origin SRC, dest DEST, departure) rows in document order."""
        _, rows, _ = parsed
        # num_links=3; SRC(alpha)=3, DEST(alpha)=4, SRC(beta)=5, DEST(beta)=6,
        # SRC(gamma)=7, DEST(gamma)=8.
        expected = [
            # dummy row 0
            (0.0, 0.0, 48 * 3600.0),
            # keep1 trip 1: alpha -> gamma at 07:15:30
            (3.0, 8.0, 7 * 3600 + 15 * 60 + 30.0),
            # keep1 trip 2: gamma -> alpha at 17:00
            (7.0, 4.0, 17 * 3600.0),
            # keep_defaults: beta -> gamma at 06:30
            (5.0, 8.0, 6 * 3600 + 30 * 60.0),
        ]
        got = rows[:, [self.h.ORIGIN, self.h.DESTINATION, self.h.DEPARTURE_TIME]]
        np.testing.assert_allclose(got, np.asarray(expected))

    def test_dummy_row_invariants(self, parsed):
        _, rows, _ = parsed
        assert rows[0, self.h.DEPARTURE_TIME] == 48 * 3600
        assert rows[0, self.h.ON_WAY] == 0 and rows[0, self.h.DONE] == 0

    def test_person_attributes(self, parsed):
        _, rows, _ = parsed
        # keep1: age 42, sex f -> 1, employed yes -> 1
        assert rows[1, self.h.AGE] == 42
        assert rows[1, self.h.SEX] == 1.0
        assert rows[1, self.h.EMPLOYMENT_STATUS] == 1.0
        # keep_defaults: defaults age 20, sex m -> 0, employed no -> 0
        assert rows[3, self.h.AGE] == 20
        assert rows[3, self.h.SEX] == 0.0
        assert rows[3, self.h.EMPLOYMENT_STATUS] == 0.0

    def test_filters(self, parsed):
        _, _, stats = parsed
        assert stats.total_agents == 4
        assert stats.selected_agents == 2
        assert stats.exclusions["car_avail_not_always"] == 1
        assert stats.exclusions["too_few_activities"] == 1
