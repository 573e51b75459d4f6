"""Native C++ MATSim parser: availability and exact parity with the Python
path (golden-test pattern of reference tests/config_agents_from_xml_test.py)."""
import gzip
import os

import numpy as np
import pytest

from tarl_tpu.io import native
from tarl_tpu.io.matsim import parse_network_xml, parse_population_xml
from tarl_tpu.io.scenarios import ensure_scenario


@pytest.fixture(scope="module")
def scen(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native_scen"))
    return ensure_scenario(root, "Grid4x4")


needs_native = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@needs_native
class TestNativeParity:
    def test_network_parity(self, scen, monkeypatch):
        net_path = os.path.join(scen, "network")
        monkeypatch.setenv("TARL_NATIVE", "0")
        py = parse_network_xml(net_path)
        monkeypatch.setenv("TARL_NATIVE", "1")
        nat = parse_network_xml(net_path)

        np.testing.assert_allclose(nat.length, py.length)
        np.testing.assert_allclose(nat.max_flow, py.max_flow)
        np.testing.assert_allclose(nat.free_speed, py.free_speed)
        np.testing.assert_allclose(nat.perm_lanes, py.perm_lanes)
        np.testing.assert_array_equal(nat.from_inter, py.from_inter)
        np.testing.assert_array_equal(nat.to_inter, py.to_inter)
        assert nat.sorted_intersections == py.sorted_intersections
        assert nat.effective_cell_size == py.effective_cell_size
        for k, v in py.node_positions.items():
            assert nat.node_positions[k] == pytest.approx(v)

    def test_population_parity(self, scen, monkeypatch):
        net_path = os.path.join(scen, "network")
        pop_path = os.path.join(scen, "population")
        monkeypatch.setenv("TARL_NATIVE", "0")
        parsed = parse_network_xml(net_path)
        rows_py, stats_py = parse_population_xml(pop_path, parsed)
        monkeypatch.setenv("TARL_NATIVE", "1")
        parsed_n = parse_network_xml(net_path)
        rows_nat, stats_nat = parse_population_xml(pop_path, parsed_n)

        np.testing.assert_allclose(rows_nat, rows_py)
        assert stats_nat.total_agents == stats_py.total_agents
        assert stats_nat.selected_agents == stats_py.selected_agents
        assert stats_nat.exclusions == stats_py.exclusions

    def test_gzip_support(self, scen, tmp_path, monkeypatch):
        src = os.path.join(scen, "network.xml")
        dst = str(tmp_path / "network.xml.gz")
        with open(src, "rb") as f, gzip.open(dst, "wb") as g:
            g.write(f.read())
        monkeypatch.setenv("TARL_NATIVE", "1")
        nat = parse_network_xml(str(tmp_path / "network"))
        monkeypatch.setenv("TARL_NATIVE", "0")
        py = parse_network_xml(os.path.join(scen, "network"))
        np.testing.assert_allclose(nat.length, py.length)

    def test_fallback_on_coordinate_plans(self, scen, tmp_path, monkeypatch):
        """Legacy coordinate-only plans must route to the Python KDTree path
        (native returns None -> fallback)."""
        pop = (
            '<population><person id="p"><plan>'
            '<act type="home" x="0" y="0" end_time="06:00:00"/>'
            '<act type="work" x="600" y="600"/>'
            "</plan></person></population>"
        )
        (tmp_path / "population.xml").write_text(pop)
        net_actual = os.path.join(scen, "network.xml")
        result = native.parse_population_native(
            str(tmp_path / "population.xml"), net_actual
        )
        assert result is None  # needs_python_fallback

        # End-to-end through the public API: Python path resolves via KDTree.
        monkeypatch.setenv("TARL_NATIVE", "1")
        parsed = parse_network_xml(os.path.join(scen, "network"))
        rows, stats = parse_population_xml(str(tmp_path / "population"), parsed)
        assert rows.shape[0] == 2  # dummy + one resolved trip
        assert stats.selected_agents == 1
