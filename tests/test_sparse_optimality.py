"""Sparse full-resolution per-tick road-optimality (VERDICT r3 missing #3):
big networks keep the reference's FULL per-tick congestion-delay series
(ts.py:453-514, response_mpnn.py:125) as (time, nonzero-idx, value)
triplets instead of degrading to the hourly accumulator; reconstruction is
exact vs the dense store, and an nnz blowout degrades gracefully."""
import os

import numpy as np
import pytest

from tarl_tpu.io.scenarios import ensure_scenario
from tarl_tpu.simulator import TransportationSimulator, make_policy


@pytest.fixture(scope="module")
def grid_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sparse_scen"))
    ensure_scenario(root, "Grid4x4")
    return root


def _make_sim(root, save_root, store=None):
    sim = TransportationSimulator(data_root=root, save_root=save_root)
    sim.load_network("Grid4x4")
    sim.load_population("Grid4x4")
    sim.set_policy(make_policy("random"))
    sim.config_parameters(timestep_size=1, start_time=6 * 3600)
    if store is not None:
        sim.road_optimality_store = store
    return sim


def test_sparse_store_matches_dense(grid_root, tmp_path):
    dense = _make_sim(grid_root, str(tmp_path / "s1"))
    dense.run_fast(400)
    sparse = _make_sim(grid_root, str(tmp_path / "s2"), store="sparse")
    sparse.run_fast(400)

    assert dense.road_optimality_store == "dense"
    assert len(dense.road_optimality_values) == 400
    assert not dense.road_optimality_sparse
    assert len(sparse.road_optimality_sparse) == 400
    assert not sparse.road_optimality_values

    R = dense.network.num_roads
    ids = list(range(R))
    td, md = dense.road_optimality_series(ids)
    ts, ms = sparse.road_optimality_series(ids)
    np.testing.assert_array_equal(td, ts)
    np.testing.assert_array_equal(md, ms)  # bitwise: same floats, resorted
    assert ms.sum() > 0.0, "random routing on Grid4x4 must congest"

    # Subset reconstruction (the plot path never builds [T, R]).
    sub = [3, 0, R - 1]
    _, m_sub = sparse.road_optimality_series(sub)
    np.testing.assert_array_equal(m_sub, md[:, sub])

    # Default plot road selection: per-road mass totals match the series.
    np.testing.assert_allclose(
        sparse._sparse_road_total, np.abs(md).sum(axis=0), rtol=1e-6
    )


def test_sparse_plot_and_chunked_appends(grid_root, tmp_path):
    sim = _make_sim(grid_root, str(tmp_path / "s3"), store="sparse")
    for _ in range(4):  # chunked run_fast calls append, like run_episode
        sim.run_fast(100)
    assert len(sim.road_optimality_sparse) == 400
    out_dir = str(tmp_path / "plots")
    fig = sim.plot_road_optimality(output_dir=out_dir)
    assert fig is not None
    assert os.path.exists(os.path.join(out_dir, "road_optimality.png"))


def test_sparse_nnz_blowout_degrades_to_hourly(grid_root, tmp_path):
    sim = _make_sim(grid_root, str(tmp_path / "s4"), store="sparse")
    sim._sparse_nnz_budget = 10  # force the blowout immediately
    sim.run_fast(300)
    assert sim.road_optimality_store == "hourly"
    assert not sim.road_optimality_sparse
    # The always-on hourly accumulator still carries the artifact.
    assert float(np.asarray(sim.state.metrics.delta_tt_hourly).sum()) > 0.0
    out_dir = str(tmp_path / "plots4")
    fig = sim.plot_road_optimality(output_dir=out_dir)
    assert fig is not None
    assert os.path.exists(os.path.join(out_dir, "road_optimality.png"))
