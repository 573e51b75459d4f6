"""Fused winner kernel (core/fused_winner.py) bitwise equality.

The fused Pallas mid-section must reproduce direction_step + confirm_step
EXACTLY — same Gumbel stream (drawn outside in the same [KIN, R] layout),
same eligibility bits, same ascending-slot strict-> tie-break, same
exception handling (overlay in-kernel for the in-table, patched outside for
the out-table).  Runs the kernel in interpret mode on CPU against the XLA
roll path on a forced Grid8 plan.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tarl_tpu.config import SimConfig, DEFAULT_PHYSICS
from tarl_tpu.core.direction import direction_step
from tarl_tpu.core.response import confirm_step
from tarl_tpu.core.step import Policy, init_sim_state, run_episode
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import ensure_scenario
from tarl_tpu.routing.policies import random_choice

from test_roll_gather import _force_plan


@pytest.fixture(scope="module")
def warm(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fw_scen"))
    base = ensure_scenario(root, "Grid8x8")
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    sim = SimConfig(start_time=6 * 3600, record_road_optimality=False)
    policy = Policy(choice=random_choice)
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    state, _ = run_episode(state, net, policy, 400, sim=sim)
    return _force_plan(net), state


@pytest.mark.slow
def test_fused_winner_bitwise(warm, monkeypatch):
    monkeypatch.setenv("TARL_FUSED_WINNER_INTERPRET", "1")
    from tarl_tpu.core.fused_winner import direction_confirm_fused

    net, state = warm
    assert net.in_roll_shift_t and net.out_roll_shift_t
    assert int(net.in_roll_exc_src.shape[0]) > 0  # exception path exercised

    road_a = state.road
    road_b = state.road
    t = state.time
    key = state.key
    for step in range(30):
        key, k = jax.random.split(key)
        ra, da, acc_a, win_a = direction_step(
            road_a, state.selected_road, net, t, k, DEFAULT_PHYSICS,
            compute_delta=True,
        )
        ra, pop_a = confirm_step(ra, acc_a, win_a, net)
        rb, db, acc_b, win_b, pop_b = direction_confirm_fused(
            road_b, state.selected_road, net, t, k, DEFAULT_PHYSICS,
            compute_delta=True,
        )
        np.testing.assert_array_equal(np.asarray(acc_a), np.asarray(acc_b))
        np.testing.assert_array_equal(np.asarray(win_a), np.asarray(win_b))
        np.testing.assert_array_equal(np.asarray(pop_a), np.asarray(pop_b))
        np.testing.assert_array_equal(np.asarray(da), np.asarray(db))
        for f in ("fifo_ids", "fifo_arrival", "fifo_departure", "fifo_dest",
                  "head", "count"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ra, f)), np.asarray(getattr(rb, f)),
                err_msg=f"{f} diverged at step {step}",
            )
        road_a, road_b = ra, rb
        t = t + 1.0
    # Non-vacuous: transfers actually happened across the comparison.
    assert int(np.asarray(road_a.count).sum()) > 0


@pytest.mark.slow
def test_fused_winner_tiled_bitwise(warm, monkeypatch):
    """The grid-tiled form (rolls hoisted to XLA, columnwise kernels) must
    match the XLA path bitwise too — run with a 128-lane tile so the grid
    has multiple tiles including a PARTIAL last one (Grid8 R=224)."""
    monkeypatch.setenv("TARL_FUSED_WINNER_INTERPRET", "1")
    monkeypatch.setenv("TARL_FUSED_TILE", "128")
    from tarl_tpu.core.fused_winner import direction_confirm_fused_tiled

    net, state = warm
    assert net.num_roads % 128 != 0  # partial-tile coverage is real
    road_a = state.road
    road_b = state.road
    t = state.time
    key = state.key
    for step in range(30):
        key, k = jax.random.split(key)
        ra, da, acc_a, win_a = direction_step(
            road_a, state.selected_road, net, t, k, DEFAULT_PHYSICS,
            compute_delta=True,
        )
        ra, pop_a = confirm_step(ra, acc_a, win_a, net)
        rb, db, acc_b, win_b, pop_b = direction_confirm_fused_tiled(
            road_b, state.selected_road, net, t, k, DEFAULT_PHYSICS,
            compute_delta=True,
        )
        np.testing.assert_array_equal(np.asarray(acc_a), np.asarray(acc_b))
        np.testing.assert_array_equal(np.asarray(win_a), np.asarray(win_b))
        np.testing.assert_array_equal(np.asarray(pop_a), np.asarray(pop_b))
        np.testing.assert_array_equal(np.asarray(da), np.asarray(db))
        for f in ("fifo_ids", "fifo_arrival", "fifo_departure", "fifo_dest",
                  "head", "count"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ra, f)), np.asarray(getattr(rb, f)),
                err_msg=f"{f} diverged at step {step}",
            )
        road_a, road_b = ra, rb
        t = t + 1.0
    assert int(np.asarray(road_a.count).sum()) > 0


@pytest.mark.slow
def test_fused_winner_tiled_episode_through_tick(tmp_path, monkeypatch):
    """run_episode takes the TILED branch when the single-block VMEM gate
    declines (monkeypatched to 0) — bitwise-equal to the kernel-free run."""
    from tarl_tpu.io.scenarios import grid_scenario

    base = grid_scenario(str(tmp_path), "G222t", rows=2, cols=22,
                         num_agents=300)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    net = _force_plan(net)

    sim = SimConfig(start_time=6 * 3600, record_road_optimality=False)
    policy = Policy(choice=random_choice)
    state = init_sim_state(net, agents, sim=sim, policy=policy)

    import tarl_tpu.core.fused_winner as fw

    monkeypatch.setattr(fw, "_EST_BYTES_MAX", 0)  # block form declines
    monkeypatch.setenv("TARL_FUSED_TILE", "256")
    finals = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("TARL_FUSED_TILED", mode)  # opt-in gate
        monkeypatch.setenv("TARL_FUSED_WINNER", mode)
        monkeypatch.setenv("TARL_FUSED_WINNER_INTERPRET", mode)
        jax.clear_caches()
        assert not fw.fused_winner_ok(net)
        assert fw.fused_winner_tiled_ok(net) == (mode == "1")
        finals[mode], _ = run_episode(state, net, policy, 600, sim=sim)
    for f in ("fifo_ids", "head", "count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(finals["0"].road, f)),
            np.asarray(getattr(finals["1"].road, f)),
        )
    np.testing.assert_array_equal(
        np.asarray(finals["0"].agents.arrival),
        np.asarray(finals["1"].agents.arrival),
    )
    assert int(np.asarray(finals["1"].agents.done)[1:].sum()) > 0


def test_fused_winner_episode_through_tick(tmp_path, monkeypatch):
    """End-to-end: a full run_episode whose tick takes the fused-kernel
    branch (gate satisfied: forced plan + R % 128 == 0) is bitwise-equal to
    the run with the kernel disabled.  jax caches are cleared between the
    two runs so the env-var gate actually re-traces."""
    from tarl_tpu.io.scenarios import grid_scenario

    base = grid_scenario(str(tmp_path), "G222", rows=2, cols=22,
                         num_agents=300)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    net = _force_plan(net)
    assert net.num_roads % 128 == 0

    sim = SimConfig(start_time=6 * 3600, record_road_optimality=False)
    policy = Policy(choice=random_choice)
    state = init_sim_state(net, agents, sim=sim, policy=policy)

    finals = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("TARL_FUSED_WINNER", mode)
        monkeypatch.setenv("TARL_FUSED_WINNER_INTERPRET", mode)
        jax.clear_caches()
        from tarl_tpu.core.fused_winner import fused_winner_ok

        assert fused_winner_ok(net) == (mode == "1")
        finals[mode], _ = run_episode(state, net, policy, 600, sim=sim)
    for f in ("fifo_ids", "head", "count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(finals["0"].road, f)),
            np.asarray(getattr(finals["1"].road, f)),
        )
    np.testing.assert_array_equal(
        np.asarray(finals["0"].agents.arrival),
        np.asarray(finals["1"].agents.arrival),
    )
    assert int(np.asarray(finals["1"].agents.done)[1:].sum()) > 0


def test_fused_winner_gate(warm, monkeypatch):
    """The production gate: off on CPU without the interpret override, off
    without a roll plan, and R % 128 enforcement."""
    from tarl_tpu.core.fused_winner import fused_winner_ok

    net, _ = warm
    monkeypatch.delenv("TARL_FUSED_WINNER_INTERPRET", raising=False)
    assert not fused_winner_ok(net)  # cpu backend
    monkeypatch.setenv("TARL_FUSED_WINNER_INTERPRET", "1")
    assert fused_winner_ok(net)  # any R: pltpu.roll handles unaligned lanes
    assert not fused_winner_ok(net.replace(in_roll_shift_t=()))
    monkeypatch.setenv("TARL_NO_ROLL", "1")
    assert not fused_winner_ok(net)  # the kernel IS a roll evaluation
    monkeypatch.delenv("TARL_NO_ROLL")
    monkeypatch.setenv("TARL_FUSED_WINNER", "0")
    assert not fused_winner_ok(net)
