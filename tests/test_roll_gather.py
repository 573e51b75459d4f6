"""Roll-plan gather equivalence (core.roll_gather).

The direction step's in-slot gather evaluated as per-offset rolls must be
bitwise-identical to the direct gather — same selected winners, same Gumbel
stream, same trajectories — and the plan builder must decline on small /
irregular inputs instead of producing a degenerate plan.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tarl_tpu.config import SimConfig
from tarl_tpu.core.roll_gather import build_roll_plan, roll_gather
from tarl_tpu.core.step import Policy, init_sim_state, run_episode
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import grid_scenario
from tarl_tpu.routing.policies import random_choice


@pytest.fixture(autouse=True)
def _roll_at_any_size(monkeypatch):
    """direction/confirm gate the XLA roll evaluation at MIN_ROADS (the
    launch-bound regime below which the direct gather wins); these tests
    exercise the roll path on tiny forced-plan grids, so lower the gate."""
    from tarl_tpu.core import roll_gather

    monkeypatch.setattr(roll_gather, "MIN_ROADS", 0)


@pytest.fixture(scope="module")
def grid(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("roll_scen"))
    base = grid_scenario(root, "RollGrid8", rows=8, cols=8, num_agents=400,
                         peak_start=6 * 3600, peak_spread=600)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    return net, agents


def _force_plan(net, **kw):
    kw.setdefault("max_exc_frac", 1.0)  # tiny grid: boundary tail is large
    kw.setdefault("min_count", 1)       # tiny grid: every count is small
    plan = build_roll_plan(
        np.asarray(net.in_src_tab), np.asarray(net.in_edge_ok),
        min_roads=0, **kw,
    )
    assert plan[0].shape[0] > 0, "grid plan unexpectedly declined"
    out_plan = build_roll_plan(
        np.asarray(net.out_dst_tab), np.asarray(net.out_edge_ok),
        min_roads=0, **kw,
    )
    assert out_plan[0].shape[0] > 0
    return net.replace(
        in_roll_shift=jnp.asarray(plan[0]),
        in_roll_sel=jnp.asarray(plan[1]),
        in_roll_exc_src=jnp.asarray(plan[2]),
        in_roll_exc_k=jnp.asarray(plan[3]),
        in_roll_exc_v=jnp.asarray(plan[4]),
        out_roll_shift=jnp.asarray(out_plan[0]),
        out_roll_sel=jnp.asarray(out_plan[1]),
        out_roll_exc_src=jnp.asarray(out_plan[2]),
        out_roll_exc_k=jnp.asarray(out_plan[3]),
        out_roll_exc_v=jnp.asarray(out_plan[4]),
        in_roll_shift_t=tuple(int(s) for s in plan[0]),
        out_roll_shift_t=tuple(int(s) for s in out_plan[0]),
    )


def test_roll_gather_matches_direct(grid):
    net, _ = grid
    tab = np.asarray(net.in_src_tab)
    ok = np.asarray(net.in_edge_ok)
    K, R = tab.shape
    rng = np.random.default_rng(0)
    mat = jnp.asarray(rng.integers(-(2**30), 2**30, size=(3, R)), jnp.int32)
    for max_buckets in (2, 8):  # small cap forces a real exception tail
        plan = build_roll_plan(tab, ok, min_roads=0, max_buckets=max_buckets,
                               max_exc_frac=1.0, min_count=1)
        got = roll_gather(mat, *(jnp.asarray(p) for p in plan))
        want = np.asarray(mat)[:, tab].transpose(1, 0, 2)  # [K, 3, R]
        # compare only valid slots (invalid-slot values are don't-care)
        for k in range(K):
            np.testing.assert_array_equal(
                np.asarray(got)[k][:, ok[k]], want[k][:, ok[k]]
            )


def test_plan_declines_below_min_roads(grid):
    net, _ = grid
    plan = build_roll_plan(np.asarray(net.in_src_tab),
                           np.asarray(net.in_edge_ok))  # default min_roads
    assert plan[0].shape[0] == 0  # R=224 << MIN_ROADS: direct gather wins


def test_plan_declines_on_scrambled_indices():
    rng = np.random.default_rng(1)
    R = 4096
    tab = rng.integers(0, R, size=(3, R)).astype(np.int32)
    ok = np.ones((3, R), bool)
    plan = build_roll_plan(tab, ok, min_roads=0)
    assert plan[0].shape[0] == 0  # exception tail over budget


def test_direction_roll_path_bitwise(grid):
    """Full random-policy episodes with and without the roll plan must agree
    bitwise — the roll path is an evaluation strategy, not a semantics
    change."""
    net, agents = grid
    net_roll = _force_plan(net)
    steps = 900
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + steps,
                    insert_window=64, record_road_optimality=False)
    policy = Policy(choice=random_choice)

    def run(n):
        state = init_sim_state(n, agents, sim=sim, policy=policy)
        final, log = run_episode(state, n, policy, steps, sim=sim)
        return final, log

    f_a, l_a = run(net)
    f_b, l_b = run(net_roll)
    for name in ("fifo_ids", "fifo_arrival", "fifo_departure", "fifo_dest",
                 "head", "count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(f_a.road, name)),
            np.asarray(getattr(f_b.road, name)), err_msg=name,
        )
    np.testing.assert_array_equal(np.asarray(f_a.agents.arrival),
                                  np.asarray(f_b.agents.arrival))
    np.testing.assert_array_equal(np.asarray(l_a.arrivals),
                                  np.asarray(l_b.arrivals))
    assert int(f_b.agents.done[1:].sum()) > 0  # episode did real work


def test_confirm_roll_matches_scatter(grid):
    """confirm_step's gather-free pop mask must equal the scatter form for
    arbitrary (accept, win_src) records."""
    from tarl_tpu.core.response import confirm_step
    from tarl_tpu.state import init_road_state

    net, _ = grid
    net_roll = _force_plan(net)
    R = net.num_roads
    rng = np.random.default_rng(5)
    road = init_road_state(R, net.nmax)
    in_src = np.asarray(net.in_src_tab)
    in_ok = np.asarray(net.in_edge_ok)
    for trial in range(5):
        # accept a random subset of roads; winner = a random VALID in-slot
        accept = jnp.asarray(rng.random(R) < 0.4)
        slot = rng.integers(0, in_ok.shape[0], size=R)
        slot = np.where(in_ok[slot, np.arange(R)], slot, 0)
        win = jnp.asarray(in_src[slot, np.arange(R)], jnp.int32)
        # each upstream must win at most once (direction guarantees it):
        # deduplicate by keeping the first occurrence
        w = np.asarray(jnp.where(accept, win, R))
        seen, keep = set(), np.zeros(R, bool)
        for v in range(R):
            if w[v] < R and w[v] not in seen:
                seen.add(w[v]); keep[v] = True
        accept = jnp.asarray(keep)
        _, popped_a = confirm_step(road, accept, win, net)
        _, popped_b = confirm_step(road, accept, win, net_roll)
        np.testing.assert_array_equal(np.asarray(popped_a),
                                      np.asarray(popped_b))


def test_shortest_path_periodic_roll_bitwise(tmp_path):
    """The metro configuration — shortest-path policy under the periodic
    refresh-hoisted driver — must be bitwise-identical with and without the
    roll plans (direction + confirm both active)."""
    from tarl_tpu.config import RoutingConfig
    from tarl_tpu.core.step import run_episode_periodic
    from tarl_tpu.io.scenarios import ensure_scenario
    from tarl_tpu.simulator import make_policy

    root = str(tmp_path)
    base = ensure_scenario(root, "Grid4x4")
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    net_roll = _force_plan(net)
    sim = SimConfig(start_time=6 * 3600 - 60, timestep=1)

    def run(n):
        pol = make_policy(
            "dijkstra", RoutingConfig(refresh_rate=5, max_bf_iters=8),
            network=n,
        )
        s0 = init_sim_state(n, agents, policy=pol, sim=sim)
        return run_episode_periodic(s0, n, pol, 60, sim=sim)

    fa, la = run(net)
    fb, lb = run(net_roll)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(fa.road),
                    jax.tree_util.tree_leaves(fb.road)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(fa.agents.arrival),
                                  np.asarray(fb.agents.arrival))
    for a, b in zip(jax.tree_util.tree_leaves(la),
                    jax.tree_util.tree_leaves(lb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_radial_buckets_under_raised_cap(tmp_path):
    """The radial metro's identity node order buckets at ~42 offsets — over
    the conservative default cap but valid: with a raised cap the bucketed
    multisweep must stay bitwise-equal to the gather sweep (min-plus is
    exact), enabling TARL_MAX_DELTAS experiments on irregular networks."""
    from tarl_tpu.io.scenarios import radial_scenario
    from tarl_tpu.routing import bellman_ford as bf

    base = radial_scenario(str(tmp_path), "RadialSmall", rings=6, spokes=12,
                           num_agents=10)
    net = load_network(os.path.join(base, "network"))
    buckets = bf.primal_delta_buckets(
        net.inter_out_road, net.inter_out_ok, net.road_to,
        coords=(net.inter_x, net.inter_y), max_deltas=256,
    )
    assert buckets is not None
    shifts, slot, perm, inv = buckets
    assert len(shifts) > 4  # genuinely irregular, not a grid in disguise
    rng = np.random.default_rng(2)
    cost = jnp.asarray(rng.uniform(1.0, 50.0, net.num_roads), jnp.float32)
    d_gather = bf.primal_all_pairs_dist(
        cost, net.inter_out_road, net.inter_out_ok, net.road_to
    )
    d_roll = bf.primal_all_pairs_dist(
        cost, net.inter_out_road, net.inter_out_ok, net.road_to,
        delta_shifts=shifts, delta_slot=slot, delta_perm=perm,
        delta_inv=inv,
    )
    np.testing.assert_array_equal(np.asarray(d_gather), np.asarray(d_roll))


def test_roll_path_lowers_without_slot_gathers(grid):
    """Design property: with the roll plan active, direction_step's lowered
    program contains only the tiny exception gather — the [KIN*R] slot
    gather and the two winner gathers are gone (they are the ops the serial
    TPU emitter makes tick-dominating at metro scale)."""
    from tarl_tpu.core.direction import direction_step
    from tarl_tpu.state import init_road_state

    net, _ = grid
    net_roll = _force_plan(net)
    R = net.num_roads
    road = init_road_state(R, net.nmax)
    sel = jnp.zeros((net.num_nodes,), jnp.int32)
    key = jax.random.PRNGKey(0)
    t = jnp.float32(0.0)

    def count_gathers(n):
        f = jax.jit(lambda r, s: direction_step(r, s, n, t, key,
                                                compute_delta=False))
        txt = f.lower(road, sel).compile().as_text()
        return txt.count(" gather(")

    with_roll = count_gathers(net_roll)
    without = count_gathers(net)
    # The gather path needs the slot gather + 2 winner gathers; the roll
    # path keeps at most the [E]-sized exception gather.
    assert with_roll < without
    assert with_roll <= 2


def test_exception_tail_exercised(grid):
    """With max_buckets=1 most slots fall to the exception gather/scatter;
    the episode must still match bitwise (covers the exception path)."""
    net, agents = grid
    net_exc = _force_plan(net, max_buckets=1, max_exc_frac=1.0)
    steps = 400
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + steps,
                    insert_window=64, record_road_optimality=False)
    policy = Policy(choice=random_choice)
    sa = init_sim_state(net, agents, sim=sim, policy=policy)
    sb = init_sim_state(net_exc, agents, sim=sim, policy=policy)
    fa, _ = run_episode(sa, net, policy, steps, sim=sim)
    fb, _ = run_episode(sb, net_exc, policy, steps, sim=sim)
    np.testing.assert_array_equal(np.asarray(fa.road.fifo_ids),
                                  np.asarray(fb.road.fifo_ids))
    np.testing.assert_array_equal(np.asarray(fa.agents.arrival),
                                  np.asarray(fb.agents.arrival))


def test_multisweep_tile_pad_covers_all_columns(monkeypatch):
    """ADVICE r3 (high): the multisweep pallas callers padded the dest axis
    to the 128 lane but launched grid = d_p // tile_d with tile_d=256 — a
    non-tile-multiple width left the tail columns unrelaxed (and d_p <
    tile_d launched NOTHING).  Force the gate on in interpret mode at a
    width that trips both cases and pin bitwise equality vs the XLA roll
    sweep."""
    from jax.experimental.pallas import tpu as pltpu
    from tarl_tpu.routing import bellman_ford as bf

    i_n = 16
    deltas = (1, 5)
    # Two out-roads per node: tail t -> (t+1) % I (bucket 0, slot t) and
    # tail t -> (t+5) % I (bucket 1, slot i_n + t).
    slot_of_road = np.concatenate([np.arange(i_n), i_n + np.arange(i_n)])
    rng = np.random.default_rng(7)
    road_cost = jnp.asarray(rng.uniform(1.0, 9.0, 2 * i_n), jnp.float32)
    iters = 6

    # inter_out_road is only used for its leading dim (i_n); the bucketed
    # paths never index it.
    dummy_out = np.zeros((i_n, 1), np.int32)
    for d in (320, 100):  # 320: partial last tile; 100: lane pad < one tile
        dist0 = jnp.asarray(rng.uniform(0.0, 50.0, (i_n, d)), jnp.float32)
        buckets = (deltas, jnp.asarray(slot_of_road, jnp.int32), None, None)
        ref = bf._primal_relax(dist0, road_cost, dummy_out, None, None,
                               iters, buckets=buckets)
        # Patch the TILE gate (not _multisweep_ok — _primal_relax calls
        # _multisweep_tile directly; the gate is backend-gated off on CPU).
        monkeypatch.setattr(bf, "_multisweep_tile", lambda *a, **k: 256)
        with pltpu.force_tpu_interpret_mode():
            got = bf._primal_relax(dist0, road_cost, dummy_out, None, None,
                                   iters, buckets=buckets)
        monkeypatch.undo()
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_rowblock_multisweep_bitwise():
    """Row-blocked multisweep (bellman_ford._multisweep_pallas_rowblock and
    the fused next-road form): window halo h = (iters + 1) * max_offset
    contains the rolls' wraparound contamination, so the interior rows are
    bitwise-equal to the full-resident kernel — including at a halo that
    exactly meets the bound and with negative effective offsets."""
    from jax.experimental.pallas import tpu as pltpu
    from tarl_tpu.routing import bellman_ford as bf

    i_n = 64
    deltas = (1, i_n - 1, 4, i_n - 4)   # d_eff = +1, -1, +4, -4
    iters = 3
    block, h = 16, (iters + 1) * 4      # exactly the containment bound
    rng = np.random.default_rng(11)
    b_n = len(deltas)
    b_pad = 128
    w_cols = jnp.full((i_n, b_pad), bf.BIG, jnp.float32).at[:, :b_n].set(
        jnp.asarray(rng.uniform(1.0, 9.0, (i_n, b_n)), jnp.float32)
    )
    d_p = 256
    dist0 = jnp.asarray(rng.uniform(0.0, 50.0, (i_n, d_p)), jnp.float32)
    dist0 = dist0.at[rng.integers(0, i_n, 8), rng.integers(0, d_p, 8)].set(0.0)

    shifts_full = tuple((i_n - d) % i_n for d in deltas)
    with pltpu.force_tpu_interpret_mode():
        full = bf._multisweep_pallas(dist0, w_cols, shifts_full, iters, 128)
        rb = bf._multisweep_pallas_rowblock(dist0, w_cols, deltas, iters,
                                            (block, h, 128))
    np.testing.assert_array_equal(np.asarray(full), np.asarray(rb))

    road_cols = jnp.full((i_n, b_pad), -1.0, jnp.float32).at[:, :b_n].set(
        jnp.asarray(rng.integers(0, 99, (i_n, b_n)), jnp.float32)
    )
    slot_cols = jnp.full((i_n, b_pad), 1e9, jnp.float32).at[:, :b_n].set(
        jnp.asarray(rng.integers(0, 4, (i_n, b_n)), jnp.float32)
    )
    with pltpu.force_tpu_interpret_mode():
        fd, fr = bf._multisweep_nr_pallas(dist0, w_cols, road_cols,
                                          slot_cols, shifts_full, iters, 128)
        rd, rr = bf._multisweep_nr_pallas_rowblock(
            dist0, w_cols, road_cols, slot_cols, deltas, iters,
            (block, h, 128)
        )
    np.testing.assert_array_equal(np.asarray(fd), np.asarray(rd))
    np.testing.assert_array_equal(np.asarray(fr), np.asarray(rr))
