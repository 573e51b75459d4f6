"""Core physics unit tests, mirroring the reference's agent lifecycle tests
(reference tests/agents_test.py) plus ring-buffer/conservation invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tarl_tpu.config import PhysicsConfig
from tarl_tpu.core.direction import direction_step
from tarl_tpu.core.insert import insert_agents
from tarl_tpu.core.response import confirm_step, response_step
from tarl_tpu.core.withdraw import withdraw_agents
from tarl_tpu.network import build_network, default_selected_road
from tarl_tpu.state import init_agent_state, init_road_state


def _single_road_network(capacity_slots=5, fftt=10.0):
    """One road A->B (road 0) plus return link so the dual graph is closed.

    Road capacities are derived from length*lanes/cell_size + 1; choose
    length so MAX_NUMBER_OF_AGENT == capacity_slots.
    """
    length = (capacity_slots - 1) * 7.5
    return build_network(
        length=np.array([length, length]),
        max_flow=np.array([10.0, 10.0]),
        free_speed=np.array([length / fftt, length / fftt]),
        perm_lanes=np.array([1.0, 1.0]),
        from_inter=np.array([0, 1]),
        to_inter=np.array([1, 0]),
        num_intersections=2,
    )


class TestInsertWithdraw:
    def test_insert_and_withdraw(self):
        """Mirrors reference tests/agents_test.py:12-41: two agents insert at
        t=0 onto road 0, cannot withdraw before departure time, withdraw at
        t>=fftt and are marked DONE."""
        net = _single_road_network(capacity_slots=6, fftt=10.0)
        road = init_road_state(net.num_roads, net.nmax)
        agents = init_agent_state(origin=[2, 2], dest=[5, 5], departure=[0.0, 0.0])
        sel = default_selected_road(net)

        t0 = jnp.float32(0.0)
        road, agents = insert_agents(road, agents, sel, net, t0)
        assert int(road.count[0]) == 2
        assert bool(agents.on_way[0]) and bool(agents.on_way[1])
        # FIFO order: agent 0 at head, agent 1 behind.
        assert int(road.head_ids()[0]) == 0
        ids, _, _ = road.logical_view()
        assert int(ids[0, 1]) == 1

        # Not yet departed -> nothing withdrawn.
        road, agents, wcount = withdraw_agents(road, agents, net, t0)
        assert int(road.count[0]) == 2
        assert int(wcount[0]) == 0

        # At t=10 both are due and consecutive from the head -> both leave.
        t1 = jnp.float32(10.0)
        road, agents, wcount = withdraw_agents(road, agents, net, t1)
        assert int(road.count[0]) == 0
        assert int(wcount[0]) == 2
        assert bool(agents.done[0]) and bool(agents.done[1])
        assert not bool(agents.on_way[0])
        assert float(agents.arrival[0]) == 10.0

    def test_withdraw_escalation_matches_unbounded(self):
        """A bounded withdraw_depth with escalation pops the FULL eligible
        head run in one tick — bitwise equal to the unbounded scan — while
        the non-escalated bound pops exactly ``depth`` (the documented
        burst-spreading behavior)."""
        net = _single_road_network(capacity_slots=12, fftt=10.0)
        road0 = init_road_state(net.num_roads, net.nmax)
        n = 6
        agents0 = init_agent_state(
            origin=[2] * n, dest=[5] * n, departure=[0.0] * n
        )
        sel = default_selected_road(net)
        road0, agents0 = insert_agents(
            road0, agents0, sel, net, jnp.float32(0.0)
        )
        assert int(road0.count[0]) == n
        t = jnp.float32(50.0)

        exact_road, exact_agents, exact_w = withdraw_agents(
            road0, agents0, net, t, depth=None
        )
        assert int(exact_w[0]) == n

        esc_road, esc_agents, esc_w = withdraw_agents(
            road0, agents0, net, t, depth=2, escalate=True
        )
        np.testing.assert_array_equal(
            np.asarray(exact_w), np.asarray(esc_w)
        )
        np.testing.assert_array_equal(
            np.asarray(exact_road.head), np.asarray(esc_road.head)
        )
        np.testing.assert_array_equal(
            np.asarray(exact_road.count), np.asarray(esc_road.count)
        )
        np.testing.assert_array_equal(
            np.asarray(exact_agents.arrival), np.asarray(esc_agents.arrival)
        )

        plain_road, _, plain_w = withdraw_agents(
            road0, agents0, net, t, depth=2, escalate=False
        )
        assert int(plain_w[0]) == 2
        assert int(plain_road.count[0]) == n - 2

    def test_insert_capacity_limit(self):
        """Mirrors reference tests/agents_test.py:43-73: capacity 5 minus the
        CONGESTION_FILE buffer (3) admits exactly 2 of 4 ready agents."""
        net = _single_road_network(capacity_slots=5)
        road = init_road_state(net.num_roads, net.nmax)
        agents = init_agent_state(
            origin=[2, 2, 2, 2], dest=[5, 5, 5, 5], departure=[0.0] * 4
        )
        sel = default_selected_road(net)
        road, agents = insert_agents(road, agents, sel, net, jnp.float32(0.0))
        assert int(road.count[0]) == 2
        assert bool(agents.on_way[0]) and bool(agents.on_way[1])
        assert not bool(agents.on_way[2]) and not bool(agents.on_way[3])

    def test_insert_respects_departure_time(self):
        net = _single_road_network(capacity_slots=8)
        road = init_road_state(net.num_roads, net.nmax)
        agents = init_agent_state(
            origin=[2, 2], dest=[5, 5], departure=[0.0, 100.0]
        )
        sel = default_selected_road(net)
        road, agents = insert_agents(road, agents, sel, net, jnp.float32(0.0))
        assert int(road.count[0]) == 1
        assert not bool(agents.on_way[1])

    def test_departure_time_congestion_formula(self):
        """departure = time + max(fftt, congestion_constant/(cap+10-count))
        (agents/base.py:313-325)."""
        net = _single_road_network(capacity_slots=6, fftt=10.0)
        road = init_road_state(net.num_roads, net.nmax)
        agents = init_agent_state(origin=[2], dest=[5], departure=[0.0])
        sel = default_selected_road(net)
        road, agents = insert_agents(road, agents, sel, net, jnp.float32(0.0))
        cap = float(net.capacity[0])
        cc = float(net.congestion_constant[0])
        expected = max(10.0, cc / (cap + 10.0 - 0.0))
        assert float(road.head_departure()[0]) == pytest.approx(expected, rel=1e-5)


def _chain_network():
    """Three roads in a cycle 0 -> 1 -> 2 -> 0 (the braess_graph topology of
    reference tests/conftest.py:45-91), built from a 3-intersection loop."""
    return build_network(
        length=np.array([75.0, 75.0, 75.0]),
        max_flow=np.array([10.0, 10.0, 10.0]),
        free_speed=np.array([7.5, 7.5, 7.5]),
        perm_lanes=np.array([1.0, 1.0, 1.0]),
        from_inter=np.array([0, 1, 2]),
        to_inter=np.array([1, 2, 0]),
        num_intersections=3,
    )


class TestDirectionResponse:
    def test_transfer_moves_one_agent(self):
        """An agent past its departure time moves from road 0 to road 1 via
        direction + response; counts are conserved."""
        net = _chain_network()
        road = init_road_state(net.num_roads, net.nmax)
        agents = init_agent_state(
            origin=[0, 3], dest=[100, 100], departure=[1e9, 1e9]
        )
        # Hand-place agent 1 on road 0, due to leave at t=5.
        road = road._replace(
            fifo_ids=road.fifo_ids.at[0, 0].set(1),
            fifo_arrival=road.fifo_arrival.at[0, 0].set(0.0),
            fifo_departure=road.fifo_departure.at[0, 0].set(5.0),
            count=road.count.at[0].set(1),
        )
        sel = jnp.array([1, 2, 0] + [-1] * 6, dtype=jnp.int32)

        key = jax.random.PRNGKey(0)
        t = jnp.float32(10.0)
        road2, delta, accept, win_src = direction_step(road, sel, net, t, key)
        # Road 1 received the agent at its tail.
        assert int(road2.count[1]) == 1
        assert int(road2.tail_ids()[1]) == 1
        # Road 0 still holds it until the response confirms.
        assert int(road2.count[0]) == 1

        road3, popped = confirm_step(road2, accept, win_src)
        assert int(road3.count[0]) == 0
        assert bool(popped[0])
        assert not bool(popped[1])
        assert int(jnp.sum(road3.count)) == 1

    def test_no_transfer_before_departure(self):
        net = _chain_network()
        road = init_road_state(net.num_roads, net.nmax)
        road = road._replace(
            fifo_ids=road.fifo_ids.at[0, 0].set(1),
            fifo_departure=road.fifo_departure.at[0, 0].set(50.0),
            count=road.count.at[0].set(1),
        )
        sel = jnp.array([1, 2, 0] + [-1] * 6, dtype=jnp.int32)
        road2, _, _a, _w = direction_step(road, sel, net, jnp.float32(10.0), jax.random.PRNGKey(0))
        assert int(road2.count[1]) == 0
        road3, popped = confirm_step(road2, _a, _w)
        assert int(jnp.sum(popped)) == 0

    def test_no_transfer_wrong_selection(self):
        net = _chain_network()
        road = init_road_state(net.num_roads, net.nmax)
        road = road._replace(
            fifo_ids=road.fifo_ids.at[0, 0].set(1),
            fifo_departure=road.fifo_departure.at[0, 0].set(0.0),
            count=road.count.at[0].set(1),
        )
        # Road 0 selects road 2, but its only turn edge goes to road 1.
        sel = jnp.array([2, 2, 0] + [-1] * 6, dtype=jnp.int32)
        road2, _, _a, _w = direction_step(road, sel, net, jnp.float32(10.0), jax.random.PRNGKey(0))
        assert int(road2.count[1]) == 0

    def test_full_downstream_blocks(self):
        net = _chain_network()
        cap1 = int(net.capacity[1])
        road = init_road_state(net.num_roads, net.nmax)
        road = road._replace(
            fifo_ids=road.fifo_ids.at[0, 0].set(1),
            fifo_departure=road.fifo_departure.at[0, 0].set(0.0),
            # fill road 1 to capacity - CONGESTION_FILE
            count=road.count.at[0].set(1).at[1].set(cap1 - 3),
        )
        sel = jnp.array([1, 2, 0] + [-1] * 6, dtype=jnp.int32)
        road2, _, _a, _w = direction_step(road, sel, net, jnp.float32(10.0), jax.random.PRNGKey(0))
        assert int(road2.count[1]) == cap1 - 3  # unchanged

    def test_gridlock_escape(self):
        """Stuck >10 s + upstream nearly full + downstream at least as free
        -> transfer allowed into the congestion buffer (direction_mpnn.py:87-90)."""
        net = _chain_network()
        cap0 = int(net.capacity[0])
        cap1 = int(net.capacity[1])
        road = init_road_state(net.num_roads, net.nmax)
        ids0 = jnp.arange(1, cap0 - 3 + 1, dtype=jnp.int32)
        road = road._replace(
            fifo_ids=road.fifo_ids.at[0, : cap0 - 3].set(ids0),
            fifo_departure=road.fifo_departure.at[0, : cap0 - 3].set(0.0),
            count=road.count.at[0].set(cap0 - 3).at[1].set(cap1 - 3),
        )
        sel = jnp.array([1, 2, 0] + [-1] * 6, dtype=jnp.int32)
        # t - departure = 20 > 10 -> gridlock path; downstream equally free.
        road2, _, _a, _w = direction_step(road, sel, net, jnp.float32(20.0), jax.random.PRNGKey(0))
        assert int(road2.count[1]) == cap1 - 3 + 1


class TestRingBuffer:
    def test_wraparound(self):
        """Pushes and pops across the physical end of the buffer keep logical
        FIFO order."""
        net = _single_road_network(capacity_slots=6)
        road = init_road_state(net.num_roads, net.nmax)
        nmax = net.nmax
        # Start head near the end so pushes wrap.
        road = road._replace(head=road.head.at[0].set(nmax - 1))
        agents = init_agent_state(
            origin=[2, 2, 2], dest=[5, 5, 5], departure=[0.0, 0.0, 0.0]
        )
        sel = default_selected_road(net)
        road, agents = insert_agents(road, agents, sel, net, jnp.float32(0.0))
        assert int(road.count[0]) == 3
        ids, _, _ = road.logical_view()
        np.testing.assert_array_equal(np.asarray(ids[0, :3]), [0, 1, 2])
        # Withdraw pops them in order.
        road, agents, _ = withdraw_agents(road, agents, net, jnp.float32(100.0))
        assert int(road.count[0]) == 0
        assert bool(agents.done[2])


class TestStaleRingSlots:
    """Regression for the ring-buffer stale-head class of bugs: popped slots
    keep their contents, so every head accessor must report the dummy
    sentinel for EMPTY roads (the reference's zero-filled FIFO invariant)."""

    def _wrapped_empty_road(self, net):
        """A road whose buffer wrapped (head mid-buffer) and then emptied,
        leaving a stale agent id at the head slot."""
        road = init_road_state(net.num_roads, net.nmax)
        return road._replace(
            fifo_ids=road.fifo_ids.at[0, 2].set(9),
            fifo_departure=road.fifo_departure.at[0, 2].set(1.0),
            head=road.head.at[0].set(2),
            count=road.count.at[0].set(0),  # empty!
        )

    def test_head_accessors_return_sentinel(self):
        net = _chain_network()
        road = self._wrapped_empty_road(net)
        assert int(road.head_ids()[0]) == 0
        assert float(road.head_departure()[0]) == 0.0
        assert float(road.head_arrival()[0]) == 0.0

    def test_no_ghost_transfer_from_empty_road(self):
        """Empty road with stale slot + gridlock-friendly conditions must not
        emit its stale agent (previously duplicated the agent and, in the
        fused path, drove count to -1)."""
        net = _chain_network()
        road = self._wrapped_empty_road(net)
        sel = jnp.array([1, 2, 0] + [-1] * 6, dtype=jnp.int32)
        t = jnp.float32(100.0)  # stale departure long past -> "stuck"
        road2, _, _a, _w = direction_step(road, sel, net, t, jax.random.PRNGKey(0))
        assert int(road2.count[1]) == 0
        road3, popped = confirm_step(road2, _a, _w)
        assert int(jnp.sum(popped)) == 0
        assert int(road3.count.min()) >= 0

    def test_no_ghost_transfer_fused(self):
        from jax.experimental.pallas import tpu as pltpu

        from tarl_tpu.core.fused_core import fused_core_step

        net = _chain_network()
        road = self._wrapped_empty_road(net)
        sel = jnp.array([1, 2, 0] + [-1] * 6, dtype=jnp.int32)
        with pltpu.force_tpu_interpret_mode():
            road2, popped, _ = fused_core_step(
                road, sel, net, jnp.float32(100.0), jax.random.PRNGKey(0)
            )
        assert int(road2.count[1]) == 0
        assert int(jnp.sum(popped)) == 0
        assert int(road2.count.min()) >= 0

    def test_gridlock_cannot_overflow_ring(self):
        """Sustained gridlock pushes stop at the hard slot capacity instead of
        wrapping the ring write onto the head slot."""
        net = _chain_network()
        cap1 = int(net.capacity[1])
        road = init_road_state(net.num_roads, net.nmax)
        ids0 = jnp.arange(1, int(net.capacity[0]) - 3 + 1, dtype=jnp.int32)
        road = road._replace(
            fifo_ids=road.fifo_ids.at[0, : ids0.shape[0]].set(ids0),
            count=road.count.at[0].set(ids0.shape[0]).at[1].set(cap1),
        )
        sel = jnp.array([1, 2, 0] + [-1] * 6, dtype=jnp.int32)
        road2, _, _a, _w = direction_step(road, sel, net, jnp.float32(100.0),
                                  jax.random.PRNGKey(0))
        assert int(road2.count[1]) == cap1  # no push past hard capacity


class TestNeighborTableBF:
    def test_nbr_matches_edge_list_bf(self):
        """The gather-based padded-neighbor relaxation must produce exactly
        the same distances and next hops as the edge-list formulation
        (same tie-break: neighbor slots follow edge order)."""
        import os

        from tarl_tpu.io.matsim import load_network
        from tarl_tpu.io.scenarios import ensure_scenario
        from tarl_tpu.routing.bellman_ford import (
            all_pairs_next_hop,
            all_pairs_next_hop_nbr,
        )

        import tempfile

        root = tempfile.mkdtemp()
        base = ensure_scenario(root, "Grid4x4")
        net = load_network(os.path.join(base, "network"))
        rng = np.random.default_rng(0)
        cost = jnp.asarray(
            np.where(np.arange(net.num_nodes) < net.num_roads,
                     rng.uniform(1.0, 50.0, net.num_nodes), 0.0),
            dtype=jnp.float32,
        )
        d1, h1 = all_pairs_next_hop(net.full_src, net.full_dst, cost,
                                    net.num_nodes)
        d2, h2 = all_pairs_next_hop_nbr(net.nbr, net.nbr_ok, cost)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


class TestPrimalRouting:
    """The primal (intersection-graph) routing backend must agree with the
    dual-node tables: every dual distance is recoverable from the primal
    ones, and a full dijkstra episode must produce identical outcomes."""

    def _net(self, tmp_path_factory=None):
        import os
        import tempfile

        from tarl_tpu.io.matsim import load_network
        from tarl_tpu.io.scenarios import ensure_scenario

        root = tempfile.mkdtemp()
        base = ensure_scenario(root, "Grid4x4")
        return load_network(os.path.join(base, "network")), base

    def test_delta_bucket_sweep_matches_gather_sweep(self):
        """The roll-based delta-bucketed sweep (VERDICT r2 #4: routing
        refresh at HBM bandwidth) must be bitwise-equal to the gather sweep
        — min-plus is exact, so bucketing only reorders an exact reduction."""
        from tarl_tpu.routing.bellman_ford import (
            primal_all_pairs_dist,
            primal_delta_buckets,
            primal_dest_dist,
        )

        net, _ = self._net()
        rng = np.random.default_rng(3)
        road_cost = jnp.asarray(
            rng.uniform(1.0, 50.0, net.num_roads), dtype=jnp.float32
        )
        b = primal_delta_buckets(
            net.inter_out_road, net.inter_out_ok, net.road_to
        )
        assert b is not None, "grid networks must bucket into few deltas"
        shifts, slot, perm, inv = b
        assert perm is None, "no coords given -> identity row order"
        d_gather = primal_all_pairs_dist(
            road_cost, net.inter_out_road, net.inter_out_ok, net.road_to
        )
        d_delta = primal_all_pairs_dist(
            road_cost, net.inter_out_road, net.inter_out_ok, net.road_to,
            delta_shifts=shifts, delta_slot=slot,
        )
        np.testing.assert_array_equal(np.asarray(d_gather), np.asarray(d_delta))

        dests = jnp.asarray([0, 3, net.num_intersections - 1], jnp.int32)
        dd_gather = primal_dest_dist(
            road_cost, net.inter_out_road, net.inter_out_ok, net.road_to,
            dests,
        )
        dd_delta = primal_dest_dist(
            road_cost, net.inter_out_road, net.inter_out_ok, net.road_to,
            dests, delta_shifts=shifts, delta_slot=slot,
        )
        np.testing.assert_array_equal(
            np.asarray(dd_gather), np.asarray(dd_delta)
        )

        # Coordinate row order: on grids wide enough for double-digit node
        # ids the sorted-id-STRING ordinals scramble rows ("n0_10" < "n0_2"
        # — many distinct offsets); lexsort(y, x) must recover the 4-offset
        # row-major form, and the row-permuted sweep must stay bitwise-equal
        # to the gather sweep (same float pairings, rows merely relabeled
        # inside the refresh).
        import os
        import tempfile

        from tarl_tpu.io.matsim import load_network
        from tarl_tpu.io.scenarios import grid_scenario

        root = tempfile.mkdtemp()
        base12 = grid_scenario(root, "PermGrid12", rows=12, cols=12,
                               num_agents=10)
        net12 = load_network(os.path.join(base12, "network"))
        rc12 = jnp.asarray(
            rng.uniform(1.0, 50.0, net12.num_roads), dtype=jnp.float32
        )
        b_id = primal_delta_buckets(
            net12.inter_out_road, net12.inter_out_ok, net12.road_to
        )
        bp = primal_delta_buckets(
            net12.inter_out_road, net12.inter_out_ok, net12.road_to,
            coords=(net12.inter_x, net12.inter_y),
        )
        p_shifts, p_slot, p_perm, p_inv = bp
        assert p_perm is not None, "grid coords must beat identity order"
        assert len(p_shifts) < len(b_id[0])
        assert len(p_shifts) <= 4
        d12_gather = primal_all_pairs_dist(
            rc12, net12.inter_out_road, net12.inter_out_ok, net12.road_to
        )
        dp = primal_all_pairs_dist(
            rc12, net12.inter_out_road, net12.inter_out_ok, net12.road_to,
            delta_shifts=p_shifts, delta_slot=p_slot,
            delta_perm=p_perm, delta_inv=p_inv,
        )
        np.testing.assert_array_equal(np.asarray(d12_gather), np.asarray(dp))
        dests12 = jnp.asarray([0, 7, net12.num_intersections - 1], jnp.int32)
        ddp_gather = primal_dest_dist(
            rc12, net12.inter_out_road, net12.inter_out_ok, net12.road_to,
            dests12,
        )
        ddp = primal_dest_dist(
            rc12, net12.inter_out_road, net12.inter_out_ok, net12.road_to,
            dests12, delta_shifts=p_shifts, delta_slot=p_slot,
            delta_perm=p_perm, delta_inv=p_inv,
        )
        np.testing.assert_array_equal(np.asarray(ddp_gather), np.asarray(ddp))

    def test_primal_dist_matches_dual(self):
        from tarl_tpu.routing.bellman_ford import (
            all_pairs_next_hop_nbr,
            primal_all_pairs_dist,
        )

        net, _ = self._net()
        rng = np.random.default_rng(1)
        road_cost = jnp.asarray(
            rng.uniform(1.0, 50.0, net.num_roads), dtype=jnp.float32
        )
        cost = jnp.zeros((net.num_nodes,), jnp.float32).at[
            : net.num_roads
        ].set(road_cost)
        d_dual, _ = all_pairs_next_hop_nbr(net.nbr, net.nbr_ok, cost)
        d_pri = primal_all_pairs_dist(
            road_cost, net.inter_out_road, net.inter_out_ok, net.road_to
        )
        R, I = net.num_roads, net.num_intersections
        dest_cols = R + 2 * np.arange(I) + 1  # DEST dual nodes
        # dual dist road -> DEST == primal dist head-intersection -> intersection
        np.testing.assert_allclose(
            np.asarray(d_dual[:R, dest_cols]),
            np.asarray(d_pri[np.asarray(net.road_to)]),
            rtol=1e-6,
        )
        # dual dist SRC -> DEST == min over entry roads of cost + primal dist
        src_rows = R + 2 * np.arange(I)
        out_r = np.asarray(net.inter_out_road)
        ok = np.asarray(net.inter_out_ok)
        cand = np.where(
            ok[:, :, None],
            np.asarray(road_cost)[out_r][:, :, None]
            + np.asarray(d_pri)[np.asarray(net.road_to)[out_r]],
            np.inf,
        ).min(axis=1)
        np.testing.assert_allclose(
            np.asarray(d_dual[src_rows][:, dest_cols]), cand, rtol=1e-6
        )

    @pytest.mark.parametrize("scenario", ["Easy", "Grid4x4"])
    def test_primal_episode_matches_dual(self, scenario, tmp_path):
        """Full dijkstra episodes under both backends end bitwise-identical."""
        import os
        import tempfile

        from tarl_tpu.config import RoutingConfig, SimConfig
        from tarl_tpu.core.step import init_sim_state, run_episode
        from tarl_tpu.io.matsim import load_network, load_population
        from tarl_tpu.io.scenarios import ensure_scenario
        from tarl_tpu.simulator import make_policy

        root = tempfile.mkdtemp()
        base = ensure_scenario(root, scenario)
        net = load_network(os.path.join(base, "network"))
        agents, _ = load_population(
            os.path.join(base, "population"), os.path.join(base, "network")
        )
        sim = SimConfig(start_time=6 * 3600 - 60, timestep=1)
        finals = {}
        for backend in ("dual", "primal"):
            pol = make_policy(
                "dijkstra", RoutingConfig(backend=backend), network=net
            )
            s0 = init_sim_state(net, agents, policy=pol, sim=sim)
            final, _ = run_episode(s0, net, pol, 1500, sim=sim)
            finals[backend] = final
        np.testing.assert_array_equal(
            np.asarray(finals["dual"].agents.arrival),
            np.asarray(finals["primal"].agents.arrival),
        )
        np.testing.assert_array_equal(
            np.asarray(finals["dual"].road.count),
            np.asarray(finals["primal"].road.count),
        )
        assert int(finals["primal"].agents.done[1:].sum()) > 0


class TestDestRestrictedPrimal:
    """The destination-restricted primal tables (dist[I, D]) must agree with
    the all-pairs backend wherever a column exists, and a full episode with
    the restriction covering the population's destinations must be
    bitwise-identical to the unrestricted primal episode."""

    def test_dest_dist_matches_all_pairs(self):
        import os
        import tempfile

        from tarl_tpu.io.matsim import load_network
        from tarl_tpu.io.scenarios import ensure_scenario
        from tarl_tpu.routing.bellman_ford import (
            primal_all_pairs_dist,
            primal_dest_dist,
        )

        root = tempfile.mkdtemp()
        base = ensure_scenario(root, "Grid4x4")
        net = load_network(os.path.join(base, "network"))
        rng = np.random.default_rng(2)
        cost = jnp.asarray(rng.uniform(1.0, 50.0, net.num_roads), jnp.float32)
        dests = jnp.asarray([1, 5, 11], jnp.int32)
        full = primal_all_pairs_dist(
            cost, net.inter_out_road, net.inter_out_ok, net.road_to
        )
        restricted = primal_dest_dist(
            cost, net.inter_out_road, net.inter_out_ok, net.road_to, dests
        )
        np.testing.assert_array_equal(
            np.asarray(full[:, np.asarray(dests)]), np.asarray(restricted)
        )

    def test_dest_restricted_episode_matches_full(self, tmp_path):
        import os
        import tempfile

        from tarl_tpu.config import RoutingConfig, SimConfig
        from tarl_tpu.core.step import init_sim_state, run_episode
        from tarl_tpu.io.matsim import load_network, load_population
        from tarl_tpu.io.scenarios import ensure_scenario
        from tarl_tpu.simulator import make_policy

        root = tempfile.mkdtemp()
        base = ensure_scenario(root, "Grid4x4")
        net = load_network(os.path.join(base, "network"))
        agents, _ = load_population(
            os.path.join(base, "population"), os.path.join(base, "network")
        )
        dest_inters = np.unique(
            (np.asarray(agents.dest[1:]) - net.num_roads - 1) // 2
        )
        sim = SimConfig(start_time=6 * 3600 - 60, timestep=1)
        finals = {}
        for tag, kwargs in (
            ("full", {}),
            ("restricted", {"dest_inters": dest_inters}),
        ):
            pol = make_policy(
                "dijkstra", RoutingConfig(backend="primal"), network=net,
                **kwargs,
            )
            s0 = init_sim_state(net, agents, policy=pol, sim=sim)
            final, _ = run_episode(s0, net, pol, 1500, sim=sim)
            finals[tag] = final
        np.testing.assert_array_equal(
            np.asarray(finals["full"].agents.arrival),
            np.asarray(finals["restricted"].agents.arrival),
        )
        np.testing.assert_array_equal(
            np.asarray(finals["full"].road.count),
            np.asarray(finals["restricted"].road.count),
        )
        assert int(finals["restricted"].agents.done[1:].sum()) > 0


class TestPingPongConfirm:
    """Regression for the reference's response double-fire (documented
    deviation, core/response.py): when agent a transfers u -> v onto an
    empty v on an opposing road pair (u = A->B, v = B->A), the reference's
    tail(v)==head(u) confirm also fires on the reverse edge (v -> u) —
    v pops the agent it just received and a vanishes from the network.
    confirm_step pops exactly the Gumbel-max winners and conserves agents."""

    def _setup(self):
        net = _single_road_network(capacity_slots=6, fftt=10.0)
        road = init_road_state(net.num_roads, net.nmax)
        # Agent 7 sits at road 0's head, due to move, selected road 1
        # (the opposing link); road 1 is empty.
        road = road._replace(
            fifo_ids=road.fifo_ids.at[0, 0].set(7),
            fifo_departure=road.fifo_departure.at[0, 0].set(0.0),
            count=road.count.at[0].set(1),
        )
        sel = jnp.array([1, 0] + [-1] * (net.num_nodes - 2), dtype=jnp.int32)
        return net, road, sel

    def test_legacy_tail_head_check_double_fires(self):
        net, road, sel = self._setup()
        road2, _, accept, win = direction_step(
            road, sel, net, jnp.float32(10.0), jax.random.PRNGKey(0)
        )
        assert bool(accept[1]) and int(win[1]) == 0  # 7 moved 0 -> 1
        legacy, popped = response_step(road2, net)
        # The reference formulation pops BOTH roads: the legit winner (0)
        # and road 1, which loses the agent it just received.
        assert bool(popped[0]) and bool(popped[1])
        assert int(jnp.sum(legacy.count)) == 0  # agent 7 vanished

    def test_confirm_step_conserves(self):
        net, road, sel = self._setup()
        road2, _, accept, win = direction_step(
            road, sel, net, jnp.float32(10.0), jax.random.PRNGKey(0)
        )
        fixed, popped = confirm_step(road2, accept, win)
        assert bool(popped[0]) and not bool(popped[1])
        assert int(jnp.sum(fixed.count)) == 1
        assert int(fixed.head_ids()[1]) == 7


class TestPeriodicEpisode:
    """run_episode_periodic (refresh hoisted into a nested scan) must be
    bitwise-identical to run_episode's per-tick lax.cond form — final state
    AND per-tick logs — for every backend carrying the refresh/lookup
    split."""

    @pytest.mark.parametrize("backend,dest_restricted", [
        pytest.param("primal", False, marks=pytest.mark.slow),
        pytest.param("primal", True, marks=pytest.mark.slow),
        ("dual", False),
    ])
    def test_periodic_matches_plain(self, backend, dest_restricted):
        import os
        import tempfile

        from tarl_tpu.config import RoutingConfig, SimConfig
        from tarl_tpu.core.step import (
            init_sim_state,
            run_episode,
            run_episode_periodic,
        )
        from tarl_tpu.io.matsim import load_network, load_population
        from tarl_tpu.io.scenarios import ensure_scenario
        from tarl_tpu.simulator import make_policy

        root = tempfile.mkdtemp()
        base = ensure_scenario(root, "Grid4x4")
        net = load_network(os.path.join(base, "network"))
        agents, _ = load_population(
            os.path.join(base, "population"), os.path.join(base, "network")
        )
        kwargs = {}
        if dest_restricted:
            kwargs["dest_inters"] = np.unique(
                (np.asarray(agents.dest[1:]) - net.num_roads - 1) // 2
            )
        pol = make_policy(
            "dijkstra",
            RoutingConfig(backend=backend, refresh_rate=5, max_bf_iters=8),
            network=net, **kwargs,
        )
        assert pol.periodic_rate == 5
        sim = SimConfig(start_time=6 * 3600 - 60, timestep=1)
        s0 = init_sim_state(net, agents, policy=pol, sim=sim)
        # Two chunks, each a multiple of the rate (the caller contract).
        fa, la = run_episode(s0, net, pol, 40, sim=sim)
        fa, la2 = run_episode(fa, net, pol, 25, sim=sim)
        fb, lb = run_episode_periodic(s0, net, pol, 40, sim=sim)
        fb, lb2 = run_episode_periodic(fb, net, pol, 25, sim=sim)
        for a, b in zip(jax.tree_util.tree_leaves(fa),
                        jax.tree_util.tree_leaves(fb)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves((la, la2)),
                        jax.tree_util.tree_leaves((lb, lb2))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_periodic_rejects_misaligned_steps(self):
        import os
        import tempfile

        from tarl_tpu.config import RoutingConfig, SimConfig
        from tarl_tpu.core.step import init_sim_state, run_episode_periodic
        from tarl_tpu.io.matsim import load_network, load_population
        from tarl_tpu.io.scenarios import ensure_scenario
        from tarl_tpu.simulator import make_policy

        root = tempfile.mkdtemp()
        base = ensure_scenario(root, "Grid4x4")
        net = load_network(os.path.join(base, "network"))
        agents, _ = load_population(
            os.path.join(base, "population"), os.path.join(base, "network")
        )
        pol = make_policy(
            "dijkstra", RoutingConfig(backend="primal", refresh_rate=7),
            network=net,
        )
        sim = SimConfig(start_time=6 * 3600 - 60, timestep=1)
        s0 = init_sim_state(net, agents, policy=pol, sim=sim)
        with pytest.raises(ValueError, match="not a multiple"):
            run_episode_periodic(s0, net, pol, 40, sim=sim)


class TestNextRoadEpilogue:
    """The in-kernel next-road epilogue (bellman_ford.primal_relax_next_roads)
    must reproduce primal_next_roads' ascending-slot strict-< tie-break via
    its lexicographic (value, slot-rank) compare — including under heavy
    ties (uniform costs) and a row permutation."""

    def _emulate_epilogue(self, bf, dist, cost, buckets, epi, i_n):
        import jax.numpy as jnp

        deltas, _, perm, inv = buckets
        out_r_p, ok_p, b_slot_p = epi
        b_pad = bf._round_up_lane(len(deltas))
        w, road, slot = bf._epilogue_rep_tables(
            cost, out_r_p, ok_p, b_slot_p, b_pad
        )
        final = dist if perm is None else dist[perm]
        best = jnp.full(final.shape, bf.BIG, jnp.float32)
        rd = jnp.full(final.shape, -1.0, jnp.float32)
        bslot = jnp.full(final.shape, 1e9, jnp.float32)
        for b, d in enumerate(deltas):
            cand = w[:, b:b + 1] + jnp.roll(final, -int(d), axis=0)
            sl = jnp.broadcast_to(slot[:, b:b + 1], final.shape)
            take = (cand < best) | ((cand == best) & (sl < bslot))
            best = jnp.where(take, cand, best)
            rd = jnp.where(take, jnp.broadcast_to(road[:, b:b + 1],
                                                  final.shape), rd)
            bslot = jnp.where(take, sl, bslot)
        out = jnp.where(best < bf.BIG, rd, -1.0)
        return out if inv is None else out[inv]

    @pytest.mark.parametrize("tie_heavy", [False, True])
    def test_epilogue_matches_gather_next_roads(self, tmp_path, tie_heavy):
        from tarl_tpu.io.matsim import load_network
        from tarl_tpu.io.scenarios import grid_scenario
        from tarl_tpu.routing import bellman_ford as bf

        import os

        base = grid_scenario(str(tmp_path), "EpiGrid12", rows=12, cols=12,
                             num_agents=10)
        net = load_network(os.path.join(base, "network"))
        i_n = net.num_intersections
        if tie_heavy:
            cost = jnp.full((net.num_roads,), 14.39, jnp.float32)
        else:
            rng = np.random.default_rng(7)
            cost = jnp.asarray(
                rng.uniform(1.0, 50.0, net.num_roads), jnp.float32
            )
        buckets = bf.primal_delta_buckets(
            net.inter_out_road, net.inter_out_ok, net.road_to,
            coords=(net.inter_x, net.inter_y),
        )
        assert buckets[2] is not None  # permuted order in play
        epi = bf.epilogue_slot_tables(
            net.inter_out_road, net.inter_out_ok, net.road_to, buckets
        )
        dist = bf.primal_all_pairs_dist(
            cost, net.inter_out_road, net.inter_out_ok, net.road_to
        )
        want = bf.primal_next_roads(
            dist, cost, net.inter_out_road, net.inter_out_ok, net.road_to
        )
        got = self._emulate_epilogue(bf, dist, cost, buckets, epi, i_n)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    def test_fused_handles_disabled_buckets(self, tmp_path):
        """primal_delta_buckets DECLINES on irregular nets (too many
        distinct offsets) by returning an all-None 4-tuple; the fused entry
        point and _primal_relax must treat that as no-bucketing instead of
        len(None)-crashing (regression: radial metro at 64x128)."""
        from tarl_tpu.io.matsim import load_network
        from tarl_tpu.io.scenarios import grid_scenario
        from tarl_tpu.routing import bellman_ford as bf

        import os

        base = grid_scenario(str(tmp_path), "EpiGrid6", rows=6, cols=6,
                             num_agents=10)
        net = load_network(os.path.join(base, "network"))
        i_n = net.num_intersections
        rng = np.random.default_rng(3)
        cost = jnp.asarray(rng.uniform(1.0, 50.0, net.num_roads), jnp.float32)
        eye = jnp.eye(i_n, dtype=bool)
        dist0 = jnp.where(eye, 0.0, jnp.full((i_n, i_n), bf.BIG))
        d_a, r_a = bf.primal_relax_next_roads(
            cost, net.inter_out_road, net.inter_out_ok, net.road_to,
            dist0, None, buckets=(None, None, None, None), epi_tables=None,
        )
        d_b, r_b = bf.primal_relax_next_roads(
            cost, net.inter_out_road, net.inter_out_ok, net.road_to,
            dist0, None, buckets=None, epi_tables=None,
        )
        np.testing.assert_array_equal(np.asarray(d_a), np.asarray(d_b))
        np.testing.assert_array_equal(np.asarray(r_a), np.asarray(r_b))

    def test_fused_fallback_matches_two_step(self, tmp_path):
        """primal_relax_next_roads' fallback path (gate off on CPU) must
        equal primal_all_pairs_dist + primal_next_roads bitwise."""
        from tarl_tpu.io.matsim import load_network
        from tarl_tpu.io.scenarios import grid_scenario
        from tarl_tpu.routing import bellman_ford as bf

        import os

        base = grid_scenario(str(tmp_path), "EpiGrid8", rows=8, cols=8,
                             num_agents=10)
        net = load_network(os.path.join(base, "network"))
        i_n = net.num_intersections
        rng = np.random.default_rng(11)
        cost = jnp.asarray(rng.uniform(1.0, 50.0, net.num_roads), jnp.float32)
        buckets = bf.primal_delta_buckets(
            net.inter_out_road, net.inter_out_ok, net.road_to,
            coords=(net.inter_x, net.inter_y),
        )
        epi = bf.epilogue_slot_tables(
            net.inter_out_road, net.inter_out_ok, net.road_to, buckets
        )
        eye = jnp.eye(i_n, dtype=bool)
        ff = bf.primal_all_pairs_dist(
            cost, net.inter_out_road, net.inter_out_ok, net.road_to
        )
        dist0 = jnp.where(eye, 0.0, jnp.minimum(ff * 1.5, bf.BIG))
        d_fused, r_fused = bf.primal_relax_next_roads(
            cost, net.inter_out_road, net.inter_out_ok, net.road_to,
            dist0, 8, buckets=buckets, epi_tables=epi,
        )
        d_want = bf.primal_all_pairs_dist(
            cost, net.inter_out_road, net.inter_out_ok, net.road_to,
            max_iters=8, dist0=jnp.minimum(ff * 1.5, bf.BIG),
            delta_shifts=buckets[0], delta_slot=buckets[1],
            delta_perm=buckets[2], delta_inv=buckets[3],
        )
        r_want = bf.primal_next_roads(
            d_want, cost, net.inter_out_road, net.inter_out_ok, net.road_to
        )
        np.testing.assert_array_equal(np.asarray(d_want), np.asarray(d_fused))
        np.testing.assert_array_equal(np.asarray(r_want), np.asarray(r_fused))
