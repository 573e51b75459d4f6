"""Fused Pallas edge-phase kernel: correctness in interpret mode vs the jnp
direction+response pair (distribution-equivalent sampling; deterministic
cases must match exactly)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tarl_tpu.core.direction import direction_step
from tarl_tpu.core.fused_core import fused_core_step
from tarl_tpu.core.response import confirm_step
from tarl_tpu.network import build_network
from tarl_tpu.state import init_road_state


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _chain_network():
    return build_network(
        length=np.array([75.0, 75.0, 75.0]),
        max_flow=np.array([10.0, 10.0, 10.0]),
        free_speed=np.array([7.5, 7.5, 7.5]),
        perm_lanes=np.array([1.0, 1.0, 1.0]),
        from_inter=np.array([0, 1, 2]),
        to_inter=np.array([1, 2, 0]),
        num_intersections=3,
    )


def _seed_agent(road, r, agent_id, dep):
    return road._replace(
        fifo_ids=road.fifo_ids.at[r, 0].set(agent_id),
        fifo_departure=road.fifo_departure.at[r, 0].set(dep),
        count=road.count.at[r].set(1),
    )


class TestFusedCore:
    def test_single_transfer_matches_jnp(self):
        net = _chain_network()
        road = _seed_agent(init_road_state(net.num_roads, net.nmax), 0, 7, 5.0)
        sel = jnp.array([1, 2, 0] + [-1] * 6, dtype=jnp.int32)
        t = jnp.float32(10.0)

        f_road, f_popped, _ = fused_core_step(road, sel, net, t, jax.random.PRNGKey(0))
        j_road, _, j_acc, j_win = direction_step(road, sel, net, t, jax.random.PRNGKey(1))
        j_road, j_popped = confirm_step(j_road, j_acc, j_win)

        np.testing.assert_array_equal(np.asarray(f_road.count),
                                      np.asarray(j_road.count))
        np.testing.assert_array_equal(np.asarray(f_popped), np.asarray(j_popped))
        assert int(f_road.tail_ids()[1]) == 7
        assert bool(f_popped[0])

    def test_blocked_before_departure(self):
        net = _chain_network()
        road = _seed_agent(init_road_state(net.num_roads, net.nmax), 0, 7, 50.0)
        sel = jnp.array([1, 2, 0] + [-1] * 6, dtype=jnp.int32)
        f_road, f_popped, _ = fused_core_step(
            road, sel, net, jnp.float32(10.0), jax.random.PRNGKey(0)
        )
        assert int(f_road.count[1]) == 0
        assert int(jnp.sum(f_popped)) == 0

    def test_wrong_selection_blocks(self):
        net = _chain_network()
        road = _seed_agent(init_road_state(net.num_roads, net.nmax), 0, 7, 0.0)
        sel = jnp.array([2, 2, 0] + [-1] * 6, dtype=jnp.int32)
        f_road, _, _ = fused_core_step(
            road, sel, net, jnp.float32(10.0), jax.random.PRNGKey(0)
        )
        assert int(f_road.count[1]) == 0

    def test_full_downstream_blocks(self):
        net = _chain_network()
        cap1 = int(net.capacity[1])
        road = _seed_agent(init_road_state(net.num_roads, net.nmax), 0, 7, 0.0)
        road = road._replace(count=road.count.at[1].set(cap1 - 3))
        sel = jnp.array([1, 2, 0] + [-1] * 6, dtype=jnp.int32)
        f_road, _, _ = fused_core_step(
            road, sel, net, jnp.float32(10.0), jax.random.PRNGKey(0)
        )
        assert int(f_road.count[1]) == cap1 - 3

    def test_conservation_many_agents(self):
        """Every road seeded with a due head -> all transfer simultaneously
        around the cycle; total count conserved, every pop matched by a push."""
        net = _chain_network()
        road = init_road_state(net.num_roads, net.nmax)
        for r, aid in ((0, 1), (1, 2), (2, 3)):
            road = _seed_agent(road, r, aid, 0.0)
        sel = jnp.array([1, 2, 0] + [-1] * 6, dtype=jnp.int32)
        f_road, f_popped, _ = fused_core_step(
            road, sel, net, jnp.float32(10.0), jax.random.PRNGKey(0)
        )
        assert int(jnp.sum(f_road.count)) == 3
        assert int(jnp.sum(f_popped)) == 3
        # Each road popped its head and received its upstream's head.
        np.testing.assert_array_equal(
            np.asarray(f_road.head_ids()), [3, 1, 2]
        )

    def test_competing_proposals_always_resolve(self):
        """Two competing upstream proposals: exactly one must win and pop
        every tick (catches NaN-noise regressions structurally).

        NB: pltpu.prng_random_bits is stubbed to zeros in interpret mode, so
        the Gumbel-max *law* cannot be asserted here; the 50/50 frequency
        check runs on real TPU (see /tmp ablation scripts + CLAUDE.md).
        With zero noise the tie-break is deterministic toward the lower edge
        index.
        """
        # Roads 0 and 1 both feed road 2 (two intersections merging).
        net = build_network(
            length=np.array([75.0, 75.0, 75.0, 75.0]),
            max_flow=np.array([30.0, 10.0, 10.0, 10.0]),
            free_speed=np.array([7.5] * 4),
            perm_lanes=np.array([1.0] * 4),
            from_inter=np.array([0, 1, 2, 3]),
            to_inter=np.array([2, 2, 3, 0]),
            num_intersections=4,
        )
        # turn edges: 0->2, 1->2 (both from intersection-2 inflows), 2->3, 3->0
        road0 = init_road_state(net.num_roads, net.nmax)
        road0 = _seed_agent(road0, 0, 5, 0.0)
        road0 = _seed_agent(road0, 1, 6, 0.0)
        sel = jnp.array([2, 2, 3, 0] + [-1] * 8, dtype=jnp.int32)

        for i in range(20):
            f_road, popped, _ = fused_core_step(
                road0, sel, net, jnp.float32(10.0), jax.random.PRNGKey(i)
            )
            winner = int(f_road.tail_ids()[2])
            assert winner in (5, 6), "one of the two proposals must always win"
            assert int(jnp.sum(popped)) == 1
            assert int(jnp.sum(f_road.count)) == 2

    def test_road_delta_tt_matches_direction_step(self):
        """The fused path must emit the same road-optimality series as the
        eager direction step (direction_mpnn.py:94-96) — VERDICT r1 #3."""
        net = _chain_network()
        road = init_road_state(net.num_roads, net.nmax)
        # Head with congestion delay: departure - arrival > fftt.
        road = road._replace(
            fifo_ids=road.fifo_ids.at[0, 0].set(7),
            fifo_arrival=road.fifo_arrival.at[0, 0].set(0.0),
            fifo_departure=road.fifo_departure.at[0, 0].set(42.0),
            count=road.count.at[0].set(1),
        )
        sel = jnp.array([1, 2, 0] + [-1] * 6, dtype=jnp.int32)
        t = jnp.float32(50.0)
        _, _, f_delta = fused_core_step(
            road, sel, net, t, jax.random.PRNGKey(0), compute_delta=True
        )
        _, j_delta, _, _ = direction_step(
            road, sel, net, t, jax.random.PRNGKey(1), compute_delta=True
        )
        assert f_delta.shape == (net.num_roads,)
        np.testing.assert_allclose(np.asarray(f_delta), np.asarray(j_delta))
        assert float(f_delta[0]) > 0.0
        # Without the flag the series stays empty (no wasted reduction).
        _, _, empty = fused_core_step(
            road, sel, net, t, jax.random.PRNGKey(0), compute_delta=False
        )
        assert empty.shape == (0,)
