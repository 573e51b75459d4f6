"""Canonical-addressed Gumbel streams (core.rng) and renumbering parity.

The round-4 renumbering feature claimed "the renumbered simulation equals
the identity-numbered one up to road relabeling", but the slot-major
direction Gumbel was keyed by the NEW road index, so winner draws between
contending upstreams flipped (the r4 judge reproduced 472/3001 diverging
arrival stamps on the radial).  core.rng addresses the stream by CANONICAL
position instead — these tests pin

* the bit-exact reconstruction of ``jax.random.gumbel`` at arbitrary flat
  positions (the partitionable-threefry counter property it relies on),
* that identity-numbered networks still take the plain draw bit-for-bit
  (every grid baseline preserved), and
* full outcome parity between an identity-numbered run and the SAME
  scenario renumbered by an arbitrary random permutation — a stronger
  property than the polar-order radial case (tests/test_renumber.py),
  under both the deterministic shortest-path policy and the random policy
  (which additionally exercises the canonical choice stream).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tarl_tpu.config import RoutingConfig, SimConfig
from tarl_tpu.core.rng import (
    choice_gumbel,
    direction_gumbel,
    gumbel_at_positions,
)
from tarl_tpu.core.step import init_sim_state, run_episode
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import grid_scenario


@pytest.mark.parametrize("shape", [(3, 7), (4, 1000), (5, 333), (1, 1)])
def test_gumbel_at_positions_bitwise(shape):
    key = jax.random.fold_in(jax.random.key(7), shape[1])
    ref = jax.random.gumbel(key, shape, jnp.float32)
    n = ref.size
    q = jnp.arange(n, dtype=jnp.uint32).reshape(shape)
    np.testing.assert_array_equal(
        np.asarray(gumbel_at_positions(key, q)), np.asarray(ref)
    )
    perm = np.random.RandomState(0).permutation(n)
    np.testing.assert_array_equal(
        np.asarray(gumbel_at_positions(key, jnp.asarray(perm, jnp.uint32))),
        np.asarray(ref).ravel()[perm],
    )


def test_identity_network_keeps_plain_stream(tmp_path):
    base = grid_scenario(str(tmp_path), "RngGrid", rows=4, cols=4,
                         num_agents=20)
    net = load_network(os.path.join(base, "network"))
    assert not net.renumbered
    key = jax.random.key(3)
    kin = net.in_src_tab.shape[0]
    np.testing.assert_array_equal(
        np.asarray(direction_gumbel(key, net)),
        np.asarray(jax.random.gumbel(key, (kin, net.num_roads), jnp.float32)),
    )
    kc = net.choice_dst_tab.shape[0]
    np.testing.assert_array_equal(
        np.asarray(choice_gumbel(key, net)),
        np.asarray(jax.random.gumbel(key, (kc, net.num_nodes), jnp.float32)),
    )


@pytest.fixture(scope="module")
def big_grid(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rng_scen"))
    return grid_scenario(root, "RngGrid12", rows=12, cols=12,
                         num_agents=900, peak_start=6 * 3600,
                         peak_spread=240)


@pytest.mark.parametrize("policy_name", ["dijkstra", "random"])
def test_arbitrary_renumber_outcome_parity(big_grid, monkeypatch,
                                           policy_name):
    """Agent-level outcomes are invariant under an ARBITRARY road
    renumbering — a random permutation, the adversarial case (it also
    makes the roll plan decline, exercising the gather path).  Agents are
    untouched by road relabeling, so arrival stamps and insertion flags
    must match exactly."""
    from tarl_tpu import network as netmod
    from tarl_tpu.simulator import make_policy

    agents, _ = load_population(
        os.path.join(big_grid, "population"), os.path.join(big_grid, "network")
    )
    steps = 400
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + steps,
                    record_road_optimality=False)
    routing = RoutingConfig(refresh_rate=100, max_bf_iters=32,
                            backend="primal")

    def run(net):
        policy = make_policy(policy_name, routing, network=net)
        state = init_sim_state(net, agents, sim=sim, policy=policy)
        final, _ = run_episode(state, net, policy, steps, sim=sim)
        return final

    fa = run(load_network(os.path.join(big_grid, "network")))
    assert not fa.agents is None

    rng = np.random.RandomState(12345)

    def force_perm(from_inter, to_inter, num_intersections, ix, iy, **kw):
        return rng.permutation(from_inter.shape[0]).astype(np.int64)

    monkeypatch.setattr(netmod, "roll_friendly_road_order", force_perm)
    net_p = load_network(os.path.join(big_grid, "network"))
    assert net_p.renumbered
    assert not np.array_equal(np.asarray(net_p.road_order),
                              np.arange(net_p.num_roads))
    fb = run(net_p)

    np.testing.assert_array_equal(np.asarray(fa.agents.arrival),
                                  np.asarray(fb.agents.arrival))
    np.testing.assert_array_equal(np.asarray(fa.agents.inserted),
                                  np.asarray(fb.agents.inserted))
    assert int(np.asarray(fa.agents.done)[1:].sum()) > 0
