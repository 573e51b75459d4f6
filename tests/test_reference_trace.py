"""Golden-trace A/B against a vendored torch port of the reference physics
(VERDICT r2 #2).

Drives the TPU build's production tick (strict_compat routing, exact
reference semantics: unbounded withdraw, whole-population insert) and the
PyG-free torch re-implementation of the reference math
(tests/reference_port.py) side by side for hundreds of ticks on the Braess
fixture, with an IDENTICAL injected Gumbel stream, asserting per-tick
equality of

* the packed ``x[N, 3*Nmax+7]`` state (via ``schema.pack_state``,
  canonicalized: inactive FIFO slots zeroed — the reference leaves garbage
  stamps in dead slots, direction_mpnn.py:164-183),
* the ``agent_features [A, 9]`` matrix,
* the Dijkstra next-hop table at every refresh.

The injected noise maps our slot-major [KIN, R] Gumbel matrix onto the
reference's per-edge stream: edge e = (u -> v) is v's k-th incoming turn
edge, so ``gumbel_e[e] = gumbel[k, v]`` — both samplers then face the same
scores (log edge-share + noise) and must pick the same winners.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tarl_tpu.config import RoutingConfig, SimConfig
from tarl_tpu.core.step import init_sim_state, tick
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import ensure_scenario
from tarl_tpu.schema import agent_features_matrix, pack_state
from tarl_tpu.simulator import make_policy

from reference_port import TorchReferenceSim


@pytest.fixture(scope="module")
def braess(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("trace_scen"))
    base = ensure_scenario(root, "Braess")
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    return net, agents


def _in_slot_edge_table(net):
    """edge id of road v's k-th incoming turn edge: int[KIN, R] (-1 pad)."""
    dst = np.asarray(net.edge_dst)
    R = net.num_roads
    groups = [[] for _ in range(R)]
    for e, v in enumerate(dst):
        groups[int(v)].append(e)
    kin = int(net.in_src_tab.shape[0])
    tab = np.full((kin, R), -1, np.int64)
    for v, es in enumerate(groups):
        for k, e in enumerate(es):
            tab[k, v] = e
    return tab


def _canonical_ours(state, net):
    return np.asarray(pack_state(state.road, net, state.selected_road))


def test_braess_golden_trace(braess):
    net, agents = braess
    R = net.num_roads
    kin = int(net.in_src_tab.shape[0])

    routing = RoutingConfig(strict_compat=True, refresh_rate=10)
    sim = SimConfig(start_time=6 * 3600, timestep=1)
    policy = make_policy("dijkstra", routing=routing)
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    # The reference zero-initializes the packed matrix, so SELECTED_ROAD
    # starts at road 0 everywhere (transportation_simulator.py:135); align
    # both sides on that.
    state = state._replace(
        selected_road=jnp.zeros_like(state.selected_road)
    )

    ref = TorchReferenceSim(
        torch.as_tensor(np.array(_canonical_ours(state, net))),
        torch.as_tensor(np.array(agent_features_matrix(agents))),
        routes_src=np.asarray(net.edge_src),
        routes_dst=np.asarray(net.edge_dst),
        routes_attr=np.asarray(net.edge_attr),
        full_src=np.asarray(net.full_src),
        full_dst=np.asarray(net.full_dst),
        adj=np.asarray(net.dense_adjacency()),
        congestion_constant=np.asarray(net.congestion_constant),
        num_roads=R,
        nmax=net.nmax,
        time=float(sim.start_time),
        timestep=float(sim.timestep),
        refresh_rate=routing.refresh_rate,
    )

    tick_jit = jax.jit(
        lambda s: tick(s, net, policy, sim=sim)
    )
    slot_edge = _in_slot_edge_table(net)

    num_ticks = 400
    for t in range(num_ticks):
        # Reproduce tick()'s key schedule to hand the torch side the same
        # slot-major Gumbel matrix the direction step will draw.
        _, k_dir = jax.random.split(state.key)
        gslot = np.asarray(jax.random.gumbel(k_dir, (kin, R), jnp.float32))
        gumbel_e = np.zeros(net.num_turn_edges, np.float32)
        for k in range(kin):
            for v in range(R):
                e = slot_edge[k, v]
                if e >= 0:
                    gumbel_e[e] = gslot[k, v]

        state, _ = tick_jit(state)
        ref.tick(gumbel_e)

        ours_x = _canonical_ours(state, net)
        ref_x = ref.canonical_x()
        np.testing.assert_array_equal(
            ours_x, ref_x,
            err_msg=f"packed state diverged at tick {t} "
                    f"(t={float(state.time) - sim.timestep})",
        )
        ours_af = np.asarray(agent_features_matrix(state.agents))
        ref_af = ref.af.numpy()
        np.testing.assert_array_equal(
            ours_af, ref_af, err_msg=f"agent features diverged at tick {t}"
        )
        if t % routing.refresh_rate == 0:
            np.testing.assert_array_equal(
                np.asarray(state.next_hop), ref.next_hop,
                err_msg=f"next-hop tables diverged at refresh tick {t}",
            )

    # The trace must actually exercise the physics: agents entered, moved
    # through turn transfers, and finished.
    ndone = int(np.asarray(state.agents.done)[1:].sum())
    assert ndone > 0, "no agent finished within the traced window"
    assert float(np.asarray(state.metrics.hourly_counts).sum()) > 0
