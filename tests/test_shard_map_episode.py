"""Explicit shard_map episode (VERDICT r1 #4): equality with the unsharded
run and a pinned collective structure."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tarl_tpu.config import SimConfig
from tarl_tpu.core.step import Policy, init_sim_state, run_episode
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import ensure_scenario
from tarl_tpu.parallel.shard_map_episode import (
    make_road_mesh,
    run_episode_shard_map,
)
from tarl_tpu.parallel.sharded_episode import pad_agents
from tarl_tpu.routing.policies import random_choice


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("smap_scen"))
    base = ensure_scenario(root, "Grid4x4")
    net = load_network(os.path.join(base, "network"))
    assert net.num_roads % 8 == 0
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    agents = pad_agents(agents, 8)
    return net, agents


def _state(net, agents, sim):
    policy = Policy(choice=random_choice)
    return init_sim_state(net, agents, sim=sim, policy=policy), policy


def test_shard_map_matches_unsharded(setup):
    net, agents = setup
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 400)
    state, policy = _state(net, agents, sim)

    ref_final, ref_logs = run_episode(state, net, policy, 400, sim=sim)
    mesh = make_road_mesh(8)
    sm_final, sm_logs = run_episode_shard_map(
        state, net, policy, 400, mesh, sim=sim
    )

    # Agent trajectories are bitwise-identical (same PRNG stream, same math).
    np.testing.assert_array_equal(
        np.asarray(ref_final.agents.done), np.asarray(sm_final.agents.done)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.agents.on_way), np.asarray(sm_final.agents.on_way)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.agents.arrival), np.asarray(sm_final.agents.arrival)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.road.count), np.asarray(sm_final.road.count)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.metrics.hourly_counts),
        np.asarray(sm_final.metrics.hourly_counts),
    )
    # Tick scalars: integer-valued sums, exact.
    np.testing.assert_array_equal(
        np.asarray(ref_logs.on_way), np.asarray(sm_logs.on_way)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_logs.arrivals), np.asarray(sm_logs.arrivals)
    )
    # Road-optimality series: psum partial-sum order may differ from the
    # single-device segment reduction -> allclose.
    np.testing.assert_allclose(
        np.asarray(ref_logs.road_delta_tt),
        np.asarray(sm_logs.road_delta_tt),
        rtol=1e-5, atol=1e-3,
    )
    # The final road state really is sharded across 8 devices.
    assert not sm_final.road.count.sharding.is_fully_replicated


def test_shard_map_bounded_depth_escalation_matches_unsharded(setup):
    """withdraw_depth=1 with escalation (the SimConfig default) self-heals
    to the unbounded scan in BOTH drivers: the shard-local while_loop must
    reproduce core.withdraw's escalation exactly, so sharded == unsharded
    == unbounded."""
    net, agents = setup
    base_sim = dict(start_time=6 * 3600, end_time=6 * 3600 + 300)
    sim_b = SimConfig(withdraw_depth=1, withdraw_escalate=True, **base_sim)
    sim_x = SimConfig(withdraw_depth=None, **base_sim)

    state, policy = _state(net, agents, sim_b)
    ref_final, _ = run_episode(state, net, policy, 300, sim=sim_b)
    exact_final, _ = run_episode(state, net, policy, 300, sim=sim_x)
    mesh = make_road_mesh(8)
    sm_final, _ = run_episode_shard_map(
        state, net, policy, 300, mesh, sim=sim_b
    )
    for other in (exact_final, sm_final):
        np.testing.assert_array_equal(
            np.asarray(ref_final.agents.arrival),
            np.asarray(other.agents.arrival),
        )
        np.testing.assert_array_equal(
            np.asarray(ref_final.road.count), np.asarray(other.road.count)
        )
    assert int(np.asarray(ref_final.agents.done)[1:].sum()) > 0


def test_shard_map_collective_structure(setup):
    """Pin the halo-exchange communication structure in the compiled HLO:
    per tick there are all-gathers (head-summary halo x2 + winners) and
    all-reduces (agent merges, tick scalars, delta psum), and no all-to-all."""
    from functools import partial

    from jax import shard_map  # noqa: F401

    net, agents = setup
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 8)
    state, policy = _state(net, agents, sim)
    mesh = make_road_mesh(8)

    # Compile (don't run) via lower/compile on the wrapped episode.
    import tarl_tpu.parallel.shard_map_episode as sme

    traced = jax.jit(
        lambda st: sme.run_episode_shard_map(st, net, policy, 8, mesh, sim=sim)
    )
    txt = traced.lower(state).compile().as_text()
    assert "all-gather" in txt, "halo exchange must lower to all-gather"
    assert "all-reduce" in txt, "agent/scalar merges must lower to all-reduce"
    assert "all-to-all" not in txt, "no all-to-all expected in the halo design"


def test_shard_map_shortest_path_matches_unsharded(setup):
    """The shortest-path policy (replicated BF refresh from the halo counts
    + per-agent entry roads) is bitwise-equal to the unsharded episode."""
    from tarl_tpu.config import RoutingConfig
    from tarl_tpu.simulator import make_policy

    net, agents = setup
    routing = RoutingConfig(refresh_rate=10)
    policy = make_policy("dijkstra", routing=routing)
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 400)
    state = init_sim_state(net, agents, sim=sim, policy=policy)

    ref_final, ref_logs = run_episode(state, net, policy, 400, sim=sim)
    mesh = make_road_mesh(8)
    sm_final, sm_logs = run_episode_shard_map(
        state, net, policy, 400, mesh, sim=sim, routing=routing
    )

    np.testing.assert_array_equal(
        np.asarray(ref_final.agents.done), np.asarray(sm_final.agents.done)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.agents.arrival), np.asarray(sm_final.agents.arrival)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.road.count), np.asarray(sm_final.road.count)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.next_hop), np.asarray(sm_final.next_hop)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_logs.arrivals), np.asarray(sm_logs.arrivals)
    )
    assert int(sm_final.agents.done[1:].sum()) > 0, "some trips must finish"


def test_shard_map_primal_backend_matches_unsharded(setup):
    """The primal routing backend (O(I^2) tables, warm-started refresh)
    under shard_map is bitwise-equal to the unsharded primal episode."""
    from tarl_tpu.config import RoutingConfig
    from tarl_tpu.simulator import make_policy

    net, agents = setup
    routing = RoutingConfig(refresh_rate=10, backend="primal")
    policy = make_policy("dijkstra", routing=routing, network=net)
    assert policy.table_init is not None
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 400)
    state = init_sim_state(net, agents, sim=sim, policy=policy)

    ref_final, ref_logs = run_episode(state, net, policy, 400, sim=sim)
    mesh = make_road_mesh(8)
    sm_final, sm_logs = run_episode_shard_map(
        state, net, policy, 400, mesh, sim=sim, routing=routing
    )

    np.testing.assert_array_equal(
        np.asarray(ref_final.agents.done), np.asarray(sm_final.agents.done)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.agents.arrival), np.asarray(sm_final.agents.arrival)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.road.count), np.asarray(sm_final.road.count)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.next_hop), np.asarray(sm_final.next_hop)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_logs.arrivals), np.asarray(sm_logs.arrivals)
    )
    assert int(sm_final.agents.done[1:].sum()) > 0, "some trips must finish"


@pytest.mark.slow
def test_shard_map_learned_policy_matches_unsharded(setup):
    """VERDICT r2 #1: the learned MPNN policy forward runs EDGE-SHARDED
    inside the shard_map episode (per-block slot columns + replicated
    virtual groups) and is bitwise-equal to the unsharded learned rollout —
    both in stochastic (Gumbel-max) and deterministic (argmax) modes."""
    from tarl_tpu.models.mpnn import MPNNPolicyNet
    from tarl_tpu.rl.learned_policy import make_learned_choice, rollout_context

    net, agents = setup
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 300)
    base_state, _ = _state(net, agents, sim)

    pnet = MPNNPolicyNet(num_nodes=net.num_nodes,
                         num_node_embeddings=net.num_roads + 1)
    x0 = rollout_context(base_state, net)
    params = pnet.init(
        jax.random.PRNGKey(7), x0, jnp.zeros((4, 1)),
        jnp.zeros((4,), jnp.int32), jnp.zeros((4,), jnp.int32),
    )
    mesh = make_road_mesh(8)

    for deterministic in (False, True):
        policy = make_learned_choice(pnet, params, net,
                                     deterministic=deterministic)
        state = init_sim_state(net, agents, sim=sim, policy=policy)
        ref_final, ref_logs = run_episode(state, net, policy, 300, sim=sim)
        sm_final, sm_logs = run_episode_shard_map(
            state, net, policy, 300, mesh, sim=sim
        )
        np.testing.assert_array_equal(
            np.asarray(ref_final.agents.done), np.asarray(sm_final.agents.done)
        )
        np.testing.assert_array_equal(
            np.asarray(ref_final.agents.arrival),
            np.asarray(sm_final.agents.arrival),
        )
        np.testing.assert_array_equal(
            np.asarray(ref_final.road.count), np.asarray(sm_final.road.count)
        )
        np.testing.assert_array_equal(
            np.asarray(ref_final.selected_road),
            np.asarray(sm_final.selected_road),
        )
        np.testing.assert_array_equal(
            np.asarray(ref_logs.arrivals), np.asarray(sm_logs.arrivals)
        )
        assert not sm_final.road.count.sharding.is_fully_replicated


@pytest.mark.slow
def test_shard_map_transformer_policy_matches_unsharded(setup):
    """Attention policies (GTConv aggregation) run SPATIALLY SHARDED too:
    the slot-twin trunk (models/transformer/slot_forward.py) computes each
    layer's node updates for the local road block, all_gathers them as the
    halo, and scores only the local out-edge columns — bitwise-equal to the
    unsharded learned rollout in both sampling modes."""
    from tarl_tpu.models.transformer.agent import (
        TransformerRoutePolicy,
        network_positional_encoding,
    )
    from tarl_tpu.rl.learned_policy import make_learned_choice

    net, agents = setup
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 200)
    pe = network_positional_encoding(net, 8)
    pnet = TransformerRoutePolicy(pe=pe, hidden_dim=8, num_layers=2,
                                  num_heads=2)
    n, e = net.num_nodes, net.num_full_edges
    params = pnet.init(
        jax.random.PRNGKey(5), jnp.ones((n, 16)), jnp.ones((e, 1)),
        net.full_src, net.full_dst,
    )
    mesh = make_road_mesh(8)

    for deterministic in (False, True):
        policy = make_learned_choice(pnet, params, net,
                                     deterministic=deterministic)
        state = init_sim_state(net, agents, sim=sim, policy=policy)
        ref_final, ref_logs = run_episode(state, net, policy, 200, sim=sim)
        sm_final, sm_logs = run_episode_shard_map(
            state, net, policy, 200, mesh, sim=sim
        )
        np.testing.assert_array_equal(
            np.asarray(ref_final.agents.done), np.asarray(sm_final.agents.done)
        )
        np.testing.assert_array_equal(
            np.asarray(ref_final.agents.arrival),
            np.asarray(sm_final.agents.arrival),
        )
        np.testing.assert_array_equal(
            np.asarray(ref_final.selected_road),
            np.asarray(sm_final.selected_road),
        )
        np.testing.assert_array_equal(
            np.asarray(ref_logs.arrivals), np.asarray(sm_logs.arrivals)
        )
        # Non-vacuous: agents entered the network (a random-init attention
        # policy may legitimately complete none of them in 200 ticks).
        assert float(np.asarray(sm_logs.on_way).max()) > 0


def test_learned_rollout_context_matches_ppo_context(setup):
    """rollout_context (the classical-episode context builder) must produce
    exactly the x[N, 16] the PPO training path feeds the policy, so trained
    params transfer verbatim to learned rollouts."""
    from tarl_tpu.models.mpnn import MPNNPolicyNet, MPNNValueNetSimple
    from tarl_tpu.rl.env import env_reset
    from tarl_tpu.rl.learned_policy import rollout_context
    from tarl_tpu.rl.ppo import PPO

    net, agents = setup
    state, _ = _state(net, agents, SimConfig())
    ppo = PPO(
        net,
        MPNNPolicyNet(num_nodes=net.num_nodes,
                      num_node_embeddings=net.num_roads + 1),
        MPNNValueNetSimple(),
    )
    env, obs = env_reset(state, net, ppo.rl)
    x_ppo = ppo._context(env, obs)
    x_roll = rollout_context(env.sim, net,
                             ppo.rl.observe_pending_entrants)
    np.testing.assert_array_equal(np.asarray(x_ppo), np.asarray(x_roll))

    # With extra_obs: three congestion columns appended, same 16-col prefix,
    # and rollout_context mirrors PPO._context exactly (param transfer).
    from tarl_tpu.config import RLConfig
    from tarl_tpu.rl.observation import NUM_EXTRA_OBS

    ppo_x = PPO(
        net,
        MPNNPolicyNet(num_nodes=net.num_nodes,
                      num_node_embeddings=net.num_roads + 1),
        MPNNValueNetSimple(),
        rl=RLConfig(extra_obs=True),
    )
    env, obs = env_reset(state, net, ppo_x.rl)
    x_ppo_x = ppo_x._context(env, obs)
    assert x_ppo_x.shape[1] == x_ppo.shape[1] + NUM_EXTRA_OBS
    np.testing.assert_array_equal(
        np.asarray(x_ppo_x[:, : x_ppo.shape[1]]), np.asarray(x_ppo)
    )
    x_roll_x = rollout_context(env.sim, net,
                               ppo_x.rl.observe_pending_entrants,
                               extra_obs=True)
    np.testing.assert_array_equal(np.asarray(x_ppo_x), np.asarray(x_roll_x))
    assert bool(np.isfinite(np.asarray(x_roll_x)).all())


def test_shard_map_learned_extra_obs_matches_unsharded(setup):
    """The extra_obs congestion columns are derived from halo-gathered
    globals under shard_map — an extra_obs learned policy stays bitwise-equal
    to its unsharded rollout."""
    from tarl_tpu.models.mpnn import MPNNPolicyNet
    from tarl_tpu.rl.learned_policy import make_learned_choice, rollout_context

    net, agents = setup
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 200)
    base_state, _ = _state(net, agents, sim)

    pnet = MPNNPolicyNet(num_nodes=net.num_nodes,
                         num_node_embeddings=net.num_roads + 1)
    x0 = rollout_context(base_state, net, extra_obs=True)
    params = pnet.init(
        jax.random.PRNGKey(11), x0, jnp.zeros((4, 1)),
        jnp.zeros((4,), jnp.int32), jnp.zeros((4,), jnp.int32),
    )
    mesh = make_road_mesh(8)
    policy = make_learned_choice(pnet, params, net, extra_obs=True)
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    ref_final, ref_logs = run_episode(state, net, policy, 200, sim=sim)
    sm_final, sm_logs = run_episode_shard_map(
        state, net, policy, 200, mesh, sim=sim
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.agents.done), np.asarray(sm_final.agents.done)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.agents.arrival),
        np.asarray(sm_final.agents.arrival),
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.road.count), np.asarray(sm_final.road.count)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_logs.arrivals), np.asarray(sm_logs.arrivals)
    )


def test_shard_map_marginal_cost_matches_unsharded(setup):
    """--algo so (marginal-cost refreshes) under shard_map is bitwise-equal
    to the unsharded system-optimal episode."""
    from tarl_tpu.config import RoutingConfig
    from tarl_tpu.simulator import make_policy

    net, agents = setup
    routing = RoutingConfig(refresh_rate=10, cost_mode="marginal")
    policy = make_policy("so", routing, network=net)
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 400)
    state = init_sim_state(net, agents, sim=sim, policy=policy)

    ref_final, ref_logs = run_episode(state, net, policy, 400, sim=sim)
    mesh = make_road_mesh(8)
    sm_final, sm_logs = run_episode_shard_map(
        state, net, policy, 400, mesh, sim=sim, routing=routing
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.agents.arrival), np.asarray(sm_final.agents.arrival)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.road.count), np.asarray(sm_final.road.count)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_logs.arrivals), np.asarray(sm_logs.arrivals)
    )


def test_shard_map_padded_network(tmp_path):
    """VERDICT r2 #7: networks with R % shards != 0 run under shard_map via
    inert road padding (io.scenarios.pad_network_xml) — bitwise-equal to the
    unsharded run of the same padded network, pad roads stay empty, and all
    trips complete."""
    from tarl_tpu.config import RoutingConfig
    from tarl_tpu.io.scenarios import grid_scenario, pad_network_xml
    from tarl_tpu.simulator import make_policy

    base = grid_scenario(str(tmp_path), "Grid3x5", rows=3, cols=5,
                         num_agents=120)
    raw = load_network(os.path.join(base, "network"))
    assert raw.num_roads % 8 != 0, "fixture must need padding"

    padded_base = pad_network_xml(os.path.join(base, "network"), 8)
    net = load_network(padded_base)
    assert net.num_roads % 8 == 0
    agents, _ = load_population(os.path.join(base, "population"), padded_base)
    agents = pad_agents(agents, 8)

    routing = RoutingConfig(refresh_rate=10)
    policy = make_policy("dijkstra", routing=routing)
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 600)
    state = init_sim_state(net, agents, sim=sim, policy=policy)

    ref_final, ref_logs = run_episode(state, net, policy, 600, sim=sim)
    mesh = make_road_mesh(8)
    sm_final, sm_logs = run_episode_shard_map(
        state, net, policy, 600, mesh, sim=sim, routing=routing
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.agents.arrival), np.asarray(sm_final.agents.arrival)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.road.count), np.asarray(sm_final.road.count)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_logs.arrivals), np.asarray(sm_logs.arrivals)
    )
    # Pad roads are inert: never occupied, never traversed.
    pad = np.arange(raw.num_roads, net.num_roads)
    assert np.asarray(sm_final.road.count)[pad].sum() == 0
    assert np.asarray(sm_final.metrics.hourly_counts)[:, pad].sum() == 0
    assert int(np.asarray(sm_final.agents.done)[1:].sum()) > 0


@pytest.mark.slow
def test_shard_map_inline_padding_matches_unsharded(tmp_path):
    """A raw network with R % shards != 0 runs under shard_map DIRECTLY:
    run_episode_shard_map pads the road axis internally with inert rows
    (zero capacity, no in-edges, sentinel dest) and slices them back off —
    bitwise-equal to the unsharded run on the SAME network, random and
    shortest-path policies (no XML rewrite, no Gumbel-stream change)."""
    from tarl_tpu.config import RoutingConfig
    from tarl_tpu.io.scenarios import grid_scenario
    from tarl_tpu.simulator import make_policy

    base = grid_scenario(str(tmp_path), "Grid3x5i", rows=3, cols=5,
                         num_agents=120)
    net = load_network(os.path.join(base, "network"))
    assert net.num_roads % 8 != 0, "fixture must need padding"
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    agents = pad_agents(agents, 8)
    mesh = make_road_mesh(8)

    for algo in ("random", "dijkstra"):
        routing = RoutingConfig(refresh_rate=10)
        if algo == "random":
            policy = Policy(choice=random_choice)
        else:
            policy = make_policy(algo, routing=routing, network=net)
        sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 400)
        state = init_sim_state(net, agents, sim=sim, policy=policy)
        ref_final, ref_logs = run_episode(state, net, policy, 400, sim=sim)
        sm_final, sm_logs = run_episode_shard_map(
            state, net, policy, 400, mesh, sim=sim, routing=routing
        )
        np.testing.assert_array_equal(
            np.asarray(ref_final.agents.arrival),
            np.asarray(sm_final.agents.arrival), err_msg=algo,
        )
        np.testing.assert_array_equal(
            np.asarray(ref_final.road.count),
            np.asarray(sm_final.road.count), err_msg=algo,
        )
        np.testing.assert_array_equal(
            np.asarray(ref_final.metrics.hourly_counts),
            np.asarray(sm_final.metrics.hourly_counts), err_msg=algo,
        )
        np.testing.assert_array_equal(
            np.asarray(ref_logs.arrivals), np.asarray(sm_logs.arrivals),
            err_msg=algo,
        )
        assert int(np.asarray(sm_final.agents.done)[1:].sum()) > 0


def _forced_roll_net(net):
    """Grid4x4 with roll plans forced like tests/test_roll_gather
    (max_buckets=2 leaves a genuine exception tail for the overlay)."""
    from tarl_tpu.core.roll_gather import build_roll_plan

    in_plan = build_roll_plan(
        np.asarray(net.in_src_tab), np.asarray(net.in_edge_ok),
        min_roads=0, max_exc_frac=1.0, min_count=1, max_buckets=2,
    )
    out_plan = build_roll_plan(
        np.asarray(net.out_dst_tab), np.asarray(net.out_edge_ok),
        min_roads=0, max_exc_frac=1.0, min_count=1,
    )
    assert in_plan[0].shape[0] > 0 and out_plan[0].shape[0] > 0
    assert in_plan[2].shape[0] > 0, "want a nonempty exception tail"
    return net.replace(
        in_roll_shift=jnp.asarray(in_plan[0]),
        in_roll_sel=jnp.asarray(in_plan[1]),
        in_roll_exc_src=jnp.asarray(in_plan[2]),
        in_roll_exc_k=jnp.asarray(in_plan[3]),
        in_roll_exc_v=jnp.asarray(in_plan[4]),
        out_roll_shift=jnp.asarray(out_plan[0]),
        out_roll_sel=jnp.asarray(out_plan[1]),
        out_roll_exc_src=jnp.asarray(out_plan[2]),
        out_roll_exc_k=jnp.asarray(out_plan[3]),
        out_roll_exc_v=jnp.asarray(out_plan[4]),
        in_roll_shift_t=tuple(int(s) for s in in_plan[0]),
        out_roll_shift_t=tuple(int(s) for s in out_plan[0]),
    )


def test_shard_map_roll_plan_matches_unsharded(setup, monkeypatch):
    """VERDICT r3 #3: the shard body routes the in-slot pack/head reads and
    the confirm pop through the roll plan (block slices of the replicated
    arrays) when the network carries one — forced here on Grid4x4 like
    tests/test_roll_gather, pinned bitwise against BOTH the unsharded run
    and the non-roll shard path."""
    from tarl_tpu.core import roll_gather

    net, agents = setup
    monkeypatch.setattr(roll_gather, "MIN_ROADS", 0)
    net_roll = _forced_roll_net(net)
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 300)
    state, policy = _state(net, agents, sim)

    ref_final, _ = run_episode(state, net, policy, 300, sim=sim)
    mesh = make_road_mesh(8)
    roll_final, _ = run_episode_shard_map(
        state, net_roll, policy, 300, mesh, sim=sim
    )
    plain_final, _ = run_episode_shard_map(
        state, net, policy, 300, mesh, sim=sim
    )
    for ref in (ref_final, plain_final):
        np.testing.assert_array_equal(
            np.asarray(ref.agents.arrival),
            np.asarray(roll_final.agents.arrival),
        )
        np.testing.assert_array_equal(
            np.asarray(ref.road.fifo_ids), np.asarray(roll_final.road.fifo_ids)
        )
        np.testing.assert_array_equal(
            np.asarray(ref.road.count), np.asarray(roll_final.road.count)
        )


def test_shard_map_fused_winner_matches_unsharded(setup, monkeypatch):
    """The per-shard fused winner kernel (the serial fused_winner's
    residual, VERDICT r3 #3): with roll plans forced and the interpret
    kernel enabled, the shard tick's eligibility + Gumbel-max loop runs as
    ONE Pallas kernel per shard — bitwise-equal to the XLA shard loop AND
    the unsharded episode (the Gumbel matrix is drawn outside the kernel,
    so interpret mode is exact)."""
    from tarl_tpu.core import roll_gather
    from tarl_tpu.core.fused_winner import fused_shard_winner_ok

    net, agents = setup
    monkeypatch.setattr(roll_gather, "MIN_ROADS", 0)
    net_roll = _forced_roll_net(net)
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 300)
    state, policy = _state(net, agents, sim)
    mesh = make_road_mesh(8)

    monkeypatch.setenv("TARL_FUSED_WINNER_INTERPRET", "1")
    assert fused_shard_winner_ok(net_roll, net.num_roads // 8)

    monkeypatch.setenv("TARL_FUSED_SHARD", "0")
    plain_final, plain_logs = run_episode_shard_map(
        state, net_roll, policy, 300, mesh, sim=sim
    )
    monkeypatch.setenv("TARL_FUSED_SHARD", "1")
    fused_final, fused_logs = run_episode_shard_map(
        state, net_roll, policy, 300, mesh, sim=sim
    )
    monkeypatch.delenv("TARL_FUSED_WINNER_INTERPRET")
    ref_final, _ = run_episode(state, net, policy, 300, sim=sim)

    for ref in (ref_final, plain_final):
        np.testing.assert_array_equal(
            np.asarray(ref.agents.arrival),
            np.asarray(fused_final.agents.arrival),
        )
        np.testing.assert_array_equal(
            np.asarray(ref.road.fifo_ids),
            np.asarray(fused_final.road.fifo_ids),
        )
        np.testing.assert_array_equal(
            np.asarray(ref.road.count), np.asarray(fused_final.road.count)
        )
    np.testing.assert_array_equal(
        np.asarray(plain_logs.arrivals), np.asarray(fused_logs.arrivals)
    )
    assert int(np.asarray(fused_final.agents.done)[1:].sum()) > 0


def test_shard_map_dest_restricted_primal_matches_unsharded(setup):
    """VERDICT r3 #7: the dest-restricted primal backend (dist[I, D]
    columns over the population's destination intersections) under
    shard_map is bitwise-equal to the unsharded zoned episode."""
    from tarl_tpu.config import RoutingConfig
    from tarl_tpu.routing.policies import _dest_inter
    from tarl_tpu.simulator import make_policy

    net, agents = setup
    routing = RoutingConfig(refresh_rate=10, backend="primal")
    dest_inters = np.unique(np.asarray(_dest_inter(net, agents.dest)))
    policy = make_policy("dijkstra", routing=routing, network=net,
                         dest_inters=dest_inters)
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 400)
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    assert getattr(policy.table_init, "dest_list", None) is not None

    ref_final, _ = run_episode(state, net, policy, 400, sim=sim)
    mesh = make_road_mesh(8)
    sm_final, _ = run_episode_shard_map(
        state, net, policy, 400, mesh, sim=sim, routing=routing
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.agents.arrival),
        np.asarray(sm_final.agents.arrival),
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.road.count), np.asarray(sm_final.road.count)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.next_hop), np.asarray(sm_final.next_hop)
    )
    assert int(sm_final.agents.done[1:].sum()) > 0


def test_shard_map_strict_compat_matches_unsharded(setup):
    """VERDICT r3 #7: strict-compat routing (the reference's dummy-driven
    entry roads + its exact edge-cost form) under shard_map is bitwise-
    equal to the unsharded strict episode."""
    from tarl_tpu.config import RoutingConfig
    from tarl_tpu.simulator import make_policy

    net, agents = setup
    routing = RoutingConfig(refresh_rate=10, strict_compat=True)
    policy = make_policy("dijkstra", routing=routing)
    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + 400)
    state = init_sim_state(net, agents, sim=sim, policy=policy)

    ref_final, _ = run_episode(state, net, policy, 400, sim=sim)
    mesh = make_road_mesh(8)
    sm_final, _ = run_episode_shard_map(
        state, net, policy, 400, mesh, sim=sim, routing=routing
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.agents.arrival),
        np.asarray(sm_final.agents.arrival),
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.road.count), np.asarray(sm_final.road.count)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.selected_road),
        np.asarray(sm_final.selected_road),
    )
    assert int(sm_final.agents.done[1:].sum()) > 0
