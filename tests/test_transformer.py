"""Graph Transformer stack tests (reference component: src/transformer/*,
agents/transformer_agent.py — experimental, not CLI-wired in the reference)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tarl_tpu.config import RLConfig
from tarl_tpu.core.step import Policy, init_sim_state, run_episode
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import ensure_scenario
from tarl_tpu.models.transformer.agent import (
    TransformerRoutePolicy,
    TransformerValueNet,
    make_transformer_choice,
    network_positional_encoding,
)
from tarl_tpu.models.transformer.embedding import (
    degree_structural_encoding,
    laplacian_positional_encoding,
)
from tarl_tpu.models.transformer.model import GraphTransformerNet
from tarl_tpu.rl.ppo import PPO
from tarl_tpu.routing.policies import random_choice


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gt_scen"))
    base = ensure_scenario(root, "Easy")
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    state = init_sim_state(net, agents, policy=Policy(choice=random_choice))
    return net, agents, state


class TestEncodings:
    def test_laplacian_pe_shapes_and_padding(self, setup):
        net, _, _ = setup
        pe = network_positional_encoding(net, dim=8)
        assert pe.shape == (net.num_nodes, 8)
        # SRC/DEST rows zero-padded (transformer_agent.py:190-200)
        assert np.allclose(pe[net.num_roads:], 0.0)
        assert not np.allclose(pe[: net.num_roads], 0.0)

    def test_degree_encoding(self, setup):
        net, _, _ = setup
        se = degree_structural_encoding(
            np.asarray(net.edge_src), net.num_roads, net.num_nodes
        )
        assert se.shape == (net.num_nodes, 1)
        assert se[: net.num_roads].sum() == net.num_turn_edges


class TestGraphTransformerNet:
    def test_forward_shapes(self, setup):
        net, _, _ = setup
        n, e = net.num_nodes, net.num_full_edges
        x = jnp.ones((n, 15))
        ea = jnp.ones((e, 1))
        pe = jnp.asarray(network_positional_encoding(net, 16))
        model = GraphTransformerNet(
            node_dim_in=15, edge_dim_in=1, pe_in_dim=16, hidden_dim=16,
            num_gt_layers=2, num_heads=4, gate=True,
        )
        params = model.init(jax.random.PRNGKey(0), x, net.full_src,
                            net.full_dst, ea, pe)
        mu, edge_scores = model.apply(params, x, net.full_src, net.full_dst, ea, pe)
        assert mu.shape == (1,)
        assert edge_scores.shape == (e,)
        assert np.all(np.isfinite(np.asarray(edge_scores)))

    def test_distributional_head(self, setup):
        net, _, _ = setup
        n, e = net.num_nodes, net.num_full_edges
        x = jnp.ones((n, 15))
        ea = jnp.ones((e, 1))
        model = GraphTransformerNet(node_dim_in=15, edge_dim_in=1,
                                    hidden_dim=16, num_gt_layers=1, num_heads=2)
        params = model.init(jax.random.PRNGKey(0), x, net.full_src,
                            net.full_dst, ea, None)
        mu, std = model.apply(params, x, net.full_src, net.full_dst, ea, None,
                              raw=False, zero_var=True)
        assert float(jnp.sum(std)) == 0.0


class TestTransformerAgent:
    @pytest.mark.slow
    def test_ppo_with_transformer(self, setup):
        """The transformer policy/value drop into the PPO pipeline."""
        net, agents, state = setup
        pe = network_positional_encoding(net, 16)
        rl = RLConfig(rollout_steps=4, minibatch_size=4, num_epochs=1)
        ppo = PPO(
            net,
            TransformerRoutePolicy(pe=pe, hidden_dim=16, num_layers=1, num_heads=2),
            TransformerValueNet(pe=pe, hidden_dim=16, num_layers=1, num_heads=2),
            rl=rl,
            value_uses_graph=True,
        )
        ts = ppo.init(state, jax.random.PRNGKey(0))
        ts2, metrics = ppo.train_iteration(ts)
        assert np.isfinite(float(metrics.loss_total))

    def test_classical_choice_adapter(self, setup):
        """make_transformer_choice drives the classical episode loop."""
        net, agents, state = setup
        pe = network_positional_encoding(net, 16)
        pol_net = TransformerRoutePolicy(pe=pe, hidden_dim=16, num_layers=1,
                                         num_heads=2)
        # init params with a dummy context
        n, e = net.num_nodes, net.num_full_edges
        x = jnp.ones((n, 16))
        params = pol_net.init(jax.random.PRNGKey(0), x,
                              jnp.ones((e, 1)), net.full_src, net.full_dst)
        policy = Policy(choice=make_transformer_choice(pol_net, params, net))
        final, logs = run_episode(state, net, policy, 30)
        sel = np.asarray(final.selected_road[: net.num_roads])
        assert np.all(sel >= 0)  # every road got a sampled direction

    def test_slot_forward_matches_segment(self, setup):
        """The slot-major twin (models/transformer/slot_forward.py) applied
        to the SAME params reproduces the segment-op training forward's
        per-edge logits (up to reduction order inside the softmax sums)."""
        from tarl_tpu.models.transformer.slot_forward import (
            slot_edge_tables,
            slot_twin,
        )

        net, agents, state = setup
        pe = network_positional_encoding(net, 16)
        pol_net = TransformerRoutePolicy(pe=pe, hidden_dim=16, num_layers=2,
                                         num_heads=4)
        n, e = net.num_nodes, net.num_full_edges
        key = jax.random.PRNGKey(3)
        x = jax.random.normal(key, (n, 16))
        params = pol_net.init(jax.random.PRNGKey(0), x,
                              jnp.ones((e, 1)), net.full_src, net.full_dst)
        ef = net.full_attr.reshape(-1, 1)
        flat = pol_net.apply(params, x, ef, net.full_src, net.full_dst)

        tables = slot_edge_tables(net)
        twin = slot_twin(pol_net)
        cols = jnp.arange(n, dtype=jnp.int32)
        slot = twin.apply(params, x, tables, cols)

        # Scatter the flat logits into the out-slot layout for comparison.
        src = np.asarray(net.full_src)
        expect = np.zeros(slot.shape, np.float32)
        fill = {int(s): 0 for s in range(n)}
        for ei in range(e):
            s = int(src[ei])
            expect[fill[s], s] = float(flat[ei])
            fill[s] += 1
        ok = np.asarray(tables.out_ok)
        np.testing.assert_allclose(
            np.where(ok, np.asarray(slot), 0.0), expect, atol=2e-5, rtol=2e-5
        )
        assert ok.sum() == e

    def test_learned_choice_attention_net(self, setup):
        """make_learned_choice accepts attention nets via the slot-major
        twin forward: the deterministic selection equals the argmax over
        the segment-op training forward's per-source out-edge logits
        (ascending-slot strict-> tie-break)."""
        from tarl_tpu.rl.learned_policy import (
            make_learned_choice,
            rollout_context,
        )

        net, agents, state = setup
        pe = network_positional_encoding(net, 16)
        pol_net = TransformerRoutePolicy(pe=pe, hidden_dim=16, num_layers=2,
                                         num_heads=4)
        n, e = net.num_nodes, net.num_full_edges
        params = pol_net.init(
            jax.random.PRNGKey(0), jnp.ones((n, 16)), jnp.ones((e, 1)),
            net.full_src, net.full_dst,
        )
        policy = make_learned_choice(pol_net, params, net,
                                     deterministic=True)
        # Warm the state so the context is non-trivial, then one choice.
        warm, _ = run_episode(state, net, Policy(choice=random_choice), 50)
        chosen, _ = policy.choice(warm, net)
        sel = np.asarray(chosen.selected_road)

        x = rollout_context(warm, net)
        flat = np.asarray(pol_net.apply(
            params, x, net.full_attr.reshape(-1, 1),
            net.full_src, net.full_dst,
        ))
        src = np.asarray(net.full_src)
        dst = np.asarray(net.full_dst)
        best = np.full(n, -np.inf)
        expect = np.asarray(warm.selected_road).copy()
        for ei in range(e):  # edge-id order == ascending slot order
            s = int(src[ei])
            if flat[ei] > best[s] + 1e-4:  # clear of reduction-order ulps
                best[s] = flat[ei]
                expect[s] = dst[ei]
        near_tie = np.zeros(n, bool)
        for ei in range(e):
            s = int(src[ei])
            near_tie[s] |= abs(flat[ei] - best[s]) < 1e-4 and expect[s] != dst[ei]
        cmp = ~near_tie
        np.testing.assert_array_equal(sel[cmp], expect[cmp])
        # Not vacuous (ties concentrate on symmetric virtual SRC nodes).
        assert cmp.sum() > 0.7 * n
