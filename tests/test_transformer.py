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

    def test_slot_major_adapter_rejects_attention_nets(self, setup):
        """make_learned_choice runs the forward on the slot-major PADDED
        edge table; GTConv attention would aggregate the padding into real
        nodes' softmax sums, so it must be rejected loudly
        (TransformerRoutePolicy.edge_row_independent = False)."""
        from tarl_tpu.rl.learned_policy import make_learned_choice

        net, agents, state = setup
        pe = network_positional_encoding(net, 16)
        pol_net = TransformerRoutePolicy(pe=pe, hidden_dim=16, num_layers=1,
                                         num_heads=2)
        with pytest.raises(ValueError, match="edge-row-independent"):
            make_learned_choice(pol_net, {}, net)
