"""Graph Transformer network (reference: src/transformer/model.py:16-203,
after "A Generalization of Transformer Networks to Graphs",
arXiv:2012.09699).

Node/edge/PE embeddings -> N GTConv layers -> global pooling + mu/log-var
heads (graph-level output) and a per-edge linear head (the route-choice
scores).  ``raw=True`` returns (pooled_mu, edge_scores) exactly like the
reference's live path (model.py:172-177).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .gt_conv import GTConv
from .mlp import MLP


class GraphTransformerNet(nn.Module):
    node_dim_in: int
    edge_dim_in: Optional[int] = None
    pe_in_dim: Optional[int] = None
    hidden_dim: int = 128
    norm: str = "ln"
    gate: bool = False
    qkv_bias: bool = False
    num_gt_layers: int = 4
    num_heads: int = 8
    gt_aggregators: Sequence[str] = ("sum",)
    aggregators: Sequence[str] = ("sum",)
    act: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                 # [N, node_dim_in]
        edge_src: jnp.ndarray,          # [E]
        edge_dst: jnp.ndarray,          # [E]
        edge_attr: Optional[jnp.ndarray] = None,  # [E, edge_dim_in]
        pe: Optional[jnp.ndarray] = None,         # [N, pe_in_dim]
        *,
        raw: bool = True,
        zero_var: bool = False,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ):
        h = nn.Dense(self.hidden_dim, use_bias=False, name="node_emb")(x)
        if self.pe_in_dim and pe is not None:
            h = h + nn.Dense(self.hidden_dim, use_bias=False, name="pe_emb")(pe)
        e = None
        if self.edge_dim_in and edge_attr is not None:
            e = nn.Dense(self.hidden_dim, use_bias=False, name="edge_emb")(edge_attr)

        for i in range(self.num_gt_layers):
            h, e = GTConv(
                node_dim=self.hidden_dim,
                hidden_dim=self.hidden_dim,
                edge_dim=self.hidden_dim if e is not None else None,
                num_heads=self.num_heads,
                gate=self.gate,
                qkv_bias=self.qkv_bias,
                dropout=self.dropout,
                norm=self.norm,
                act=self.act,
                aggregators=self.gt_aggregators,
                name=f"gt_{i}",
            )(h, edge_src, edge_dst, e, deterministic=deterministic)

        # Global pooling: single-graph sum/mean/max concat (model.py:102).
        pooled = []
        for agg in self.aggregators:
            if agg == "sum":
                pooled.append(h.sum(axis=0))
            elif agg == "mean":
                pooled.append(h.mean(axis=0))
            elif agg == "max":
                pooled.append(h.max(axis=0))
            else:
                raise ValueError(f"Unknown aggregator {agg!r}")
        g = jnp.concatenate(pooled, axis=-1)

        mu = MLP(1, self.hidden_dim, 1, 0.0, self.act, name="mu_mlp")(g)
        # Always construct the log-var head so parameter shapes do not depend
        # on the call mode (flax init traces a single call signature).
        log_var = MLP(1, self.hidden_dim, 1, 0.0, self.act, name="log_var_mlp")(g)
        edge_scores = None
        if e is not None:
            edge_scores = nn.Dense(1, name="edge_linear")(e)[:, 0]

        if raw:
            return mu, edge_scores

        std = jnp.zeros_like(log_var) if zero_var else jnp.exp(0.5 * log_var)
        if not deterministic and rng is not None:
            eps = jax.random.normal(rng, std.shape)
            return mu + std * eps, std
        return mu, std
