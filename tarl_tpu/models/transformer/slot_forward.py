"""Slot-major Graph-Transformer forward for classical and sharded rollouts.

The training-time :class:`~tarl_tpu.models.transformer.agent.
TransformerRoutePolicy` aggregates attention with segment ops over the flat
edge list (gt_conv.py) — per-target softmax sums whose *presence* is exactly
why the net declares ``edge_row_independent = False`` and is rejected by the
padded-table fast paths (rl.learned_policy.make_learned_choice, the
shard_map episode): masking padded rows after the fact cannot undo their
contribution to a softmax denominator.

This module makes attention nets first-class on those paths by recomputing
the SAME forward (same parameter tree, applied to the same trained params
verbatim) in the repo's slot-major layout (core/direction.py design rules):

* the full out-edge table ``[KF, N]`` (rl.learned_policy.full_out_tables)
  is joined by an IN-edge table ``[KA, N]`` grouped by target — the
  per-target segment softmax becomes a masked softmax over the slot axis,
  a deterministic fixed-order reduction;
* edges never interact with each other given the node embeddings, so the
  per-layer edge-feature evolution (gt_conv.py:117-127) is computed
  independently for the two tables — in-entries feed the node update,
  out-entries feed the final per-edge logit head;
* the node trunk is parameterized by a per-layer ``sync`` hook: identity on
  one chip, an ``all_gather`` of the local node block under ``shard_map``.
  Every column's update is a pure function of (full node state, its own
  table columns), so the sharded forward is BITWISE-equal to the unsharded
  slot forward by construction (tests/test_shard_map_episode.py).

Relative to the segment-op training forward the only difference is
floating-point reduction order inside the softmax sums (slot-ascending here
vs segment_sum's scatter order), pinned to ~1e-6 by
tests/test_transformer.py::test_slot_forward_matches_segment.

Reference lineage: src/transformer/gt_conv.py:17-241 and model.py:16-203
re-designed (see gt_conv.py / model.py docstrings); the slot-major
formulation itself has no reference counterpart.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .mlp import MLP


class SlotEdgeTables(NamedTuple):
    """Host-built, static slot-major views of the FULL dual-graph edge list.

    IN tables group edges by TARGET node (attention aggregation); OUT tables
    group by SOURCE node (route-choice logits).  Slot order = increasing
    edge id, the same enumeration order as the flat edge list.
    """

    in_ok: jnp.ndarray     # bool[KA, N]
    in_src: jnp.ndarray    # int32[KA, N] — source node per in-slot (0 pad)
    in_attr: jnp.ndarray   # float32[KA, N, 1] — static edge features
    out_ok: jnp.ndarray    # bool[KF, N]
    out_dst: jnp.ndarray   # int32[KF, N] — target node per out-slot (0 pad)
    out_attr: jnp.ndarray  # float32[KF, N, 1]


def slot_edge_tables(network) -> SlotEdgeTables:
    """Build both slot-major edge tables from ``network.full_*`` (one-time,
    host side)."""
    src = np.asarray(network.full_src)
    dst = np.asarray(network.full_dst)
    attr = np.asarray(network.full_attr, dtype=np.float32)
    n = network.num_nodes

    def group(by, other):
        groups: list[list[int]] = [[] for _ in range(n)]
        for e, b in enumerate(by):
            groups[int(b)].append(e)
        k = max(1, max((len(g) for g in groups), default=1))
        ok = np.zeros((k, n), dtype=bool)
        oth = np.zeros((k, n), dtype=np.int32)
        att = np.zeros((k, n, 1), dtype=np.float32)
        for g, es in enumerate(groups):
            for s, e in enumerate(es):
                ok[s, g] = True
                oth[s, g] = other[e]
                att[s, g, 0] = attr[e]
        return jnp.asarray(ok), jnp.asarray(oth), jnp.asarray(att)

    in_ok, in_src, in_attr = group(dst, src)
    out_ok, out_dst, out_attr = group(src, dst)
    return SlotEdgeTables(in_ok, in_src, in_attr, out_ok, out_dst, out_attr)


class _SlotGTConv(nn.Module):
    """Slot-major twin of :class:`~tarl_tpu.models.transformer.gt_conv.
    GTConv` — identical parameter tree (same submodule names/shapes), the
    segment ops replaced by masked slot-axis reductions."""

    node_dim: int
    hidden_dim: int
    num_heads: int = 8
    gate: bool = False
    qkv_bias: bool = False
    norm: str = "ln"
    act: str = "relu"

    def _evolve_edges(self, WE, e_gate_fn, e, q_dst, k_src, dk):
        """Per-entry score/e_ij for an edge table; shapes [K, M, ...]."""
        qk = q_dst * k_src                                  # [K, M, H, dk]
        e_proj = WE(e).reshape(e.shape[:-1] + (self.num_heads, dk))
        e_ij = e_proj * qk / jnp.sqrt(float(dk))
        scores = qk.sum(-1) / jnp.sqrt(float(dk))           # [K, M, H]
        if self.gate:
            g = e_gate_fn(e).reshape(e.shape[:-1] + (self.num_heads, dk))
            scores = scores * nn.sigmoid(g).mean(-1)
        return scores, e_ij

    def _edge_out(self, e_ij, e, WOe, norm1e, ffn_e, norm2e):
        oe = e_ij.reshape(e_ij.shape[:2] + (self.hidden_dim,))
        oe = WOe(oe) + e
        oe = norm1e(oe)
        ffn_in = oe
        oe = ffn_e(oe)
        return norm2e(ffn_in + oe)

    @nn.compact
    def __call__(
        self,
        h: jnp.ndarray,        # [N, node_dim] full node state
        cols: jnp.ndarray,     # int32[M] columns to update
        in_ok: jnp.ndarray,    # bool[KA, M]
        in_src: jnp.ndarray,   # int32[KA, M]
        e_in: jnp.ndarray,     # [KA, M, hidden]
        out_dst: jnp.ndarray,  # int32[KF, M]
        e_out: jnp.ndarray,    # [KF, M, hidden]
    ):
        H = self.num_heads
        dk = self.hidden_dim // H
        n = h.shape[0]

        WQ = nn.Dense(self.hidden_dim, use_bias=self.qkv_bias, name="WQ")
        WK = nn.Dense(self.hidden_dim, use_bias=self.qkv_bias, name="WK")
        WV = nn.Dense(self.hidden_dim, use_bias=self.qkv_bias, name="WV")
        WE = nn.Dense(self.hidden_dim, name="WE")
        e_gate_fn = nn.Dense(self.hidden_dim, name="e_gate") if self.gate else None
        q = WQ(h).reshape(n, H, dk)
        k = WK(h).reshape(n, H, dk)
        v = WV(h).reshape(n, H, dk)

        # --- in-entries: attention at the column (target) nodes ----------
        scores, e_ij_in = self._evolve_edges(
            WE, e_gate_fn, e_in, q[cols][None], k[in_src], dk
        )
        # Masked slot softmax == segment_softmax per target (ops/segment.py:
        # 111-119): stabilize by the finite masked max, clamp the denom.
        neg = jnp.where(in_ok[..., None], scores, -jnp.inf)
        smax = jnp.max(neg, axis=0)
        smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
        expd = jnp.where(in_ok[..., None], jnp.exp(scores - smax[None]), 0.0)
        denom = jnp.maximum(expd.sum(axis=0), 1e-30)
        alpha = expd / denom[None]                          # [KA, M, H]

        vals = v[in_src]                                    # [KA, M, H, dk]
        if self.gate:
            g = nn.Dense(self.hidden_dim, name="n_gate")(h).reshape(n, H, dk)
            vals = vals * nn.sigmoid(g[in_src])
        weighted = alpha[..., None] * vals
        agg = weighted.sum(axis=0).reshape(cols.shape[0], H * dk)

        out = nn.Dense(self.node_dim, name="WO")(agg) + h[cols]
        out = nn.LayerNorm(name="norm1")(out)
        ffn_in = out
        out = MLP(self.node_dim, self.hidden_dim, 1, 0.0, self.act,
                  name="ffn")(out)
        h_cols = nn.LayerNorm(name="norm2")(ffn_in + out)

        # --- edge evolution (gt_conv.py:117-127), both tables ------------
        WOe = nn.Dense(self.hidden_dim, name="WOe")
        norm1e = nn.LayerNorm(name="norm1e")
        ffn_e = MLP(self.hidden_dim, self.hidden_dim, 1, 0.0, self.act,
                    name="ffn_e")
        norm2e = nn.LayerNorm(name="norm2e")
        e_in_next = self._edge_out(e_ij_in, e_in, WOe, norm1e, ffn_e, norm2e)

        # out-entries: src = the column, dst = out_dst (masked lanes carry
        # garbage that never reaches a valid logit — out_ok masks them).
        _, e_ij_out = self._evolve_edges(
            WE, e_gate_fn, e_out, q[out_dst], k[cols][None], dk
        )
        e_out_next = self._edge_out(e_ij_out, e_out, WOe, norm1e, ffn_e,
                                    norm2e)
        return h_cols, e_in_next, e_out_next


class _SlotGTNet(nn.Module):
    """Slot-major twin of :class:`GraphTransformerNet` restricted to the
    per-edge score head (the route-choice path; the pooled mu/log-var heads
    are not used by rollouts)."""

    pe: np.ndarray
    hidden_dim: int = 16
    num_layers: int = 2
    num_heads: int = 4
    gate: bool = True

    @nn.compact
    def __call__(self, xs, tables: SlotEdgeTables, cols, sync=None):
        h = nn.Dense(self.hidden_dim, use_bias=False, name="node_emb")(xs)
        h = h + nn.Dense(self.hidden_dim, use_bias=False, name="pe_emb")(
            jnp.asarray(self.pe)
        )
        edge_emb = nn.Dense(self.hidden_dim, use_bias=False, name="edge_emb")
        in_ok = tables.in_ok[:, cols]
        in_src = tables.in_src[:, cols]
        out_dst = tables.out_dst[:, cols]
        e_in = edge_emb(tables.in_attr[:, cols])
        e_out = edge_emb(tables.out_attr[:, cols])

        for i in range(self.num_layers):
            h_cols, e_in, e_out = _SlotGTConv(
                node_dim=self.hidden_dim,
                hidden_dim=self.hidden_dim,
                num_heads=self.num_heads,
                gate=self.gate,
                name=f"gt_{i}",
            )(h, cols, in_ok, in_src, e_in, out_dst, e_out)
            h = sync(h_cols) if sync is not None else h_cols

        return nn.Dense(1, name="edge_linear")(e_out)[..., 0]  # [KF, M]


class SlotTransformerRoutePolicy(nn.Module):
    """Twin of :class:`TransformerRoutePolicy` over slot tables.

    ``apply`` accepts the TRAINED TransformerRoutePolicy params verbatim:
    the parameter tree (``transformer/{node_emb, pe_emb, edge_emb, gt_i/*,
    edge_linear}``) matches by name and shape; the training-only pooled
    heads (mu_mlp/log_var_mlp) are simply unused.  Build one with
    :func:`slot_twin`.
    """

    pe: np.ndarray
    hidden_dim: int = 16
    num_layers: int = 2
    num_heads: int = 4
    gate: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,            # [N, F] node context (FULL, replicated)
        tables: SlotEdgeTables,
        cols: jnp.ndarray,         # int32[M] source columns to score
        sync=None,                 # per-layer node sync hook (see module doc)
    ) -> jnp.ndarray:              # [KF, M] out-slot logits
        xs = x / (1.0 + jnp.abs(x))
        return _SlotGTNet(
            pe=self.pe,
            hidden_dim=self.hidden_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            gate=self.gate,
            name="transformer",
        )(xs, tables, cols, sync=sync)


def slot_twin(policy_net) -> SlotTransformerRoutePolicy:
    """The slot-major twin of a trained ``TransformerRoutePolicy`` (same
    hyperparameters; apply with the same params)."""
    if float(getattr(policy_net, "dropout", 0.0)) != 0.0:
        raise ValueError("slot forward supports deterministic rollouts only")
    return SlotTransformerRoutePolicy(
        pe=policy_net.pe,
        hidden_dim=policy_net.hidden_dim,
        num_layers=policy_net.num_layers,
        num_heads=policy_net.num_heads,
        gate=policy_net.gate,
    )
