"""Learned (neural) route choice as a classical-episode Policy.

The reference only ever drives its MPNN policy through the RL environment
(``SimulatorEnv._step`` applies a sampled multi-hot edge action,
reinforcement_learning.py:224-231); rolling a *trained* policy out at scale
re-enters the host-stepped env loop.  Here a trained policy becomes a plain
:class:`~tarl_tpu.core.step.Policy` usable with ``core.step.run_episode`` and
``parallel.shard_map_episode.run_episode_shard_map`` — the whole learned
rollout is one fused ``lax.scan``, and under shard_map the forward pass is
computed edge-sharded per road block (SURVEY.md §2.10's end state: "the MPNN
segment ops become edge-sharded kernels with halo exchange").

Design notes:

* The per-node categorical over outgoing full edges is sampled with the
  slot-major Gumbel-max trick over a padded ``[KF, N]`` out-edge table —
  the same gather-free formulation as ``routing.policies.random_choice`` and
  ``core.direction`` (distribution-identical to ``GraphDistribution.sample``'s
  segment softmax + inverse CDF, different PRNG stream — documented exactly
  like the direction sampler's).
* The policy forward itself is the unmodified Flax module
  (``MPNNPolicyNet``/transformer policy) applied to the slot-major flattened
  edge list, so TRAINED PARAMS TRANSFER VERBATIM from the PPO path: every
  per-edge row sees the same features it saw in training.
* ``LearnedSpec`` hashes by identity (plain object), so a Policy carrying it
  stays a valid static jit argument even though params are jnp arrays.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..network import Network
from ..schema import agent_features_matrix
from ..state import SimState
from .observation import agent_index, extra_node_features, node_features

# Agent-row columns kept for VIRTUAL (SRC/DEST) nodes in the context:
# origin + destination only (see PPO._context: demographics/time columns of
# the surfaced pending entrant would make entry-edge logits flap).
VIRTUAL_KEEP = (1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)


class LearnedSpec:
    """Everything a parallel episode driver needs to re-derive the forward
    pass shard-locally.  Identity-hashed on purpose (see module docstring).
    """

    def __init__(self, policy_net, params, *, deterministic: bool = False,
                 pending_entrants: bool = False,
                 dist: Optional[jnp.ndarray] = None,
                 extra_obs: bool = False,
                 slot_net=None, slot_tables=None):
        self.policy_net = policy_net
        self.params = params
        self.deterministic = deterministic
        self.pending_entrants = pending_entrants
        self.dist = dist  # [N, N] distance-prior table (or None)
        self.extra_obs = extra_obs  # append observation.extra_node_features
        # Attention nets (edge_row_independent=False): the slot-major twin
        # forward + its in/out edge tables (models.transformer.slot_forward).
        self.slot_net = slot_net
        self.slot_tables = slot_tables


def rollout_context(
    state: SimState,
    network: Network,
    pending_entrants: bool = False,
    count: jnp.ndarray | None = None,
    head_ids: jnp.ndarray | None = None,
    extra_obs: bool = False,
) -> jnp.ndarray:
    """x[N, 16] node context — value-identical to ``PPO._context`` (same
    formulas over the same inputs), but computed directly from a SimState so
    classical episodes need no EnvState.  ``count``/``head_ids`` override the
    local road state with halo-gathered globals under shard_map.  With
    ``extra_obs`` the three congestion columns of
    ``observation.extra_node_features`` are appended (x[N, 19])."""
    nf = node_features(state, network, count=count)
    ai = agent_index(state, network, pending_entrants, head_ids=head_ids)
    rows = agent_features_matrix(state.agents)[ai]
    is_virtual = nf[:, 6:7] < 0  # ROAD_INDEX == -1
    keep = jnp.asarray(VIRTUAL_KEEP, jnp.float32)
    rows = jnp.where(is_virtual, rows * keep[None, :], rows)
    cols = [nf, rows]
    if extra_obs:
        cols.append(extra_node_features(state, network, count=count))
    return jnp.concatenate(cols, axis=-1)


def full_out_tables(network: Network):
    """Slot-major tables of the FULL out-edge list grouped by source node:
    ``(ok[KF, N], dst[KF, N], attr[KF, N])``, slot order = increasing edge id
    (the edge lists are built in id order, network.py).  Host-side, one-time.
    """
    src = np.asarray(network.full_src)
    dst = np.asarray(network.full_dst)
    attr = np.asarray(network.full_attr)
    n = network.num_nodes
    groups: list[list[int]] = [[] for _ in range(n)]
    for e, s in enumerate(src):
        groups[int(s)].append(e)
    kf = max(1, max((len(g) for g in groups), default=1))
    ok = np.zeros((kf, n), dtype=bool)
    dst_tab = np.zeros((kf, n), dtype=np.int32)
    attr_tab = np.zeros((kf, n), dtype=np.float32)
    for g, es in enumerate(groups):
        for s, e in enumerate(es):
            ok[s, g] = True
            dst_tab[s, g] = dst[e]
            attr_tab[s, g] = attr[e]
    return jnp.asarray(ok), jnp.asarray(dst_tab), jnp.asarray(attr_tab)


def slot_logits(spec: LearnedSpec, x: jnp.ndarray, network: Network,
                dst_tab: jnp.ndarray, attr_tab: jnp.ndarray,
                cols: jnp.ndarray) -> jnp.ndarray:
    """Policy logits for the slot-major out-edge table restricted to source
    columns ``cols`` — returns ``[KF, len(cols)]``.

    The Flax module is applied to the flattened padded edge list; every row
    is computed independently (per-edge MLP / embedding gather), so a column
    subset produces bitwise the same logits as the full table — the property
    the shard_map equality test pins."""
    kf = dst_tab.shape[0]
    src_flat = jnp.broadcast_to(cols[None, :], (kf, cols.shape[0])).reshape(-1)
    dst_flat = dst_tab[:, cols].reshape(-1)
    attr_flat = attr_tab[:, cols].reshape(-1, 1)
    if spec.dist is not None:
        flat = spec.policy_net.apply(
            spec.params, x, attr_flat, src_flat, dst_flat, spec.dist
        )
    else:
        flat = spec.policy_net.apply(spec.params, x, attr_flat, src_flat, dst_flat)
    return flat.reshape(kf, cols.shape[0])


def _slot_argmax(score: jnp.ndarray, dst_tab: jnp.ndarray,
                 prev_sel: jnp.ndarray) -> jnp.ndarray:
    """Ascending-slot strict-> argmax over ``score[KF, M]``: the winning
    slot's destination, or ``prev_sel`` where every slot is masked.  Same
    tie-break as ``random_choice`` / ``core.direction``."""
    kf = score.shape[0]
    best = jnp.full(score.shape[1:], -jnp.inf, jnp.float32)
    sel = prev_sel
    for k in range(kf):
        take = score[k] > best
        best = jnp.where(take, score[k], best)
        sel = jnp.where(take, dst_tab[k], sel)
    return sel.astype(jnp.int32)


def make_learned_choice(
    policy_net,
    params,
    network: Network,
    *,
    deterministic: bool = False,
    pending_entrants: bool = False,
    dist: Optional[jnp.ndarray] = None,
    extra_obs: bool = False,
):
    """Build a :class:`~tarl_tpu.core.step.Policy` that routes with a trained
    neural policy (see module docstring).

    Per tick: context ``x[N, 16]`` -> per-edge logits (the training-time
    forward, slot-major) -> per-node Gumbel-max sample (or argmax when
    ``deterministic``) -> SELECTED_ROAD[src] = chosen edge target, exactly
    the multi-hot write of ``ExternalChoice`` (reinforcement_learning.py:
    224-231) for the one-sample-per-source-group action.

    EDGE-ROW-INDEPENDENT policy nets (per-edge MLP / embedding gather, like
    MPNNPolicyNet) run directly on the slot-major padded edge table, whose
    invalid rows are masked AFTER the fact.  An attention-based net
    (TransformerRoutePolicy) aggregates over its whole edge list — padded
    rows would contaminate real nodes' softmax sums — so nets declaring
    ``edge_row_independent = False`` run through the masked slot-major twin
    forward instead (models.transformer.slot_forward: deterministic
    slot-axis softmax reductions; the trained params apply verbatim).
    """
    from ..core.step import Policy

    attention = not getattr(policy_net, "edge_row_independent", True)
    if attention:
        from ..models.transformer.slot_forward import (
            slot_edge_tables,
            slot_twin,
        )

        spec = LearnedSpec(
            policy_net, params, deterministic=deterministic,
            pending_entrants=pending_entrants, dist=dist,
            extra_obs=extra_obs, slot_net=slot_twin(policy_net),
            slot_tables=slot_edge_tables(network),
        )
        ok = spec.slot_tables.out_ok
        dst_tab = spec.slot_tables.out_dst
        attr_tab = spec.slot_tables.out_attr[..., 0]
    else:
        spec = LearnedSpec(
            policy_net, params, deterministic=deterministic,
            pending_entrants=pending_entrants, dist=dist, extra_obs=extra_obs,
        )
        ok, dst_tab, attr_tab = full_out_tables(network)
    n = network.num_nodes
    all_cols = jnp.arange(n, dtype=jnp.int32)

    def choice(state: SimState, network: Network):
        x = rollout_context(state, network, spec.pending_entrants,
                            extra_obs=spec.extra_obs)
        if attention:
            logits = spec.slot_net.apply(
                spec.params, x, spec.slot_tables, all_cols
            )
        else:
            logits = slot_logits(spec, x, network, dst_tab, attr_tab, all_cols)
        key, sub = jax.random.split(state.key)
        if spec.deterministic:
            score = jnp.where(ok, logits, -jnp.inf)
        else:
            g = jax.random.gumbel(sub, logits.shape, jnp.float32)
            score = jnp.where(ok, logits + g, -jnp.inf)
        sel = _slot_argmax(score, dst_tab, state.selected_road)
        return state._replace(selected_road=sel, key=key), None

    return Policy(choice=choice, learned=spec)
