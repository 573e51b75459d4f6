"""All-pairs shortest paths on device via masked Bellman-Ford relaxation.

Replaces the reference's host-side ``networkx.all_pairs_dijkstra_path``
round-trip (agents/base.py:553-570: device -> CPU graph -> Python Dijkstra ->
dense ``next_hop_tensor`` -> device) with a min-plus relaxation fully on TPU,
vectorized over **all destinations simultaneously**: each sweep gathers
``cost_to_dest`` at every edge head and segment-min-reduces over each node's
outgoing edges, so one sweep is O(E * N) elementwise work that XLA tiles onto
the VPU, and the sweep count is bounded by the graph diameter (early exit via
``lax.while_loop``).

Cost convention: the weight of edge (u -> v) is the cost of *entering* v —
the same convention the reference's MSA validator uses
(user_equilibrium_msa.py:116-120).  The reference's Dijkstra agent computes
edge times from a mix of source-node occupancy and target-node constants
(agents/base.py:541-549); we implement the physically intended form — the
congested traversal time of the target road — and document the deviation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import PhysicsConfig, DEFAULT_PHYSICS
from ..network import Network
from ..ops.segment import segment_min
from ..state import RoadState

BIG = jnp.float32(1e18)


def road_costs(
    road: RoadState, network: Network, physics: PhysicsConfig = DEFAULT_PHYSICS
) -> jnp.ndarray:
    """Congested traversal cost per road: ``max(fftt, congestion_constant /
    (cap + 10 - n))`` — the congestion law of direction_mpnn.py:185-190
    evaluated at current occupancy.  float32[R]."""
    count_f = road.count.astype(jnp.float32)
    tc = network.congestion_constant / (
        network.capacity + physics.congestion_softening - count_f
    )
    return jnp.maximum(network.free_flow, tc)


def node_entry_costs(
    road: RoadState, network: Network, physics: PhysicsConfig = DEFAULT_PHYSICS
) -> jnp.ndarray:
    """Congested cost of entering each node (0 for SRC/DEST nodes)."""
    n = network.num_nodes
    return jnp.zeros((n,), jnp.float32).at[: network.num_roads].set(
        road_costs(road, network, physics)
    )


def marginal_road_costs(
    road: RoadState, network: Network, physics: PhysicsConfig = DEFAULT_PHYSICS
) -> jnp.ndarray:
    """Marginal social cost per road: ``tt(n) + n * d tt/dn`` — the
    system-optimal (tolled) routing objective.

    Under the congestion law ``tt(n) = cc / (cap + 10 - n)`` the external
    term is ``n * cc / (cap + 10 - n)^2``, zero in the free-flow regime
    where tt is flat.  Routing on these costs internalizes the congestion
    externality: a deterministic next-hop table diverts traffic BEFORE a
    queue binds, which reaches the system optimum on networks where
    travel-time routing oscillates (measured on the Bottleneck scenario:
    68.2 s vs the UE-seeking table's 80.5 s; see docs/LEARNING.md).  This
    is the routing-policy counterpart of the metrics' Price-of-Anarchy
    machinery — the reference has no equivalent.  float32[R].
    """
    count_f = road.count.astype(jnp.float32)
    denom = network.capacity + physics.congestion_softening - count_f
    tt_c = network.congestion_constant / denom
    tt = jnp.maximum(network.free_flow, tt_c)
    ext = jnp.where(
        tt_c > network.free_flow,
        count_f * network.congestion_constant / (denom * denom),
        0.0,
    )
    return tt + ext


def marginal_node_costs(
    road: RoadState, network: Network, physics: PhysicsConfig = DEFAULT_PHYSICS
) -> jnp.ndarray:
    """Marginal social cost of entering each node (0 for SRC/DEST nodes)."""
    n = network.num_nodes
    return jnp.zeros((n,), jnp.float32).at[: network.num_roads].set(
        marginal_road_costs(road, network, physics)
    )


def reference_edge_costs(
    road: RoadState, network: Network, physics: PhysicsConfig = DEFAULT_PHYSICS
) -> jnp.ndarray:
    """Strict-compat per-edge costs over the FULL edge list (float32[Ef]).

    Reproduces the reference Dijkstra agent's cost form verbatim
    (base.py:541-549): ``w(u->v) = max(fftt[u], cc[v] / (cap[u] + 10 - n[u]))``
    — the SOURCE node's free-flow time, occupancy and capacity combined with
    the TARGET's congestion constant.  SRC/DEST nodes carry all-zero features
    in the reference (ts.py:139-147), so their padded columns are zero here.
    Used only under ``RoutingConfig.strict_compat`` for A/B validation; the
    default path uses the physically-intended :func:`node_entry_costs`.
    """
    n = network.num_nodes
    R = network.num_roads

    def pad(x):
        return jnp.zeros((n,), jnp.float32).at[:R].set(x)

    fftt = pad(network.free_flow)
    cap = pad(network.capacity)
    cc = pad(network.congestion_constant)
    cnt = pad(road.count.astype(jnp.float32))
    u = network.full_src
    v = network.full_dst
    tc = cc[v] / (cap[u] + physics.congestion_softening - cnt[u])
    return jnp.maximum(fftt[u], tc)


@partial(jax.jit, static_argnames=("num_nodes", "max_iters"))
def all_pairs_next_hop(
    edge_src: jnp.ndarray,
    edge_dst: jnp.ndarray,
    entry_cost: jnp.ndarray,
    num_nodes: int,
    max_iters: int | None = None,
    edge_cost: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compute ``(dist[N, N], next_hop[N, N])`` for all ordered node pairs.

    ``dist[v, d]`` is the cost of the cheapest v -> d path (sum of entry costs
    of every node after v); ``next_hop[v, d]`` is the first node on that path,
    ``v`` itself when v == d (base.py:568) and ``-1`` when unreachable
    (base.py:561).  ``edge_cost`` (float32[E]) overrides the per-node entry
    costs with arbitrary per-edge weights (strict-compat cost form).
    """
    n = num_nodes
    iters = (n - 1) if max_iters is None else max_iters
    eye = jnp.eye(n, dtype=bool)
    dist0 = jnp.where(eye, 0.0, BIG)

    # cost of traversing each edge (default: cost of entering its head)
    w_dst = edge_cost if edge_cost is not None else entry_cost[edge_dst]

    def sweep(dist):
        # cand[e, d] = w(dst_e) + dist[dst_e, d]
        cand = w_dst[:, None] + dist[edge_dst]
        relaxed = segment_min(cand, edge_src, n)
        return jnp.minimum(dist, relaxed)

    def cond(carry):
        i, dist, changed = carry
        return changed & (i < iters)

    def body(carry):
        i, dist, _ = carry
        new = sweep(dist)
        return i + 1, new, jnp.any(new < dist)

    _, dist, _ = jax.lax.while_loop(cond, body, (0, dist0, jnp.bool_(True)))

    # next hop: argmin over outgoing edges of w(dst) + dist[dst, d]
    cand = w_dst[:, None] + dist[edge_dst]  # [E, N]
    best = segment_min(cand, edge_src, n)  # [N, N]
    e_ids = jnp.arange(edge_src.shape[0], dtype=jnp.int32)
    is_best = cand <= best[edge_src] + 1e-6
    arg_e = segment_min(
        jnp.where(is_best, e_ids[:, None], edge_src.shape[0]), edge_src, n
    )
    has_edge = arg_e < edge_src.shape[0]
    hop = jnp.where(
        has_edge, edge_dst[jnp.minimum(arg_e, edge_src.shape[0] - 1)], -1
    )
    reachable = dist < BIG
    next_hop = jnp.where(reachable & ~eye, hop, -1)
    next_hop = jnp.where(eye, jnp.arange(n, dtype=jnp.int32)[:, None], next_hop)
    return dist, next_hop


@partial(jax.jit, static_argnames=("max_iters",))
def all_pairs_next_hop_nbr(
    nbr: jnp.ndarray,         # int32[N, D] padded out-neighbor table
    nbr_ok: jnp.ndarray,      # bool[N, D]
    entry_cost: jnp.ndarray,  # float32[N]
    max_iters: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather-based all-pairs relaxation over the padded neighbor table.

    Same contract as :func:`all_pairs_next_hop` (exact-equal distances and
    next hops, including tie-breaks), but each sweep is a dense ``[N, D, N]``
    gather + min over the tiny out-degree axis (D <= ~6 on road networks)
    instead of a 2-D segment reduction over the edge list.  Measured at
    throughput parity on a single v5e chip — both formulations are
    bandwidth-bound on the per-sweep intermediate — but the gather form has
    no scatter dependence, which matters for sharded execution and keeps the
    relaxation expressible inside future Pallas halo-exchange kernels.
    """
    n, d = nbr.shape
    iters = (n - 1) if max_iters is None else max_iters
    eye = jnp.eye(n, dtype=bool)
    dist0 = jnp.where(eye, 0.0, BIG)

    w = jnp.where(nbr_ok, entry_cost[nbr], BIG)  # [N, D]

    def sweep(dist):
        # Slot loop of full-row gathers (see primal_all_pairs_dist).
        new = dist
        for k in range(d):
            new = jnp.minimum(new, w[:, k][:, None] + dist[nbr[:, k]])
        return new

    def cond(carry):
        i, dist, changed = carry
        return changed & (i < iters)

    def body(carry):
        i, dist, _ = carry
        new = sweep(dist)
        return i + 1, new, jnp.any(new < dist)

    _, dist, _ = jax.lax.while_loop(cond, body, (0, dist0, jnp.bool_(True)))

    cand = w[:, :, None] + dist[nbr]  # [N, D, N]
    arg_d = jnp.argmin(cand, axis=1)  # [N, N_dest], lowest slot wins ties
    hop = nbr[jnp.arange(n, dtype=jnp.int32)[:, None], arg_d]  # [N, N]
    reachable = dist < BIG
    next_hop = jnp.where(reachable & ~eye, hop, -1)
    next_hop = jnp.where(eye, jnp.arange(n, dtype=jnp.int32)[:, None], next_hop)
    return dist, next_hop


@partial(jax.jit, static_argnames=("max_iters",))
def primal_all_pairs_dist(
    road_cost: jnp.ndarray,       # float32[R] — cost of traversing each road
    inter_out_road: jnp.ndarray,  # int32[I, K] — outgoing roads per intersection
    inter_out_ok: jnp.ndarray,    # bool[I, K]
    road_to: jnp.ndarray,         # int32[R] — head intersection of each road
    max_iters: int | None = None,
    dist0: jnp.ndarray | None = None,  # float32[I, I] upper bound warm start
) -> jnp.ndarray:
    """All-pairs distances over the PRIMAL (intersection) graph: float32[I, I].

    The scalable routing backend.  The dual-graph tables of
    :func:`all_pairs_next_hop_nbr` are O(N^2) with N = R + 2I dual nodes
    (2.4 GB at Grid64x64); every dual distance is recoverable from the primal
    one — ``dist_dual(road r, DEST d) = dist[road_to[r], inter(d)]`` because
    entering SRC/DEST nodes costs 0 — so the primal sweep does the same work
    on an I-node graph (67 MB at Grid64x64).  Next hops are not materialized;
    :func:`tarl_tpu.routing.policies.make_shortest_path_choice_primal` derives
    them per lookup as ``argmin over outgoing roads r' of cost[r'] +
    dist[road_to[r'], dest]``, with the argmin slot order matching the dual
    table's tie-breaks (network.inter_out_road slot order).
    """
    i_n = inter_out_road.shape[0]
    iters = (i_n - 1) if max_iters is None else max_iters
    eye = jnp.eye(i_n, dtype=bool)
    if dist0 is None:
        dist0 = jnp.where(eye, 0.0, BIG)
    else:
        # Warm start: any VALID UPPER BOUND converges (relaxation only
        # lowers); callers pass prev_dist * max(new_cost/old_cost), which
        # bounds every path's revaluation, so the while_loop's early exit
        # fires after a few sweeps instead of a diameter's worth.
        dist0 = jnp.where(eye, 0.0, dist0)
    return _primal_relax(dist0, road_cost, inter_out_road, inter_out_ok,
                         road_to, iters)


@partial(jax.jit, static_argnames=("max_iters",))
def primal_dest_dist(
    road_cost: jnp.ndarray,       # float32[R]
    inter_out_road: jnp.ndarray,  # int32[I, K]
    inter_out_ok: jnp.ndarray,    # bool[I, K]
    road_to: jnp.ndarray,         # int32[R]
    dest_list: jnp.ndarray,       # int32[D] — destination intersections
    max_iters: int | None = None,
    dist0: jnp.ndarray | None = None,  # float32[I, D] warm start
) -> jnp.ndarray:
    """Destination-restricted primal distances: float32[I, D].

    Real populations commute to a concentrated set of destination zones, so
    the routing table only needs columns for intersections that actually
    appear as trip destinations — O(I*D) instead of O(I^2) memory and sweep
    work (13 MB instead of 1 GB at Grid128x128 with 200 zones).  Same
    relaxation and warm-start semantics as :func:`primal_all_pairs_dist`.
    """
    i_n = inter_out_road.shape[0]
    iters = (i_n - 1) if max_iters is None else max_iters
    anchor = jnp.arange(i_n, dtype=jnp.int32)[:, None] == dest_list[None, :]
    if dist0 is None:
        dist0 = jnp.where(anchor, 0.0, BIG)
    else:
        dist0 = jnp.where(anchor, 0.0, dist0)
    return _primal_relax(dist0, road_cost, inter_out_road, inter_out_ok,
                         road_to, iters)


def _primal_relax(dist0, road_cost, inter_out_road, inter_out_ok, road_to,
                  iters):
    w = jnp.where(inter_out_ok, road_cost[inter_out_road], BIG)  # [I, K]
    succ = road_to[inter_out_road]  # [I, K]
    k_n = succ.shape[1]

    def sweep(dist):
        # Slot loop of full-row gathers: measured ~1.75x faster than the
        # [I, K, I] 3-D gather form on TPU (no K-major intermediate).
        new = dist
        for k in range(k_n):
            new = jnp.minimum(new, w[:, k][:, None] + dist[succ[:, k]])
        return new

    def cond(carry):
        i, dist, changed = carry
        return changed & (i < iters)

    def body(carry):
        i, dist, _ = carry
        new = sweep(dist)
        return i + 1, new, jnp.any(new < dist)

    _, dist, _ = jax.lax.while_loop(cond, body, (0, dist0, jnp.bool_(True)))
    return dist


def congested_next_hop(
    road: RoadState,
    network: Network,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    max_iters: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All-pairs ``(dist, next_hop)`` under current congestion — the on-device
    equivalent of the reference's periodic Dijkstra refresh (base.py:539-570)."""
    cost = node_entry_costs(road, network, physics)
    return all_pairs_next_hop(
        network.full_src, network.full_dst, cost, network.num_nodes,
        max_iters=max_iters,
    )
