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

import os
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


@partial(jax.jit, static_argnames=("max_iters", "delta_shifts"))
def primal_all_pairs_dist(
    road_cost: jnp.ndarray,       # float32[R] — cost of traversing each road
    inter_out_road: jnp.ndarray,  # int32[I, K] — outgoing roads per intersection
    inter_out_ok: jnp.ndarray,    # bool[I, K]
    road_to: jnp.ndarray,         # int32[R] — head intersection of each road
    max_iters: int | None = None,
    dist0: jnp.ndarray | None = None,  # float32[I, I] upper bound warm start
    delta_shifts: tuple | None = None,   # static offsets (primal_delta_buckets)
    delta_slot: jnp.ndarray | None = None,  # int32[R] weight-table slots
    delta_perm: jnp.ndarray | None = None,   # int32[I] row order (or None)
    delta_inv: jnp.ndarray | None = None,    # int32[I] inverse row order
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
    buckets = (None if delta_shifts is None
               else (delta_shifts, delta_slot, delta_perm, delta_inv))
    return _primal_relax(dist0, road_cost, inter_out_road, inter_out_ok,
                         road_to, iters, buckets=buckets)


@partial(jax.jit, static_argnames=("max_iters", "delta_shifts"))
def primal_dest_dist(
    road_cost: jnp.ndarray,       # float32[R]
    inter_out_road: jnp.ndarray,  # int32[I, K]
    inter_out_ok: jnp.ndarray,    # bool[I, K]
    road_to: jnp.ndarray,         # int32[R]
    dest_list: jnp.ndarray,       # int32[D] — destination intersections
    max_iters: int | None = None,
    dist0: jnp.ndarray | None = None,  # float32[I, D] warm start
    delta_shifts: tuple | None = None,   # static offsets (primal_delta_buckets)
    delta_slot: jnp.ndarray | None = None,  # int32[R] weight-table slots
    delta_perm: jnp.ndarray | None = None,   # int32[I] row order (or None)
    delta_inv: jnp.ndarray | None = None,    # int32[I] inverse row order
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
    buckets = (None if delta_shifts is None
               else (delta_shifts, delta_slot, delta_perm, delta_inv))
    return _primal_relax(dist0, road_cost, inter_out_road, inter_out_ok,
                         road_to, iters, buckets=buckets)


def primal_delta_buckets(
    inter_out_road, inter_out_ok, road_to, max_deltas: int = 32,
    coords=None,
):
    """Host-side sweep analysis: bucket primal edges by INDEX OFFSET.

    The gather sweep of :func:`_primal_relax` reads ``dist[succ[:, k]]`` —
    row gathers that hit XLA:TPU's serial emitter and run ~25x off HBM
    bandwidth (docs/BENCH.md).  But road networks have very few distinct
    values of ``(head - tail) mod I`` under a locality-preserving node
    ordering, and a fixed-offset neighbor read is a roll — a full-bandwidth
    contiguous copy.  The VPU work of the multisweep kernel scales with the
    number of distinct offsets, so the ordering matters: the reference's
    sorted-id-STRING ordinals (ts.py:142 ``sorted()``) scramble a 64x64
    grid from 4 offsets to 18 ("n0_10" < "n0_2").  When ``coords`` —
    ``(x[I], y[I])`` numpy arrays — are given, this helper also evaluates
    the row-major coordinate orders lexsort(y,x) / lexsort(x,y) and keeps
    whichever of the three candidate orders yields the fewest distinct
    offsets.  The permutation is applied to the SOURCE (row) axis of the
    distance table only, entirely inside :func:`_primal_relax` (permute
    rows in, sweep, permute rows back — two contiguous row copies), so
    nothing outside the sweep sees it.

    Returns ``(deltas, slot_of_road, perm, inv_perm)``:

    * ``deltas`` — python-int offsets in permuted row space;
    * ``slot_of_road`` — ``int32[R]`` map of each road to its slot
      ``b * I + pos(tail)`` in the flattened ``[B, I]`` sweep weight table;
    * ``perm`` / ``inv_perm`` — ``int32[I]`` row orders
      (``dist_p = dist[perm]``, ``dist = dist_p[inv_perm]``) or ``None``
      for the identity order;

    or ``None`` when even the best order has more than ``max_deltas``
    distinct offsets (irregular networks fall back to the gather sweep).
    Parallel roads sharing (tail, head) collide on one slot; the weight
    table is built with a ``min`` scatter, which is exactly the min-plus
    relaxation's treatment of parallel edges.
    """
    import numpy as np

    out = np.asarray(inter_out_road)
    ok = np.asarray(inter_out_ok)
    rt = np.asarray(road_to)
    i_n, k_n = out.shape
    src = np.repeat(np.arange(i_n, dtype=np.int64), k_n)[ok.ravel()]
    roads = out.ravel()[ok.ravel()]
    dst = rt[roads]

    def offsets_under(pos):
        d_mod = (pos[dst] - pos[src]) % i_n
        return d_mod, np.unique(d_mod)

    candidates = [(None, np.arange(i_n, dtype=np.int64))]
    if coords is not None:
        x = np.asarray(coords[0], dtype=np.float64)
        y = np.asarray(coords[1], dtype=np.float64)
        if x.shape == (i_n,) and (np.any(x != x[0]) or np.any(y != y[0])):
            candidates.append(("yx", np.lexsort((x, y))))
            candidates.append(("xy", np.lexsort((y, x))))
            # Polar (radius-group, angle) — linearizes ring-and-spoke
            # metros the row-major orders scramble (network.polar_rank;
            # roll_friendly_road_order uses the same rank for roads).
            from ..network import polar_rank

            prank = polar_rank(x, y)
            candidates.append(("polar", np.argsort(prank)))

    best = None
    for name, order in candidates:
        pos = np.empty(i_n, dtype=np.int64)
        pos[order] = np.arange(i_n, dtype=np.int64)
        d_mod, deltas = offsets_under(pos)
        if best is None or deltas.shape[0] < best[3].shape[0]:
            best = (name, order, d_mod, deltas)
    name, order, d_mod, deltas = best
    if deltas.shape[0] > max_deltas:
        return None
    pos = np.empty(i_n, dtype=np.int64)
    pos[order] = np.arange(i_n, dtype=np.int64)
    b_of = {int(d): b for b, d in enumerate(deltas)}
    num_roads = rt.shape[0]
    slot = np.full(num_roads, deltas.shape[0] * i_n, np.int64)  # pad: dropped
    for s, r, d in zip(src, roads, d_mod):
        slot[r] = b_of[int(d)] * i_n + pos[s]
    if name is None:
        perm = inv = None
    else:
        perm = jnp.asarray(order, jnp.int32)
        inv = jnp.asarray(pos, jnp.int32)
    return (tuple(int(d) for d in deltas), jnp.asarray(slot, jnp.int32),
            perm, inv)


def _sweep_kernel_body(delta_ref, w_ref, dist_ref, out_ref, *, num_deltas):
    """One min-plus sweep over a [I, T] column tile, all shifts in VMEM.

    ``dist`` is loaded from HBM exactly once per sweep; each delta is a
    sublane-rotate (``pltpu.roll``) of the resident tile — the
    full-bandwidth form of the relaxation (the XLA roll formulation
    re-reads HBM per delta, the gather formulation hits the serial
    emitter).  A fori_loop with a dynamic shift keeps the VMEM stack at
    ONE rotated temporary (an unrolled static-slice form allocated a
    buffer per delta and blew scoped VMEM)."""
    from jax.experimental.pallas import tpu as pltpu

    tile = dist_ref[...]
    w_all = w_ref[...]  # [I, B_pad]
    lane = jax.lax.broadcasted_iota(jnp.int32, w_all.shape, 1)

    def step(b, new):
        # delta_ref holds PRE-NEGATED shifts ((I - d) % I), so the roll is a
        # positive dynamic sublane rotate; the w column is selected with a
        # masked lane-reduce (Mosaic cannot prove alignment of a dynamic
        # lane index for a vector load).
        shifted = pltpu.roll(tile, delta_ref[0, b], 0)
        w_b = jnp.where(lane == b, w_all, 0.0).sum(axis=1, keepdims=True)
        return jnp.minimum(new, w_b + shifted)

    out_ref[...] = jax.lax.fori_loop(0, num_deltas, step, tile)


def _multisweep_kernel_body(w_ref, dist_ref, out_ref, *, shifts, num_sweeps):
    """ALL ``num_sweeps`` min-plus sweeps on a resident [I, T] column tile.

    Two structural upgrades over :func:`_sweep_kernel_body` (the dynamic
    single-sweep form):

    * **Static shifts** — the delta offsets are baked into the kernel as
      python ints, so every rotate is a compile-time sublane permutation
      instead of a dynamic ``pltpu.roll`` (the measured VPU bottleneck of
      the first kernel), and each bucket's weight column is a static slice
      instead of a masked lane-reduce.
    * **All sweeps in one launch** — relaxation couples ROWS (sources) of a
      column tile, never columns, so a tile that holds the full source axis
      can run every sweep without leaving VMEM: HBM traffic for an 8-sweep
      refresh drops from 8 reads + 8 writes of the table to exactly one of
      each.  A fixed sweep count is outcome-identical to the early-exiting
      ``while_loop`` (min-plus relaxation is idempotent at its fixpoint, and
      the loop's cap is the same ``iters``).
    """
    from jax.experimental.pallas import tpu as pltpu

    w_all = w_ref[...]  # [I, B_pad]

    def sweep(tile):
        new = tile
        for b, sh in enumerate(shifts):
            new = jnp.minimum(new, w_all[:, b:b + 1] + pltpu.roll(tile, sh, 0))
        return new

    # Per-TILE early exit: column tiles are independent, so a tile whose
    # rows stopped changing can stop sweeping — with the production warm
    # start (prev table x worst cost ratio) most tiles converge in a couple
    # of sweeps, and the VPU rotate work (the kernel's bound) scales with
    # sweeps actually run.  Outcome-identical to the fixed count (idempotent
    # fixpoint), hence to the gather while_loop.
    def cond(c):
        i, tile, changed = c
        return changed & (i < num_sweeps)

    def body(c):
        i, tile, _ = c
        new = sweep(tile)
        return i + 1, new, jnp.any(new < tile)

    _, final, _ = jax.lax.while_loop(
        cond, body, (0, dist_ref[...], jnp.bool_(True))
    )
    out_ref[...] = final


def _multisweep_rb_kernel_body(w_ref, dist_ref, out_ref, *, shifts,
                               num_sweeps, halo):
    """Row-blocked :func:`_multisweep_kernel_body`: the block sees a
    ``[W = B + 2*halo, T]`` window of the source axis; rolls wrap within
    the window, whose contaminated margin never reaches the interior
    (see :func:`_rowblock_plan`).  Writes the interior B rows."""
    from jax.experimental.pallas import tpu as pltpu

    w_all = w_ref[0]            # [W, B_pad]
    block = out_ref.shape[1]

    def sweep(tile):
        new = tile
        for b, sh in enumerate(shifts):
            new = jnp.minimum(new, w_all[:, b:b + 1] + pltpu.roll(tile, sh, 0))
        return new

    def cond(c):
        i, tile, changed = c
        return changed & (i < num_sweeps)

    def body(c):
        i, tile, _ = c
        new = sweep(tile)
        return i + 1, new, jnp.any(new < tile)

    _, final, _ = jax.lax.while_loop(
        cond, body, (0, dist_ref[0], jnp.bool_(True))
    )
    out_ref[0] = final[halo:halo + block]


def _multisweep_nr_rb_kernel_body(w_ref, road_ref, slot_ref, dist_ref,
                                  out_dist_ref, out_road_ref, *,
                                  shifts, num_sweeps, halo):
    """Row-blocked :func:`_multisweep_nr_kernel_body` (the halo budgets one
    extra propagation step for the next-road epilogue's rotates)."""
    from jax.experimental.pallas import tpu as pltpu

    w_all = w_ref[0]
    road_all = road_ref[0]
    slot_all = slot_ref[0]
    block = out_dist_ref.shape[1]

    def sweep(tile):
        new = tile
        for b, sh in enumerate(shifts):
            new = jnp.minimum(new, w_all[:, b:b + 1] + pltpu.roll(tile, sh, 0))
        return new

    def cond(c):
        i, tile, changed = c
        return changed & (i < num_sweeps)

    def body(c):
        i, tile, _ = c
        new = sweep(tile)
        return i + 1, new, jnp.any(new < tile)

    _, final, _ = jax.lax.while_loop(
        cond, body, (0, dist_ref[0], jnp.bool_(True))
    )
    out_dist_ref[0] = final[halo:halo + block]

    big = float(BIG)
    best = jnp.full(final.shape, big, jnp.float32)
    road = jnp.full(final.shape, -1.0, jnp.float32)
    bslot = jnp.full(final.shape, 1e9, jnp.float32)
    for b, sh in enumerate(shifts):
        cand = w_all[:, b:b + 1] + pltpu.roll(final, sh, 0)
        sl = jnp.broadcast_to(slot_all[:, b:b + 1], final.shape)
        take = (cand < best) | ((cand == best) & (sl < bslot))
        best = jnp.where(take, cand, best)
        road = jnp.where(take, jnp.broadcast_to(road_all[:, b:b + 1],
                                                final.shape), road)
        bslot = jnp.where(take, sl, bslot)
    nr = jnp.where(best < big, road, -1.0)
    out_road_ref[0] = nr[halo:halo + block]


def _window_shifts(deltas, i_n: int, w: int) -> tuple:
    """Window-local roll amounts: row r reads window[r + d_eff] where
    d_eff is the signed cyclic displacement of each delta."""
    out = []
    for d in deltas:
        d_eff = int(d) if int(d) <= i_n // 2 else int(d) - i_n
        out.append((w - d_eff) % w)
    return tuple(out)


def _multisweep_pallas_rowblock(dist, w_cols, deltas, num_sweeps: int,
                                plan: tuple):
    """Row-blocked multisweep launch: dist [I, Dp] -> relaxed [I, Dp]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    block, h, tile_d = plan
    i_n, d_p = dist.shape
    nb = i_n // block
    w = block + 2 * h
    b_pad = w_cols.shape[1]
    dist_w = _row_windows(dist, block, h)      # [nb, W, Dp]
    w_w = _row_windows(w_cols, block, h)       # [nb, W, B_pad]
    out = pl.pallas_call(
        partial(_multisweep_rb_kernel_body,
                shifts=_window_shifts(deltas, i_n, w),
                num_sweeps=num_sweeps, halo=h),
        grid=(nb, d_p // tile_d),
        in_specs=[
            pl.BlockSpec((1, w, b_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, tile_d), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, tile_d), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, block, d_p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_multisweep_vmem()
        ),
    )(w_w, dist_w)
    return out.reshape(i_n, d_p)


def _multisweep_nr_pallas_rowblock(dist, w_cols, road_cols, slot_cols,
                                   deltas, num_sweeps: int, plan: tuple):
    """Row-blocked fused relax+next-road launch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    block, h, tile_d = plan
    i_n, d_p = dist.shape
    nb = i_n // block
    w = block + 2 * h
    b_pad = w_cols.shape[1]
    small = pl.BlockSpec((1, w, b_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((1, w, tile_d), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    otile = pl.BlockSpec((1, block, tile_d), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    dist_o, road_o = pl.pallas_call(
        partial(_multisweep_nr_rb_kernel_body,
                shifts=_window_shifts(deltas, i_n, w),
                num_sweeps=num_sweeps, halo=h),
        grid=(nb, d_p // tile_d),
        in_specs=[small, small, small, tile],
        out_specs=(otile, otile),
        out_shape=(jax.ShapeDtypeStruct((nb, block, d_p), jnp.float32),
                   jax.ShapeDtypeStruct((nb, block, d_p), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_multisweep_vmem()
        ),
    )(_row_windows(w_cols, block, h), _row_windows(road_cols, block, h),
      _row_windows(slot_cols, block, h), _row_windows(dist, block, h))
    return dist_o.reshape(i_n, d_p), road_o.reshape(i_n, d_p)


def _multisweep_nr_kernel_body(w_ref, road_ref, slot_ref, dist_ref,
                               out_dist_ref, out_road_ref, *,
                               shifts, num_sweeps):
    """:func:`_multisweep_kernel_body` + a NEXT-ROAD epilogue on the still-
    resident final tile.

    ``primal_next_roads`` re-reads the finished table K times through row
    gathers (~2-4 ms of the 8 ms Grid64 refresh); here the same argmin runs
    as B extra rotates while the tile is in VMEM.  Tie-break equivalence
    with the ascending-slot strict-< loop: each bucket carries the
    representative (min-(cost, slot)) road of its parallel group
    (``road_ref`` / ``slot_ref``, built per refresh in
    :func:`_epilogue_rep_tables`), and the epilogue compares candidates
    lexicographically on (value, slot rank) — the same winner as iterating
    slots in ascending order with strict <, whatever the bucket order.
    Unreachable destinations filter to -1 through the same
    ``best < BIG`` guard as the gather form.
    """
    from jax.experimental.pallas import tpu as pltpu

    w_all = w_ref[...]      # [I, B_pad] min cost per (row, bucket)
    road_all = road_ref[...]  # [I, B_pad] representative road id (f32)
    slot_all = slot_ref[...]  # [I, B_pad] representative slot rank (f32)

    def sweep(tile):
        new = tile
        for b, sh in enumerate(shifts):
            new = jnp.minimum(new, w_all[:, b:b + 1] + pltpu.roll(tile, sh, 0))
        return new

    def cond(c):
        i, tile, changed = c
        return changed & (i < num_sweeps)

    def body(c):
        i, tile, _ = c
        new = sweep(tile)
        return i + 1, new, jnp.any(new < tile)

    _, final, _ = jax.lax.while_loop(
        cond, body, (0, dist_ref[...], jnp.bool_(True))
    )
    out_dist_ref[...] = final

    big = float(BIG)  # python literal: Mosaic kernels can't capture consts
    best = jnp.full(final.shape, big, jnp.float32)
    road = jnp.full(final.shape, -1.0, jnp.float32)
    bslot = jnp.full(final.shape, 1e9, jnp.float32)
    for b, sh in enumerate(shifts):
        cand = w_all[:, b:b + 1] + pltpu.roll(final, sh, 0)
        sl = jnp.broadcast_to(slot_all[:, b:b + 1], final.shape)
        take = (cand < best) | ((cand == best) & (sl < bslot))
        best = jnp.where(take, cand, best)
        road = jnp.where(take, jnp.broadcast_to(road_all[:, b:b + 1],
                                                final.shape), road)
        bslot = jnp.where(take, sl, bslot)
    out_road_ref[...] = jnp.where(best < big, road, -1.0)


def _multisweep_nr_pallas(dist, w_cols, road_cols, slot_cols, shifts: tuple,
                          num_sweeps: int, tile_d: int):
    """dist [I, Dp] -> (relaxed dist, next-road table), ONE kernel launch
    (see _multisweep_nr_kernel_body)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i_n, d_p = dist.shape
    b_pad = w_cols.shape[1]
    small = pl.BlockSpec((i_n, b_pad), lambda j: (0, 0),
                         memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((i_n, tile_d), lambda j: (0, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_multisweep_nr_kernel_body, shifts=shifts,
                num_sweeps=num_sweeps),
        grid=(d_p // tile_d,),
        in_specs=[small, small, small, tile],
        out_specs=(tile, tile),
        out_shape=(jax.ShapeDtypeStruct((i_n, d_p), jnp.float32),
                   jax.ShapeDtypeStruct((i_n, d_p), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_multisweep_vmem()
        ),
    )(w_cols, road_cols, slot_cols, dist)


def epilogue_slot_tables(inter_out_road, inter_out_ok, road_to, buckets):
    """Host-side static tables for the in-kernel next-road epilogue:
    ``(out_r_p[I, K] int32, ok_p[I, K] bool, b_slot_p[I, K] int32)`` — the
    out-slot table re-ordered to the bucket row permutation, plus each
    slot's delta-bucket index (invalid slots map to the B_pad-1 scratch
    lane, whose weight stays BIG)."""
    import numpy as np

    deltas, _, perm, _ = buckets
    out = np.asarray(inter_out_road)
    ok = np.asarray(inter_out_ok)
    rt = np.asarray(road_to)
    i_n, k_n = out.shape
    order = (np.arange(i_n, dtype=np.int64) if perm is None
             else np.asarray(perm, dtype=np.int64))
    pos = np.empty(i_n, dtype=np.int64)
    pos[order] = np.arange(i_n, dtype=np.int64)
    b_of = {int(d): b for b, d in enumerate(deltas)}
    out_p = out[order]
    ok_p = ok[order]
    head_pos = pos[rt[out_p]]                       # [I, K]
    d_mod = (head_pos - np.arange(i_n)[:, None]) % i_n
    b_pad = _round_up_lane(len(deltas))
    d_to_b = np.full(i_n, b_pad - 1, np.int64)
    for d, b in b_of.items():
        d_to_b[d] = b
    b_slot = np.where(ok_p, d_to_b[d_mod], b_pad - 1)
    return (jnp.asarray(out_p, jnp.int32), jnp.asarray(ok_p),
            jnp.asarray(b_slot, jnp.int32))


def _epilogue_rep_tables(road_cost, out_r_p, ok_p, b_slot_p, b_pad: int):
    """Per-refresh representative tables for the epilogue, [I, B_pad] each:
    min cost per (row, bucket) (== the sweep's w_cols), the road achieving
    it, and that road's slot rank — ties broken toward the LOWER slot by a
    strict-< K-pass, mirroring ``primal_next_roads``'s ascending-slot loop
    over parallel roads.  Pure elementwise/one-hot build: no gathers or
    scatters beyond the K small ``cost[out_r]`` row reads."""
    i_n, k_n = out_r_p.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (i_n, b_pad), 1)
    w = jnp.full((i_n, b_pad), BIG, jnp.float32)
    road = jnp.full((i_n, b_pad), -1.0, jnp.float32)
    slot = jnp.full((i_n, b_pad), 1e9, jnp.float32)
    for k in range(k_n):
        cost_k = jnp.where(ok_p[:, k], road_cost[out_r_p[:, k]], BIG)
        hit = lane == b_slot_p[:, k][:, None]
        take = hit & (cost_k[:, None] < w)
        w = jnp.where(take, cost_k[:, None], w)
        road = jnp.where(
            take, out_r_p[:, k].astype(jnp.float32)[:, None], road
        )
        slot = jnp.where(take, jnp.float32(k), slot)
    return w, road, slot


def _multisweep_nr_tile(i_n: int, num_deltas: int, iters: int) -> int | None:
    """Tile for the fused relax+next-road kernel (TARL_MULTISWEEP_NR=0 opts
    out), or None.  Same preconditions as :func:`_multisweep_tile` with
    headroom for the epilogue's extra column tiles and rep tables."""
    import os

    if os.environ.get("TARL_MULTISWEEP_NR", "1") != "1":
        return None
    return _multisweep_tile(i_n, num_deltas, iters, extra_cols=8, extra_w=3)


def primal_relax_next_roads(
    road_cost: jnp.ndarray,       # float32[R]
    inter_out_road: jnp.ndarray,  # int32[I, K]
    inter_out_ok: jnp.ndarray,    # bool[I, K]
    road_to: jnp.ndarray,         # int32[R]
    dist0: jnp.ndarray,           # float32[I, D] — ALREADY ANCHORED
    max_iters: int,
    buckets=None,                 # primal_delta_buckets 4-tuple (or None)
    epi_tables=None,              # epilogue_slot_tables triple (or None)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``(relaxed dist[I, D], next_road[I, D])`` in one pass.

    On TPU with delta buckets this is ONE kernel launch — the capped
    relaxation plus the next-road argmin on the still-resident tile
    (:func:`_multisweep_nr_kernel_body`); ``primal_next_roads``'s K row
    gathers over the finished 67 MB table (~2-4 ms of the Grid64 refresh)
    disappear.  Falls back to the two-step gather path (bitwise-identical
    results) everywhere else.  ``dist0`` must already carry its anchor
    rows (the caller's eye/dest-list zeros), unlike
    :func:`primal_all_pairs_dist` which anchors internally.
    """
    i_n = inter_out_road.shape[0]
    if max_iters is None:
        max_iters = i_n - 1
    have_buckets = (buckets is not None and buckets[0] is not None
                    and epi_tables is not None)
    nr_tile = (_multisweep_nr_tile(i_n, len(buckets[0]), max_iters)
               if have_buckets else None)
    rb_plan = None
    if nr_tile is None and have_buckets and \
            os.environ.get("TARL_MULTISWEEP_NR", "1") == "1":
        # Full-resident form declined (source axis outgrows the scoped
        # VMEM stack): try the row-blocked window form (_rowblock_plan).
        rb_plan = _rowblock_plan(i_n, buckets[0], max_iters,
                                 extra_cols=8, extra_w=3,
                                 d_cols=dist0.shape[1])
    if nr_tile is not None or rb_plan is not None:
        deltas, _, perm, inv = buckets
        out_r_p, ok_p, b_slot_p = epi_tables
        b_n = len(deltas)
        b_pad = _round_up_lane(b_n)
        w_cols, road_cols, slot_cols = _epilogue_rep_tables(
            road_cost, out_r_p, ok_p, b_slot_p, b_pad
        )
        d = dist0.shape[1]
        tile_d = nr_tile if nr_tile is not None else rb_plan[2]
        # Pad to a multiple of the COLUMN TILE, not just the 128 lane: the
        # grid is d_p // tile_d, so a lane-only pad would leave the last
        # partial tile unprocessed (and d_p < tile_d would launch nothing).
        d_p = _round_up(d, tile_d)
        dist_p = dist0 if perm is None else dist0[perm]
        if d_p != d:
            dist_p = jnp.pad(dist_p, ((0, 0), (0, d_p - d)),
                             constant_values=BIG)
        if nr_tile is not None:
            shifts = tuple((i_n - int(dd)) % i_n for dd in deltas)
            dist_o, road_o = _multisweep_nr_pallas(
                dist_p, w_cols, road_cols, slot_cols, shifts, max_iters,
                tile_d
            )
        else:
            dist_o, road_o = _multisweep_nr_pallas_rowblock(
                dist_p, w_cols, road_cols, slot_cols, deltas, max_iters,
                rb_plan
            )
        dist_o = dist_o[:, :d]
        road_o = road_o[:, :d]
        if inv is not None:
            dist_o = dist_o[inv]
            road_o = road_o[inv]
        return dist_o, road_o

    dist = _primal_relax(dist0, road_cost, inter_out_road, inter_out_ok,
                         road_to, max_iters, buckets=buckets)
    road = primal_next_roads(dist, road_cost, inter_out_road, inter_out_ok,
                             road_to)
    return dist, road


def _multisweep_pallas(dist, w_cols, shifts: tuple, num_sweeps: int,
                       tile_d: int):
    """dist [I, Dp] -> ``num_sweeps`` relaxation sweeps in ONE kernel launch
    (see _multisweep_kernel_body)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i_n, d_p = dist.shape
    b_pad = w_cols.shape[1]
    return pl.pallas_call(
        partial(_multisweep_kernel_body, shifts=shifts,
                num_sweeps=num_sweeps),
        grid=(d_p // tile_d,),
        in_specs=[
            pl.BlockSpec((i_n, b_pad), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((i_n, tile_d), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((i_n, tile_d), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((i_n, d_p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_multisweep_vmem()
        ),
    )(w_cols, dist)


def _sweep_pallas(dist, w_cols, delta_arr, num_deltas: int, tile_d: int):
    """dist [I, Dp] -> one relaxation sweep (see _sweep_kernel_body)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i_n, d_p = dist.shape
    b_pad = w_cols.shape[1]
    return pl.pallas_call(
        partial(_sweep_kernel_body, num_deltas=num_deltas),
        grid=(d_p // tile_d,),
        in_specs=[
            pl.BlockSpec((1, delta_arr.shape[1]), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((i_n, b_pad), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((i_n, tile_d), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((i_n, tile_d), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((i_n, d_p), jnp.float32),
        # Resident tile + w columns + the rotate temporary sit a few MB over
        # the conservative 16 MB default scoped-VMEM limit at I=4096.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SWEEP_VMEM_BYTES
        ),
    )(delta_arr, w_cols, dist)


# VMEM gate for the Pallas sweep: resident tile + output tile + rotate
# temporary + w columns, with headroom (v5e VMEM is far above the 16 MB
# default scoped limit; CompilerParams raises it to this budget).
# Column-tile width: on-chip sweep at the official sp workload
# (Grid64x64/200k congested refresh, scripts/tune_sweep_tile.py):
# 128 -> 6.75 ms/refresh, 256 -> 6.16 ms, 512 -> scoped-VMEM OOM at
# I=4096 (the [I, I] next-road scratch outgrows the 100 MB stack limit).
_SWEEP_TILE_D = 256
_SWEEP_VMEM_BYTES = 40 * 1024 * 1024


def _sweep_tile_d() -> int:
    """Column-tile width of the multisweep kernels (TARL_SWEEP_TILE_D).
    Read at trace time so on-chip A/B tuning needs no code edit.  The env
    value is rounded UP to a multiple of 128: a non-lane-aligned BlockSpec
    width fails Mosaic lowering with an opaque error."""
    import os

    raw = int(os.environ.get("TARL_SWEEP_TILE_D", str(_SWEEP_TILE_D)))
    return max(128, _round_up(raw, 128))


def _pallas_sweep_ok(i_n: int, num_deltas: int) -> bool:
    """Opt-in (TARL_PALLAS_SWEEP=1): measured on the v5e chip the tiled
    kernel runs ~2x SLOWER than the gather sweep at Grid64x64 (30 vs 14 ms
    per 8-sweep refresh) — the dynamic sublane rotates and masked w-column
    selects are VPU-bound and outweigh the single-HBM-read advantage.  Kept
    as the re-owned native formulation and a tuning base (static-shift
    specialization is the known next step); bitwise-equal to the gather
    sweep, verified on hardware."""
    import os

    if os.environ.get("TARL_PALLAS_SWEEP", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if i_n % 8 != 0:  # sublane alignment; rolls assume unpadded rows
        return False
    need = 5 * 4 * i_n * _sweep_tile_d() \
        + 4 * i_n * _round_up_lane(num_deltas)
    return need <= _SWEEP_VMEM_BYTES


def _round_up_lane(x: int) -> int:
    return ((x + 127) // 128) * 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# The unrolled static-shift sweep materializes one rotated temporary per
# delta bucket (Mosaic does not collapse their live ranges), so the scoped
# budget scales with num_deltas; v5e VMEM is 128 MB.
# TARL_MULTISWEEP_VMEM_MB overrides (on-chip headroom experiments).
_MULTISWEEP_VMEM_BYTES = 100 * 1024 * 1024


def _multisweep_vmem() -> int:
    import os

    mb = os.environ.get("TARL_MULTISWEEP_VMEM_MB")
    return int(mb) * 1024 * 1024 if mb else _MULTISWEEP_VMEM_BYTES


def _multisweep_tile(i_n: int, num_deltas: int, iters: int,
                     extra_cols: int = 4, extra_w: int = 1) -> int | None:
    """Widest viable column tile for the static-shift multi-sweep kernel, or
    None (gate declined — gather fallback).  TARL_MULTISWEEP=0 opts out;
    requires a bounded static sweep count (refresh caps; the uncapped
    diameter-bound init keeps the early-exiting gather loop) and sublane
    alignment of the source axis.  Tries the TARL_SWEEP_TILE_D override
    first, then 256 (the measured Grid64 winner), then the minimum lane
    width 128 — bucket-rich irregular networks (the radial metro's 20
    offsets) only fit the scoped-VMEM stack at 128."""
    import os

    if os.environ.get("TARL_MULTISWEEP", "1") != "1":
        return None
    if jax.default_backend() != "tpu":
        return None
    if iters > 16 or i_n % 8 != 0:
        return None
    cap = _multisweep_vmem()
    tiles = [256, 128]
    if os.environ.get("TARL_SWEEP_TILE_D"):
        tiles.insert(0, _sweep_tile_d())
    for tile in tiles:
        # (num_deltas + extra) column tiles (in/out/carry + per-delta
        # rotates [+ epilogue]) + the w (and rep) columns.
        need = (num_deltas + extra_cols) * 4 * i_n * tile \
            + extra_w * 4 * i_n * _round_up_lane(num_deltas)
        if need <= cap:
            return tile
    return None


def _multisweep_ok(i_n: int, num_deltas: int, iters: int) -> bool:
    return _multisweep_tile(i_n, num_deltas, iters) is not None


def _rowblock_plan(i_n: int, deltas, iters: int, extra_cols: int = 4,
                   extra_w: int = 1, d_cols: int | None = None
                   ) -> tuple | None:
    """Row-blocked multisweep plan ``(B, h, tile)`` or None.

    When the full-resident kernel's VMEM gate declines (the source axis
    alone outgrows the scoped stack — Grid256: I=65k needs 134 MB), the
    sweep can still run as ONE kernel launch per (row block, column tile)
    by windowing the source axis with a halo of ``h = (iters + 1) *
    max_cyclic_offset`` rows: min-plus contamination from the window
    edges (wrapped pltpu.roll garbage) advances at most ``max_offset``
    rows per sweep, so the interior B rows stay bitwise-exact for all
    ``iters`` sweeps plus the next-road epilogue (the +1).  Early exit
    stays exact: a window fixpoint pins the interior to the global
    fixpoint values (clean-zone induction).  Requires I % B == 0 — padded
    rows would break the cyclic offsets.
    """
    if os.environ.get("TARL_MULTISWEEP_ROWBLOCK", "1") != "1":
        return None
    if jax.default_backend() != "tpu":
        return None
    if iters > 16 or i_n % 8 != 0:
        return None
    d_eff = [int(d) if int(d) <= i_n // 2 else int(d) - i_n for d in deltas]
    max_d = max(abs(d) for d in d_eff) if d_eff else 0
    if max_d == 0:
        return None
    h = _round_up((iters + 1) * max_d, 8)
    # The estimate counts the full [I, Dp] kernel outputs: XLA's memory
    # assigner keeps them resident in the scoped VMEM stack on top of the
    # kernel's working set (measured on chip at Grid128/1M zoned: the
    # block=8192 plan estimated 80 MB of tiles but compiled to a 109 MB
    # scope and failed the 100 MB limit — and granting a larger limit just
    # made Mosaic schedule a larger scope).  With the output counted, that
    # shape correctly steps down to block=4096 (fits); Grid256 correctly
    # declines to the XLA roll-sweep fallback.  8 MB safety margin.
    cap = _multisweep_vmem() - 8 * 1024 * 1024
    b_pad = _round_up_lane(len(deltas))
    for block in (8192, 16384, 4096):
        if i_n % block != 0 or i_n // block < 2 or h > block // 2:
            continue
        w = block + 2 * h
        for tile in (256, 128):
            need = (len(deltas) + extra_cols) * 4 * w * tile \
                + extra_w * 4 * w * b_pad
            if d_cols is not None:
                need += 4 * i_n * _round_up(d_cols, tile)
            if need <= cap:
                return block, h, tile
    return None


def _row_windows(x, block: int, h: int):
    """[I, C] -> [I // block, block + 2h, C] overlapping cyclic windows
    (static concat of slices — no gathers)."""
    i_n = x.shape[0]
    padded = jnp.concatenate([x[i_n - h:], x, x[:h]], axis=0)
    nb = i_n // block
    return jnp.stack(
        [jax.lax.dynamic_slice_in_dim(padded, b * block, block + 2 * h, 0)
         for b in range(nb)], axis=0
    )


def _primal_relax(dist0, road_cost, inter_out_road, inter_out_ok, road_to,
                  iters, buckets=None):
    i_n = inter_out_road.shape[0]

    # Row permutation (primal_delta_buckets coordinate order): the bucketed
    # sweeps run in permuted row space — permute in, sweep, permute back.
    # Two contiguous row copies bracketing the refresh, in exchange for a
    # several-fold smaller distinct-offset count (the multisweep kernel's
    # VPU work is linear in it).  Results are bitwise-identical: every
    # min-plus term pairs the same floats whatever the row labels.
    perm = inv = None
    if buckets is not None:
        if len(buckets) == 4:
            shifts_b, slot_b, perm, inv = buckets
        else:  # legacy (deltas, slot) pairs
            shifts_b, slot_b = buckets
        # An all-None tuple (primal_delta_buckets declined: too many
        # distinct offsets, e.g. the radial metro) means NO bucketing.
        buckets = None if shifts_b is None else (shifts_b, slot_b)

    ms_tile = (
        _multisweep_tile(i_n, len(buckets[0]), iters)
        if buckets is not None else None
    )
    if ms_tile is None and buckets is not None and \
            os.environ.get("TARL_MULTISWEEP", "1") == "1":
        rb = _rowblock_plan(i_n, buckets[0], iters, d_cols=dist0.shape[1])
        if rb is not None:
            deltas, slot_of_road = buckets
            if perm is not None:
                dist0 = dist0[perm]
            b_n = len(deltas)
            b_pad = _round_up_lane(b_n)
            w_flat = jnp.full((b_n * i_n + 1,), BIG).at[slot_of_road].min(
                road_cost
            )[: b_n * i_n]
            w_cols = jnp.full((i_n, b_pad), BIG).at[:, :b_n].set(
                w_flat.reshape(b_n, i_n).T
            )
            d = dist0.shape[1]
            d_p = _round_up(d, rb[2])
            dist_p = (dist0 if d_p == d
                      else jnp.pad(dist0, ((0, 0), (0, d_p - d)),
                                   constant_values=BIG))
            dist_p = _multisweep_pallas_rowblock(dist_p, w_cols, deltas,
                                                 iters, rb)
            out = dist_p[:, :d]
            return out if inv is None else out[inv]
    if ms_tile is not None:
        # Static-shift multi-sweep kernel: the whole capped refresh is ONE
        # kernel launch reading and writing the table once (see
        # _multisweep_kernel_body).  Outcome-identical to the early-exiting
        # gather while_loop (idempotent relaxation, same cap).
        deltas, slot_of_road = buckets
        if perm is not None:
            dist0 = dist0[perm]
        b_n = len(deltas)
        b_pad = _round_up_lane(b_n)
        w_flat = jnp.full((b_n * i_n + 1,), BIG).at[slot_of_road].min(
            road_cost
        )[: b_n * i_n]
        w_cols = jnp.full((i_n, b_pad), BIG).at[:, :b_n].set(
            w_flat.reshape(b_n, i_n).T
        )
        d = dist0.shape[1]
        tile_d = ms_tile
        # Tile-multiple pad (not lane-only): grid = d_p // tile_d.
        d_p = _round_up(d, tile_d)
        dist_p = (dist0 if d_p == d
                  else jnp.pad(dist0, ((0, 0), (0, d_p - d)),
                               constant_values=BIG))
        shifts = tuple((i_n - int(dd)) % i_n for dd in deltas)
        dist_p = _multisweep_pallas(dist_p, w_cols, shifts, iters,
                                    tile_d)
        out = dist_p[:, :d]
        return out if inv is None else out[inv]

    if buckets is not None and _pallas_sweep_ok(i_n, len(buckets[0])):
        # Pallas tiled sweep: pad destination columns to the lane tile; the
        # BIG-padded columns relax independently and are sliced off.
        deltas, slot_of_road = buckets
        if perm is not None:
            dist0 = dist0[perm]
        b_n = len(deltas)
        b_pad = _round_up_lane(b_n)
        w_flat = jnp.full((b_n * i_n + 1,), BIG).at[slot_of_road].min(
            road_cost
        )[: b_n * i_n]
        # Transposed [I, B_pad] so each row's weights broadcast over lanes.
        w_cols = jnp.full((i_n, b_pad), BIG).at[:, :b_n].set(
            w_flat.reshape(b_n, i_n).T
        )
        d = dist0.shape[1]
        tile_d = _sweep_tile_d()
        # Tile-multiple pad (not lane-only): grid = d_p // tile_d.
        d_p = _round_up(d, tile_d)
        dist_p = (dist0 if d_p == d
                  else jnp.pad(dist0, ((0, 0), (0, d_p - d)),
                               constant_values=BIG))

        def cond(carry):
            i, dist, changed = carry
            return changed & (i < iters)

        delta_arr = jnp.asarray(
            [(i_n - d) % i_n for d in deltas]
            + [0] * (_round_up_lane(b_n) - b_n),
            jnp.int32,
        )[None, :]

        def body(carry):
            i, dist, _ = carry
            new = _sweep_pallas(dist, w_cols, delta_arr, b_n, tile_d)
            return i + 1, new, jnp.any(new < dist)

        _, dist_p, _ = jax.lax.while_loop(
            cond, body, (0, dist_p, jnp.bool_(True))
        )
        out = dist_p[:, :d]
        return out if inv is None else out[inv]

    if buckets is not None and jax.default_backend() == "tpu" and \
            not _pallas_sweep_ok(i_n, len(buckets[0])):
        # Fallback choice when the multisweep kernel's VMEM gate declined
        # (e.g. Grid256: I=65k needs a 134 MB resident stack).  Measured on
        # the v5e at Grid64 ALL-PAIRS (D = I = 4096): both delta
        # formulations lose to the gather sweep (XLA rolls re-read HBM per
        # delta: 38 vs 14 ms per 8-sweep refresh; the dynamic-shift Pallas
        # kernel is VPU-bound: 30 ms).  But on NARROW zoned tables the
        # rolls WIN in production — Grid256/2M zoned sp full run 7.42 ->
        # 6.79 ms/tick (the roll sweeps pipeline with the rest of the
        # refresh where the serial gather emitter cannot), even though the
        # standalone refresh times ~flat (28.8 vs 29.6 ms).  Default: rolls
        # for D <= 1024 columns, gather otherwise; TARL_XLA_ROLL_SWEEP=1/0
        # forces.
        env = os.environ.get("TARL_XLA_ROLL_SWEEP")
        use_rolls = (env == "1" if env in ("0", "1")
                     else dist0.shape[1] <= 1024)
        if not use_rolls:
            buckets = None

    if buckets is not None:
        # Delta-bucketed sweep: one jnp.roll per distinct index offset
        # instead of per-slot row gathers (the CPU/semantics path), or the
        # opt-in Pallas kernel below.  Bitwise-equal to the gather sweep:
        # min is exact, the per-edge sums w + dist pair identically, and
        # ties resolve to the same value whatever the reduction order.
        deltas, slot_of_road = buckets
        if perm is not None:
            dist0 = dist0[perm]
        b_n = len(deltas)
        w_tab = jnp.full((b_n * i_n + 1,), BIG).at[slot_of_road].min(
            road_cost
        )[: b_n * i_n].reshape(b_n, i_n)

        def sweep(dist):
            new = dist
            for b, d in enumerate(deltas):
                new = jnp.minimum(
                    new, w_tab[b][:, None] + jnp.roll(dist, -d, axis=0)
                )
            return new
    else:
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
    return dist if (buckets is None or inv is None) else dist[inv]


@jax.jit
def primal_next_roads(
    dist: jnp.ndarray,            # float32[I, D] primal distances
    road_cost: jnp.ndarray,       # float32[R]
    inter_out_road: jnp.ndarray,  # int32[I, K]
    inter_out_ok: jnp.ndarray,    # bool[I, K]
    road_to: jnp.ndarray,         # int32[R]
) -> jnp.ndarray:
    """Materialize the best outgoing ROAD per (intersection, dest column):
    float32[I, D] road ids (-1.0 = unreachable).

    ``next_road[i, d] = argmin over out-slots k of cost[out_r[i, k]] +
    dist[road_to[out_r[i, k]], d]`` with the ascending-slot strict-< loop —
    outcome-identical to the per-lookup ``jnp.argmin`` the policies used to
    run every tick (first minimal slot wins ties, same float sums).

    Computed ONCE per congested refresh so the per-tick lookup degrades to a
    single element gather (``tab[from_inter, dest]``) instead of three
    unsorted [R, K] gathers through XLA:TPU's ~7 ns/element serial emitter —
    the measured per-tick bottleneck of congested shortest-path routing
    (docs/BENCH.md).  The K slot passes here are contiguous row gathers at
    refresh cadence, amortized over ``RoutingConfig.refresh_rate`` ticks.

    Road ids are exact in float32 (< 2^24), so the table packs into the flat
    float32 routing scratch (state.next_hop) next to dist and cost.
    """
    k_n = inter_out_road.shape[1]
    w = jnp.where(inter_out_ok, road_cost[inter_out_road], BIG)  # [I, K]
    succ = road_to[inter_out_road]                               # [I, K]
    best = jnp.full(dist.shape, BIG, jnp.float32)
    road = jnp.full(dist.shape, -1.0, jnp.float32)
    for k in range(k_n):
        cand = w[:, k][:, None] + dist[succ[:, k]]
        take = cand < best
        best = jnp.where(take, cand, best)
        road = jnp.where(
            take, inter_out_road[:, k].astype(jnp.float32)[:, None], road
        )
    return jnp.where(best < BIG, road, -1.0)


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
