"""Static road-network representation (the dual graph).

The reference represents the network as a PyG ``Data`` holding a packed node
matrix, dense adjacency, and edge lists (transportation_simulator.py:61-224):
nodes = road links, edges = allowed turns, plus one virtual SRC/DEST node pair
per intersection appended after the roads (README.md:14,
transportation_simulator.py:139-147).

The TPU build keeps the same graph *convention* (node ordering, SRC/DEST
indices, edge construction) but as typed arrays with static metadata, and
replaces the reference's two dense O(N^2) structures with scalable forms:

* ``adj_matrix[road, dest]`` used by withdraw (agents/base.py:361) collapses to
  ``road_dest[R]`` — every road has exactly one outgoing DEST edge
  (transportation_simulator.py:186-190), so the check is an equality.
* the normalized ``src_adj`` used by random choice (agents/base.py:469-476)
  becomes segment sampling over the SRC->road edge list.

A dense boolean adjacency is still derivable via :meth:`Network.dense_adjacency`
for parity tests and small-scenario tooling.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from .config import PhysicsConfig, DEFAULT_PHYSICS


@struct.dataclass
class Network:
    """Immutable dual-graph network. Shapes: R roads, I intersections,
    N = R + 2*I nodes, E turn edges, Ef full edges, Ec choice edges."""

    # --- static metadata (not traced) ---
    num_roads: int = struct.field(pytree_node=False)
    num_intersections: int = struct.field(pytree_node=False)
    nmax: int = struct.field(pytree_node=False)

    # --- per-road attributes (transportation_simulator.py:109-137) ---
    capacity: jnp.ndarray             # float32[R] — MAX_NUMBER_OF_AGENT
    free_flow: jnp.ndarray            # float32[R] — free-flow travel time (s)
    length: jnp.ndarray               # float32[R] — metres
    max_flow: jnp.ndarray             # float32[R] — capacity (veh/h)
    critical_number: jnp.ndarray      # float32[R] — cap*fftt/3600 (ts.py:207)
    congestion_constant: jnp.ndarray  # float32[R] — fftt*(Nmax_r+10-critical) (ts.py:208-210)
    road_dest: jnp.ndarray            # int32[R] — DEST node of the road's "to" intersection

    # --- turn edges: road -> road (edge_index_routes, ts.py:149-171) ---
    edge_src: jnp.ndarray             # int32[E]
    edge_dst: jnp.ndarray             # int32[E]
    edge_attr: jnp.ndarray            # float32[E] — capacity-share weights

    # --- full edges incl. SRC->road / road->DEST (ts.py:173-193) ---
    full_src: jnp.ndarray             # int32[Ef]
    full_dst: jnp.ndarray             # int32[Ef]
    full_attr: jnp.ndarray            # float32[Ef] — 0.0 on virtual edges

    # --- choice edges: full edges whose destination is a road; the domain of
    # route choice for both road nodes and SRC nodes (agents/base.py:446-494) ---
    choice_src: jnp.ndarray           # int32[Ec] — road or SRC node index
    choice_dst: jnp.ndarray           # int32[Ec] — road index

    # --- padded out-neighbor table over the full edge list: road networks
    # have tiny max out-degree, so the all-pairs relaxation gathers over a
    # dense [N, D] table instead of segment-reducing the edge list
    # (routing.bellman_ford) ---
    nbr: jnp.ndarray                  # int32[N, D] — neighbor node (self-padded)
    nbr_ok: jnp.ndarray               # bool[N, D] — valid-slot mask

    # --- primal (intersection) graph: the scalable routing backend works on
    # intersections (I of them) instead of dual nodes (R + 2I), shrinking the
    # all-pairs tables from O(N^2) to O(I^2) (routing.bellman_ford.primal_*).
    # Slot order of ``inter_out_road`` matches the dual nbr/turn-edge order
    # (increasing road index) so tie-breaks agree between backends. ---
    road_to: jnp.ndarray              # int32[R] — intersection ordinal at the road's head
    inter_out_road: jnp.ndarray       # int32[I, K] — outgoing roads per intersection (0-padded)
    inter_out_ok: jnp.ndarray         # bool[I, K] — valid-slot mask

    # --- slot-major turn-edge tables for the gather-light core
    # (core.direction / core.response): slot k of road v is its k-th incoming
    # (resp. outgoing) turn edge, slot order = increasing edge id (matching
    # segment-op tie-breaks).  Everything per-edge the core needs is
    # precomputed per slot as an [R]-row, because on TPU a gather is only
    # fast when its indices are (near-)sorted — XLA's general emitter runs
    # serially at ~7 ns/element, and an unsorted [R]-from-[E] gather costs
    # more than the rest of the tick (measured, scripts/microbench_*.py /
    # scripts/ablate_sample_micro.py).  With these tables the only runtime
    # gathers left are [R]-from-[R] with spatially-banded road indices. ---
    in_edge_ok: jnp.ndarray           # bool[KIN, R] — road R's k-th in-edge exists
    in_src_tab: jnp.ndarray           # int32[KIN, R] — that edge's source road (0-padded)
    in_logit_tab: jnp.ndarray         # float32[KIN, R] — log(edge_attr); -inf on padding
    out_edge_ok: jnp.ndarray          # bool[KOUT, R]
    out_dst_tab: jnp.ndarray          # int32[KOUT, R] — k-th out-edge's target road
    # Same for route choice: per node (roads + SRC), its candidate next roads
    # (edges whose destination is a road, agents/base.py:446-494).
    choice_ok: jnp.ndarray            # bool[KC, N]
    choice_dst_tab: jnp.ndarray       # int32[KC, N] — k-th choice edge's road

    # --- intersection coordinates (MATSim node x/y; zeros when the source
    # had none).  Used host-side only: routing.bellman_ford.
    # primal_delta_buckets derives a locality-preserving row order from them
    # so the roll-based sweep needs few distinct index offsets (the
    # reference's sorted-id-string ordinals scramble grid rows). ---
    inter_x: jnp.ndarray = None       # float32[I]
    inter_y: jnp.ndarray = None       # float32[I]

    # --- roll plan for the in-slot gather (core.roll_gather): at metro scale
    # the direction step's one remaining gather (``pack[in_src_tab]``) hits
    # XLA's serial emitter; road networks have few distinct ``src - dst``
    # offsets, so the gather is evaluated as per-offset rolls instead.
    # ``in_roll_shift.shape == (0,)`` means declined (small R / irregular
    # topology) and the direct gather is used.  Derived from in_src_tab at
    # build time; no independent semantics. ---
    in_roll_shift: jnp.ndarray = None    # int32[B] — global mod-R offsets
    in_roll_sel: jnp.ndarray = None      # int32[KIN, R] — bucket id (B = exception)
    in_roll_exc_src: jnp.ndarray = None  # int32[E] — exception source roads
    in_roll_exc_k: jnp.ndarray = None    # int32[E]
    in_roll_exc_v: jnp.ndarray = None    # int32[E]
    # Same plan over out_dst_tab: core.response.confirm_step replaces its
    # [R]-index pop scatter with rolled out-slot compares at metro scale.
    out_roll_shift: jnp.ndarray = None   # int32[B]
    out_roll_sel: jnp.ndarray = None     # int32[KOUT, R]
    out_roll_exc_src: jnp.ndarray = None # int32[E]
    out_roll_exc_k: jnp.ndarray = None   # int32[E]
    out_roll_exc_v: jnp.ndarray = None   # int32[E]
    # STATIC mirrors of the roll-plan shifts (python int tuples, not traced):
    # the fused winner kernel (core.fused_winner) bakes each offset into the
    # kernel as a compile-time lane rotation — a dynamic-shift roll was the
    # measured VPU bottleneck of the first sweep kernel
    # (routing.bellman_ford._sweep_kernel_body).  Same values as
    # in_roll_shift / out_roll_shift; () == no plan.
    in_roll_shift_t: tuple = struct.field(pytree_node=False, default=())
    out_roll_shift_t: tuple = struct.field(pytree_node=False, default=())

    # --- roll-friendly road renumbering (build_network): road index ->
    # ORIGINAL input (XML link-list) position.  Identity unless the input
    # ordering made the roll plan decline AND a searched locality order
    # (coordinate/polar intersection rank, tail-major road sort) fixed it —
    # bucket structure is a function of road NUMBERING, not topology (the
    # r3 coordinate-permute result).  Inside the simulator road ids are the
    # renumbered ones everywhere (self-consistent); map outputs back to XML
    # link order with this array at the boundary if needed. ---
    road_order: jnp.ndarray = None     # int32[R]
    # True iff ``road_order`` is a non-identity permutation.  Static so the
    # Gumbel draw sites (core.rng) can pick the canonical-addressed stream at
    # trace time; when True, every slot table's within-column order is
    # canonical (see the renumbering block in :func:`build_network`), making
    # renumbered episodes trace-identical to identity-numbered ones.
    renumbered: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_nodes(self) -> int:
        return self.num_roads + 2 * self.num_intersections

    @property
    def num_turn_edges(self) -> int:
        return int(self.edge_src.shape[0])

    @property
    def num_full_edges(self) -> int:
        return int(self.full_src.shape[0])

    def src_node_indices(self) -> jnp.ndarray:
        """Global indices of SRC nodes (ts.py:143: ``num_roads + 2*k``)."""
        return self.num_roads + 2 * jnp.arange(self.num_intersections, dtype=jnp.int32)

    def dest_node_indices(self) -> jnp.ndarray:
        return self.num_roads + 2 * jnp.arange(self.num_intersections, dtype=jnp.int32) + 1

    def dense_adjacency(self) -> jnp.ndarray:
        """Dense bool[N, N] adjacency over the full edge list
        (ts.py:196-198). For parity tests / small scenarios only."""
        n = self.num_nodes
        adj = jnp.zeros((n, n), dtype=bool)
        return adj.at[self.full_src, self.full_dst].set(True)

    def entry_cost(self) -> jnp.ndarray:
        """Free-flow cost of *entering* each node: ``fftt`` for roads, 0 for
        SRC/DEST (the MSA edge-weight convention, user_equilibrium_msa.py:111-120)."""
        n = self.num_nodes
        cost = jnp.zeros((n,), dtype=jnp.float32)
        return cost.at[: self.num_roads].set(self.free_flow)


def _turn_edge_pairs(from_inter, to_inter, num_intersections):
    """All turn-edge (u, v) road pairs (head(u) == tail(v)) as two int64
    arrays, vectorized and independent of road numbering."""
    R = from_inter.shape[0]
    order_by_tail = np.argsort(from_inter, kind="stable")
    cnt_out = np.bincount(from_inter, minlength=num_intersections)
    starts = np.concatenate([[0], np.cumsum(cnt_out)])[:-1]
    deg = cnt_out[to_inter]                       # per-u downstream count
    e_u = np.repeat(np.arange(R, dtype=np.int64), deg)
    run_start = np.cumsum(deg) - deg
    within = np.arange(int(deg.sum()), dtype=np.int64) - np.repeat(
        run_start, deg
    )
    e_v = order_by_tail[np.repeat(starts[to_inter], deg) + within]
    return e_u, e_v


def _order_exceptions(pos, e_u, e_v, num_roads, max_buckets, floor):
    """Exception count a roll plan would pay under road order ``pos``
    (pos[original_road] = new index) — build_roll_plan's accounting
    evaluated on the raw turn-edge pairs."""
    off = (pos[e_u] - pos[e_v]) % num_roads
    _, cnts = np.unique(off, return_counts=True)
    cnts = np.sort(cnts)[::-1][:max_buckets]
    cnts = cnts[cnts >= floor]
    return int(off.size - cnts.sum())


def polar_rank(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Rank nodes by (radius group, angle) around the centroid — the order
    that linearizes ring-and-spoke layouts.  Radius groups are formed by
    splitting the sorted radii at gaps larger than 0.1 % of the radial
    range: ring radii carry FP/XML-round-trip noise (~1e-4) that a naive
    quantization splinters into hundreds of pseudo-rings, while true
    inter-ring gaps are macroscopic.  Degenerates gracefully on
    continuous-radius layouts (few giant groups ordered by angle) — such an
    order simply loses the downstream quality competition."""
    cx, cy = x.mean(), y.mean()
    r = np.hypot(x - cx, y - cy)
    th = np.arctan2(y - cy, x - cx)
    rs = np.sort(r)
    thresh = max((rs[-1] - rs[0]) * 1e-3, 1e-9)
    # Group boundaries: radii where the sorted sequence jumps by > thresh.
    jump = np.nonzero(np.diff(rs) > thresh)[0]
    bounds = rs[jump] + np.diff(rs)[jump] / 2
    rq = np.searchsorted(bounds, r)
    key = np.lexsort((th, rq))
    rank = np.empty(x.shape[0], np.int64)
    rank[key] = np.arange(x.shape[0])
    return rank


def hilbert_rank(x: np.ndarray, y: np.ndarray, order: int = 10) -> np.ndarray:
    """Rank nodes by their position on a Hilbert space-filling curve over
    the coordinate bounding box (2^order x 2^order cells).  The
    general-purpose locality rank for IRREGULAR (real-city) layouts: any
    two nodes close on the curve are close in the plane, so tail-major
    road orders derived from it concentrate turn-edge offsets without
    assuming grid- or ring-like structure.  Vectorized xy2d (the classic
    bit-interleave walk, top bit down, with the standard quadrant
    rotation/reflection)."""
    n = 1 << order
    span_x = max(float(np.ptp(x)), 1e-12)
    span_y = max(float(np.ptp(y)), 1e-12)
    xi = np.minimum(
        ((x - x.min()) / span_x * n).astype(np.int64), n - 1
    )
    yi = np.minimum(
        ((y - y.min()) / span_y * n).astype(np.int64), n - 1
    )
    rx = np.zeros_like(xi)
    ry = np.zeros_like(yi)
    d = np.zeros_like(xi)
    s = n >> 1
    while s > 0:
        rx = ((xi & s) > 0).astype(np.int64)
        ry = ((yi & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant: where ry == 0, swap x/y (reflecting when rx == 1)
        flip = ry == 0
        xr = np.where(flip & (rx == 1), s - 1 - xi, xi)
        yr = np.where(flip & (rx == 1), s - 1 - yi, yi)
        xi = np.where(flip, yr, xi)
        yi = np.where(flip, xr, yi)
        s >>= 1
    key = np.lexsort((np.arange(x.shape[0]), d))
    rank = np.empty(x.shape[0], np.int64)
    rank[key] = np.arange(x.shape[0])
    return rank


def rcm_rank(
    from_inter: np.ndarray, to_inter: np.ndarray, num_intersections: int
) -> np.ndarray | None:
    """Reverse-Cuthill-McKee rank over the intersection adjacency — the
    coordinate-free fallback locality order (bandwidth-minimizing BFS),
    for networks whose XML carries no usable coordinates.  Host-side scipy
    (same dependency as the free-flow routing init); returns None when
    scipy is unavailable."""
    try:
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import reverse_cuthill_mckee
    except Exception:  # pragma: no cover - scipy is in the image
        return None
    i = np.concatenate([from_inter, to_inter]).astype(np.int64)
    j = np.concatenate([to_inter, from_inter]).astype(np.int64)
    adj = coo_matrix(
        (np.ones(i.shape[0], np.int8), (i, j)),
        shape=(num_intersections, num_intersections),
    ).tocsr()
    perm = np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True))
    rank = np.empty(num_intersections, np.int64)
    rank[perm] = np.arange(num_intersections)
    return rank


def roll_friendly_road_order(
    from_inter: np.ndarray,
    to_inter: np.ndarray,
    num_intersections: int,
    inter_x: np.ndarray | None,
    inter_y: np.ndarray | None,
    *,
    max_buckets: int = 24,
    max_exc_frac: float = 0.05,
) -> np.ndarray | None:
    """Search a road renumbering that makes the roll plan viable.

    The roll evaluation (core.roll_gather) needs the turn-edge offsets
    ``(u - v) mod R`` to concentrate on a few values — a property of the
    road NUMBERING, not the topology (the r3 coordinate-permute result on
    the primal sweep: a 64x64 grid under sorted-id-string ordinals
    scrambles to 18 offsets, under lexsort(y, x) it has 4).  When the
    input order already yields a viable plan, returns ``None`` (grids stay
    bit-identical to previous builds).  Otherwise evaluates tail-major road
    orders ``lexsort(head-rank, tail-rank)`` derived from locality-
    preserving intersection ranks — coordinate lexsorts, a POLAR
    (radius-group, angle) rank that linearizes ring-and-spoke metros, a
    HILBERT space-filling-curve rank for irregular (real-city) layouts,
    and a coordinate-free reverse-Cuthill-McKee rank — and
    returns the first order whose exception tail fits the plan budget
    (``None`` if none does).  Pure evaluation strategy: the renumbered
    simulation equals the identity-numbered one TRACE-FOR-TRACE (same
    agent arrivals, same winner draws), because (a) the renumbered build
    keeps every slot table's within-column order CANONICAL — ascending-slot
    strict-> tie-breaks resolve to the same physical edge — and (b) the
    direction/choice Gumbel streams are addressed by canonical position
    (core.rng), making each draw a pure function of the physical edge.
    Pinned by tests/test_rng.py (arbitrary random permutation, both
    policies) and tests/test_renumber.py (the radial polar order).
    """
    import os

    if os.environ.get("TARL_NO_RENUMBER", "0") == "1":
        return None
    R = int(from_inter.shape[0])
    e_u, e_v = _turn_edge_pairs(from_inter, to_inter, num_intersections)
    floor = max(64, e_u.size // 512)
    from .core.roll_gather import roll_cost_budget

    # Dual acceptance, mirroring build_roll_plan: the fraction budget for
    # near-regular layouts, the measured cost model (with its half-coverage
    # floor) for irregular ones.
    budget = max(max_exc_frac * e_u.size,
                 min(roll_cost_budget(e_u.size, max_buckets),
                     e_u.size // 2))
    identity = np.arange(R, dtype=np.int64)
    id_exc = _order_exceptions(identity, e_u, e_v, R, max_buckets, floor)
    if id_exc <= max_exc_frac * e_u.size:
        # Input order already GRID-quality — change nothing.  (The early-out
        # deliberately uses the strict fraction budget, not the cost model:
        # a merely cost-viable identity order must not pre-empt the search —
        # the radial metro's identity order once passed the cost model at
        # 33 % coverage and silently lost the polar B=16 plan, regressing
        # the radial bench 1.8 -> 4.1 ms/tick.)
        return None

    ranks: list[np.ndarray] = []
    if inter_x is not None and inter_y is not None:
        x = np.asarray(inter_x, np.float64)
        y = np.asarray(inter_y, np.float64)
        if np.ptp(x) > 0 or np.ptp(y) > 0:
            for key in (
                np.lexsort((x, y)),       # row-major by y then x
                np.lexsort((y, x)),       # column-major
            ):
                rank = np.empty(num_intersections, np.int64)
                rank[key] = np.arange(num_intersections)
                ranks.append(rank)
            ranks.append(polar_rank(x, y))  # ring-major by angle
            ranks.append(hilbert_rank(x, y))  # general irregular layouts
    rcm = rcm_rank(from_inter, to_inter, num_intersections)
    if rcm is not None:
        ranks.append(rcm)  # coordinate-free fallback

    best = None
    best_exc = None
    for rank in ranks:
        order = np.lexsort(
            (np.arange(R), rank[to_inter], rank[from_inter])
        ).astype(np.int64)
        pos = np.empty(R, np.int64)
        pos[order] = np.arange(R)
        exc = _order_exceptions(pos, e_u, e_v, R, max_buckets, floor)
        if exc <= budget and (best_exc is None or exc < best_exc):
            best, best_exc = order, exc
    # Relabeling is free at runtime (pure relabeling, trace-identical), so
    # any meaningfully smaller exception tail is worth taking; the 0.9
    # margin only avoids churning the numbering for noise-level deltas
    # (plan cost is B·roll + exc·gather and B is comparable across
    # candidates, so exceptions are the cost proxy).
    if best is not None and best_exc > 0.9 * id_exc:
        best = None
    return best


def build_network(
    *,
    length: np.ndarray,
    max_flow: np.ndarray,
    free_speed: np.ndarray,
    perm_lanes: np.ndarray,
    from_inter: np.ndarray,   # int[R] — intersection ordinal of the link's tail
    to_inter: np.ndarray,     # int[R] — intersection ordinal of the link's head
    num_intersections: int,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    inter_x: np.ndarray | None = None,  # float[I] node coordinates (optional)
    inter_y: np.ndarray | None = None,
) -> Network:
    """Construct a :class:`Network` from raw per-link attributes.

    Mirrors the reference network builder (transportation_simulator.py:96-224):

    * per-road cell capacity ``int(length*lanes/cell_size) + 1`` (ts.py:122-124),
    * ``Nmax = max(capacity) + 1`` (ts.py:128),
    * turn edges between consecutive links with capacity-share weights
      normalized per upstream link (ts.py:149-171),
    * SRC->road and road->DEST edges with weight 0 (ts.py:173-193),
    * precomputed ``critical_number`` / ``congestion_constant`` (ts.py:207-210).

    Intersections must already be mapped to ordinals 0..I-1 in the order the
    reference uses (sorted id strings, ts.py:142); SRC node of intersection k
    is ``R + 2k``, DEST is ``R + 2k + 1``.
    """
    length = np.asarray(length, dtype=np.float64)
    max_flow = np.asarray(max_flow, dtype=np.float64)
    free_speed = np.asarray(free_speed, dtype=np.float64)
    perm_lanes = np.asarray(perm_lanes, dtype=np.float64)
    from_inter = np.asarray(from_inter, dtype=np.int64)
    to_inter = np.asarray(to_inter, dtype=np.int64)
    num_roads = int(length.shape[0])

    # Roll-friendly renumbering: engages ONLY when the input road order
    # makes the roll plan decline and a locality order fixes it (irregular
    # networks; grids keep their input order bit-identically).  The rest of
    # the build then simply sees the links "parsed in a different order" —
    # intersections, SRC/DEST node indices, and agents are untouched.
    road_order = np.arange(num_roads, dtype=np.int64)
    if num_roads >= 512:
        perm = roll_friendly_road_order(
            from_inter, to_inter, num_intersections, inter_x, inter_y
        )
        if perm is not None:
            road_order = perm
            length = length[perm]
            max_flow = max_flow[perm]
            free_speed = free_speed[perm]
            perm_lanes = perm_lanes[perm]
            from_inter = from_inter[perm]
            to_inter = to_inter[perm]

    free_flow = length / free_speed
    capacity = (length * perm_lanes / physics.effective_cell_size).astype(np.int64) + 1
    nmax = int(capacity.max()) + 1
    # core.direction.pack_upstream truncates free space (cap - count) to an
    # integer bit-field; its gridlock comparisons are only equivalent to the
    # unpacked semantics when capacity is integral.  Integral by construction
    # here — asserted so a future builder change fails loudly.
    assert np.issubdtype(capacity.dtype, np.integer)

    # Turn edges: link u -> link v iff head(u) == tail(v); weight is v's share
    # of the total outgoing capacity at that intersection (ts.py:153-168).
    outgoing: list[list[int]] = [[] for _ in range(num_intersections)]
    for i in range(num_roads):
        outgoing[from_inter[i]].append(i)

    # When renumbered, order every slot structure by CANONICAL (original
    # input) id instead of the new index: ascending-slot strict-> tie-breaks
    # (direction winner, random choice, next-road argmin) then resolve to
    # the same physical edge as in the identity-numbered build, and the
    # canonical stream position of in-slot (k, v) collapses to
    # ``k*R + road_order[v]`` (core.rng.direction_gumbel).  Identity builds
    # (grids) skip this — list order is already canonical — keeping every
    # existing baseline bit-for-bit.
    renumbered = not np.array_equal(road_order, np.arange(num_roads))
    if renumbered:
        canon = road_order
        for k in range(num_intersections):
            outgoing[k].sort(key=lambda r: canon[r])

    e_src, e_dst, e_w = [], [], []
    for u in range(num_roads):
        downs = outgoing[to_inter[u]]
        total = sum(max_flow[u] for _ in downs)  # cap of the *upstream* link
        # NB: the reference appends the upstream link's own capacity per edge
        # and normalizes by the group total (ts.py:160-168), which reduces to a
        # uniform 1/len(downs) share; computed explicitly to match exactly.
        for v in downs:
            e_src.append(u)
            e_dst.append(v)
            e_w.append(max_flow[u] / total if total > 0 else 1.0)

    # Full edges: turns + SRC(i)->road + road->DEST(j) (ts.py:173-193).
    f_src = list(e_src)
    f_dst = list(e_dst)
    f_w = list(e_w)
    for k in range(num_intersections):
        src_idx = num_roads + 2 * k
        for road in outgoing[k]:
            f_src.append(src_idx)
            f_dst.append(road)
            f_w.append(0.0)
    # each road has exactly one DEST edge: road -> DEST(to_inter[road])
    road_dest = np.empty(num_roads, dtype=np.int64)
    for road in range(num_roads):
        dest_idx = num_roads + 2 * to_inter[road] + 1
        road_dest[road] = dest_idx
        f_src.append(road)
        f_dst.append(dest_idx)
        f_w.append(0.0)

    critical = max_flow * free_flow / physics.seconds_per_hour
    congestion_constant = free_flow * (
        capacity + physics.congestion_softening - critical
    )

    e_src_np = np.asarray(e_src, dtype=np.int32)
    e_dst_np = np.asarray(e_dst, dtype=np.int32)
    f_src_np = np.asarray(f_src, dtype=np.int32)
    f_dst_np = np.asarray(f_dst, dtype=np.int32)
    choice_mask = f_dst_np < num_roads

    # Padded out-neighbor table (self-padded slots are masked invalid).
    num_nodes = num_roads + 2 * num_intersections
    degree = np.bincount(f_src_np, minlength=num_nodes)
    max_deg = max(int(degree.max()), 1)
    nbr = np.tile(np.arange(num_nodes, dtype=np.int32)[:, None], (1, max_deg))
    nbr_ok = np.zeros((num_nodes, max_deg), dtype=bool)
    slot = np.zeros(num_nodes, dtype=np.int64)
    for u, v in zip(f_src_np, f_dst_np):
        nbr[u, slot[u]] = v
        nbr_ok[u, slot[u]] = True
        slot[u] += 1

    # Primal-graph outgoing-road table (slot order = increasing road index,
    # matching the dual turn-edge / nbr order so tie-breaks agree).
    max_out = max(1, max((len(o) for o in outgoing), default=1))
    inter_out = np.zeros((num_intersections, max_out), dtype=np.int32)
    inter_ok = np.zeros((num_intersections, max_out), dtype=bool)
    for k, roads in enumerate(outgoing):
        for s, r in enumerate(roads):
            inter_out[k, s] = r
            inter_ok[k, s] = True

    def _edge_table(by, n_rows, order_key=None):
        """K-major padded table of turn-edge ids grouped by ``by`` (slot
        order = increasing edge id — edge lists are built in id order —
        unless ``order_key`` gives an explicit per-edge rank, used by the
        renumbered build to keep within-group order canonical)."""
        groups: list[list[int]] = [[] for _ in range(n_rows)]
        for e, g in enumerate(by):
            groups[int(g)].append(e)
        kmax = max(1, max((len(g) for g in groups), default=1))
        tab = np.zeros((kmax, n_rows), dtype=np.int32)
        ok = np.zeros((kmax, n_rows), dtype=bool)
        for g, es in enumerate(groups):
            if order_key is not None:
                es = sorted(es, key=lambda e: order_key[e])
            for s, e in enumerate(es):
                tab[s, g] = e
                ok[s, g] = True
        return tab, ok

    e_w_np = np.asarray(e_w, dtype=np.float32)
    # In-table columns group edges ACROSS source groups, so list order within
    # a column is "new source id ascending" — re-sort by canonical source id
    # when renumbered (the out/choice tables inherit canonical order from the
    # sorted ``outgoing`` lists above and need no key).
    in_key = road_order[e_src_np] if renumbered else None
    in_tab, in_tab_ok = _edge_table(e_dst_np, num_roads, order_key=in_key)
    out_tab, out_tab_ok = _edge_table(e_src_np, num_roads)
    ch_tab, ch_tab_ok = _edge_table(f_src_np[choice_mask], num_nodes)
    in_src = np.where(in_tab_ok, e_src_np[in_tab], 0).astype(np.int32)
    with np.errstate(divide="ignore"):
        in_logit = np.where(
            in_tab_ok & (e_w_np[in_tab] > 0),
            np.log(np.maximum(e_w_np[in_tab], 1e-30)),
            -np.inf,
        ).astype(np.float32)
    out_dst = np.where(out_tab_ok, e_dst_np[out_tab], 0).astype(np.int32)
    ch_dst = np.where(
        ch_tab_ok, f_dst_np[choice_mask][ch_tab], 0
    ).astype(np.int32)

    from .core.roll_gather import build_roll_plan

    # Plans are built from 512 roads up with a 5 % exception budget: the
    # FUSED winner kernel (core.fused_winner) consumes them at any size —
    # its exception overlay costs one small scatter per tick — while the
    # XLA roll evaluation keeps its own higher gate (roll_gather.MIN_ROADS,
    # enforced at the use sites) below which the direct gather wins.
    in_roll = build_roll_plan(in_src, in_tab_ok, min_roads=512,
                              max_exc_frac=0.05)
    out_roll = build_roll_plan(out_dst, out_tab_ok, min_roads=512,
                               max_exc_frac=0.05)

    return Network(
        num_roads=num_roads,
        num_intersections=num_intersections,
        nmax=nmax,
        capacity=jnp.asarray(capacity, dtype=jnp.float32),
        free_flow=jnp.asarray(free_flow, dtype=jnp.float32),
        length=jnp.asarray(length, dtype=jnp.float32),
        max_flow=jnp.asarray(max_flow, dtype=jnp.float32),
        critical_number=jnp.asarray(critical, dtype=jnp.float32),
        congestion_constant=jnp.asarray(congestion_constant, dtype=jnp.float32),
        road_dest=jnp.asarray(road_dest, dtype=jnp.int32),
        edge_src=jnp.asarray(e_src_np),
        edge_dst=jnp.asarray(e_dst_np),
        edge_attr=jnp.asarray(e_w, dtype=jnp.float32),
        full_src=jnp.asarray(f_src_np),
        full_dst=jnp.asarray(f_dst_np),
        full_attr=jnp.asarray(f_w, dtype=jnp.float32),
        choice_src=jnp.asarray(f_src_np[choice_mask]),
        choice_dst=jnp.asarray(f_dst_np[choice_mask]),
        nbr=jnp.asarray(nbr),
        nbr_ok=jnp.asarray(nbr_ok),
        road_to=jnp.asarray(to_inter.astype(np.int32)),
        inter_out_road=jnp.asarray(inter_out),
        inter_out_ok=jnp.asarray(inter_ok),
        in_edge_ok=jnp.asarray(in_tab_ok),
        in_src_tab=jnp.asarray(in_src),
        in_logit_tab=jnp.asarray(in_logit),
        out_edge_ok=jnp.asarray(out_tab_ok),
        out_dst_tab=jnp.asarray(out_dst),
        choice_ok=jnp.asarray(ch_tab_ok),
        choice_dst_tab=jnp.asarray(ch_dst),
        inter_x=jnp.asarray(
            np.zeros(num_intersections) if inter_x is None else inter_x,
            dtype=jnp.float32,
        ),
        inter_y=jnp.asarray(
            np.zeros(num_intersections) if inter_y is None else inter_y,
            dtype=jnp.float32,
        ),
        in_roll_shift=jnp.asarray(in_roll[0]),
        in_roll_sel=jnp.asarray(in_roll[1]),
        in_roll_exc_src=jnp.asarray(in_roll[2]),
        in_roll_exc_k=jnp.asarray(in_roll[3]),
        in_roll_exc_v=jnp.asarray(in_roll[4]),
        out_roll_shift=jnp.asarray(out_roll[0]),
        out_roll_sel=jnp.asarray(out_roll[1]),
        out_roll_exc_src=jnp.asarray(out_roll[2]),
        out_roll_exc_k=jnp.asarray(out_roll[3]),
        out_roll_exc_v=jnp.asarray(out_roll[4]),
        in_roll_shift_t=tuple(int(s) for s in in_roll[0]),
        out_roll_shift_t=tuple(int(s) for s in out_roll[0]),
        road_order=jnp.asarray(road_order, dtype=jnp.int32),
        renumbered=renumbered,
    )


def default_selected_road(network: Network) -> jnp.ndarray:
    """Initial SELECTED_ROAD per node.

    The reference initializes the packed matrix to zeros, so every node's
    SELECTED_ROAD starts at road 0 (transportation_simulator.py:135) — an
    accident of the packed layout.  We initialize each node to its first
    outgoing road (or -1 when it has none), which is well-defined and keeps
    the first-tick insert sensible.
    """
    n = network.num_nodes
    sel = np.full((n,), -1, dtype=np.int32)
    src = np.asarray(network.choice_src)
    dst = np.asarray(network.choice_dst)
    for s, d in zip(src[::-1], dst[::-1]):
        sel[s] = d
    return jnp.asarray(sel)
