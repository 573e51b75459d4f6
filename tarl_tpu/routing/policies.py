"""Route-choice policies (the reference's ``Agents.choice`` family).

A policy is a pure function ``choice(state, network) -> (state, entry_road)``:
it updates ``state.selected_road`` (the SELECTED_ROAD column of the packed
layout) and optionally returns a per-agent entry road used by insertion.

* :func:`random_choice` — uniform next-road sampling over each node's
  outgoing roads (reference: agents/base.py:446-494, where multinomial over
  the normalized 0/1 adjacency row is exactly a uniform draw).
* :func:`shortest_path_choice` — periodic congested all-pairs refresh +
  per-node next-hop lookup (reference: DijkstraAgents.choice,
  agents/base.py:519-584), with the Dijkstra solve replaced by the on-device
  Bellman-Ford sweep of :mod:`tarl_tpu.routing.bellman_ford`.

Deviation from the reference, documented: the reference routes *entering*
agents through their origin SRC node's SELECTED_ROAD, which is computed from
the SRC node's (always empty) FIFO head — i.e. from the dummy agent's
destination (base.py:573-579).  Here the shortest-path policy returns a
per-agent ``entry_road = next_hop[origin, dest]`` so entrants head toward
their own destination.  ``RoutingConfig.strict_compat`` restores the
reference's exact behaviour (dummy-driven entry roads + its edge-cost form)
for A/B validation.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import RoutingConfig, DEFAULT_ROUTING, PhysicsConfig, DEFAULT_PHYSICS
from ..network import Network
from ..routing.bellman_ford import node_entry_costs, all_pairs_next_hop_nbr
from ..state import SimState

# choice(state, network) -> (state, entry_road | None)
ChoiceFn = Callable[[SimState, Network], tuple[SimState, Optional[jnp.ndarray]]]

# refresh_rate at or above this is treated as "never refresh" at TRACE time
# (free-flow-table-only episodes skip the per-tick cond on the big buffer).
_NEVER_REFRESH = 10 ** 9


def random_choice(state: SimState, network: Network):
    """Sample a uniform outgoing road for every road and SRC node
    (agents/base.py:446-494).

    Gumbel-max over each node's choice slots (``network.choice_dst_tab``,
    slot-major [KC, N] noise) — a uniform categorical per node, computed
    entirely gather-free (see core.direction's performance note).
    """
    from ..core.rng import choice_gumbel

    key, sub = jax.random.split(state.key)
    n = network.num_nodes
    kc = network.choice_dst_tab.shape[0]
    scores = choice_gumbel(sub, network)  # canonical-addressed if renumbered
    best = jnp.full((n,), -jnp.inf, jnp.float32)
    sel = state.selected_road
    for k in range(kc):
        s_k = jnp.where(network.choice_ok[k], scores[k], -jnp.inf)
        take = s_k > best
        best = jnp.where(take, s_k, best)
        sel = jnp.where(take, network.choice_dst_tab[k], sel)
    return state._replace(selected_road=sel.astype(jnp.int32), key=key), None


def make_shortest_path_choice(
    routing: RoutingConfig = DEFAULT_ROUTING,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
) -> ChoiceFn:
    """Shortest-path (Dijkstra-equivalent) policy with periodic refresh.

    Every ``routing.refresh_rate`` calls the congested all-pairs next-hop
    table is recomputed (base.py:539-570); every call each road's
    SELECTED_ROAD is set to the next hop toward its head agent's destination
    (base.py:573-583).

    With ``routing.strict_compat`` the refresh uses the reference's exact
    edge-cost form (:func:`reference_edge_costs`, base.py:541-549) and
    SELECTED_ROAD is written for ALL nodes — including SRC nodes, whose empty
    FIFO head is the dummy agent 0, reproducing the reference's
    entrants-follow-the-dummy's-destination behaviour (base.py:573-579).
    """
    if routing.strict_compat:
        from .bellman_ford import all_pairs_next_hop, reference_edge_costs

        def choice(state: SimState, network: Network):
            n = network.num_nodes

            def refresh(_):
                w = reference_edge_costs(state.road, network, physics)
                _, nh = all_pairs_next_hop(
                    network.full_src, network.full_dst,
                    jnp.zeros((n,), jnp.float32), n,
                    max_iters=routing.max_bf_iters, edge_cost=w,
                )
                return nh

            do_refresh = state.choice_count % routing.refresh_rate == 0
            next_hop = jax.lax.cond(
                do_refresh, refresh, lambda _: state.next_hop, operand=None
            )

            # All N rows route via their FIFO head (the dummy agent 0 for
            # SRC/DEST nodes) — base.py:573-579 verbatim.
            head_all = jnp.zeros((n,), jnp.int32).at[
                : network.num_roads
            ].set(state.road.head_ids())
            dests = state.agents.dest[head_all]
            sel = next_hop[
                jnp.arange(n, dtype=jnp.int32), dests
            ].astype(jnp.int32)
            new_state = state._replace(
                selected_road=sel,
                next_hop=next_hop,
                choice_count=state.choice_count + 1,
            )
            return new_state, None

        return choice

    node_cost_fn = _node_cost_fn(routing)

    def refresh_fn(state: SimState, network: Network):
        cost = node_cost_fn(state.road, network, physics)
        _, nh = all_pairs_next_hop_nbr(
            network.nbr, network.nbr_ok, cost,
            max_iters=routing.max_bf_iters,
        )
        return nh

    def lookup_fn(state: SimState, network: Network, next_hop,
                  force_full=False):
        # Roads route their head agent toward its destination — read from
        # the denormalized ring (fifo_dest masked row-reduce; bitwise equal
        # to agents.dest[head_ids] since the dummy agent's dest is 0) so the
        # per-tick path needs no unsorted [R] gather; the table gathers run
        # INCREMENTALLY over changed heads (_incremental_sel_roads).
        dests = state.road.head_dests()
        road_ids = jnp.arange(network.num_roads, dtype=jnp.int32)
        sel_roads, sd = _incremental_sel_roads(
            state, network, dests,
            lambda d: next_hop[road_ids, d],
            lambda rows, d: next_hop[rows, d],
            force_full,
        )
        sel = state.selected_road.at[: network.num_roads].set(sel_roads)

        # Entrants route from their origin SRC node toward their own
        # destination via Policy.entry / Policy.entry_lookup
        # (shortest_path_entry below) — not recomputed here.
        kw = {} if sd is None else {"sel_dest": sd}
        return state._replace(
            selected_road=sel,
            choice_count=state.choice_count + 1,
            **kw,
        )

    def choice(state: SimState, network: Network):
        do_refresh = state.choice_count % routing.refresh_rate == 0
        next_hop = jax.lax.cond(
            do_refresh, lambda _: refresh_fn(state, network),
            lambda _: state.next_hop, operand=None
        )
        new_state = lookup_fn(
            state, network, next_hop, force_full=do_refresh
        )._replace(next_hop=next_hop)
        return new_state, None

    choice.refresh_fn = refresh_fn
    choice.lookup_fn = lookup_fn
    return choice


def _node_cost_fn(routing: RoutingConfig):
    from .bellman_ford import marginal_node_costs, node_entry_costs

    return (marginal_node_costs if routing.cost_mode == "marginal"
            else node_entry_costs)


def _road_cost_fn(routing: RoutingConfig):
    from .bellman_ford import marginal_road_costs, road_costs

    return (marginal_road_costs if routing.cost_mode == "marginal"
            else road_costs)


def _maybe_delta_buckets(network: Optional[Network]):
    """(delta_shifts, delta_slot, delta_perm, delta_inv) for the fast
    roll-based primal sweep — offsets under the best locality row order
    (node coordinates, bellman_ford.primal_delta_buckets) — or four Nones
    when no concrete network is at hand or the network doesn't bucket
    (fallback: the gather sweep — bitwise-identical results, see
    bellman_ford._primal_relax)."""
    if network is None:
        return None, None, None, None
    from .bellman_ford import primal_delta_buckets

    coords = None
    if getattr(network, "inter_x", None) is not None:
        coords = (network.inter_x, network.inter_y)
    # Offset-count cap: grids bucket at <=18 offsets, the radial metro's
    # identity order needs 42 (measured) — the multisweep kernel's VPU work
    # scales with the count, so the default stays conservative and the env
    # var is the measurement knob for irregular networks.
    import os

    b = primal_delta_buckets(
        network.inter_out_road, network.inter_out_ok, network.road_to,
        coords=coords,
        max_deltas=int(os.environ.get("TARL_MAX_DELTAS", "32")),
    )
    return (None, None, None, None) if b is None else b


def _maybe_epilogue_tables(network: Optional[Network], buckets):
    """Static slot tables for the in-kernel next-road epilogue
    (bellman_ford.epilogue_slot_tables), or None when buckets are off."""
    if network is None or buckets[0] is None:
        return None
    from .bellman_ford import epilogue_slot_tables

    return epilogue_slot_tables(
        network.inter_out_road, network.inter_out_ok, network.road_to,
        buckets,
    )


# Per-tick changed-head budget of the incremental lookup (see
# _incremental_sel_roads); ticks with more changed heads take the full pass
# through lax.cond — bitwise-identical either way.
_LOOKUP_BUDGET = 256
# Below this road count the full-pass gathers are cheaper than the top_k
# compaction (launch-bound ~50 us on the v5e, like insert/withdraw compact).
_LOOKUP_MIN_ROADS = 4096


def _incremental_sel_roads(state, network, dests, full_fn, cand_fn,
                           force_full):
    """SELECTED_ROAD update restricted to roads whose FIFO-head destination
    changed since the last lookup.

    sel is a PURE per-road function of (routing table, head dest), and head
    dests change sparsely (pops/pushes ~ arrival rate per tick) — while the
    full pass pays 2-3 unsorted [R] gathers at ~7 ns/index, which at metro
    scale dominates the whole tick (Grid256/2M zoned sp: lookup 6.1 of
    11.7 ms/tick).  Changed rows are compacted to a static budget with a
    stable top_k; refresh ticks and over-budget ticks take the full pass
    via lax.cond — bitwise-identical at any budget.

    ``full_fn(dests) -> int32[R]``; ``cand_fn(rows, dests_c) -> int32[B]``
    (the same lookup restricted to candidate rows).  Returns
    ``(sel_roads[R], new_sel_dest[R] | None)``.
    """
    R = network.num_roads
    if (state.sel_dest is None or state.sel_dest.shape[0] != R
            or R < _LOOKUP_MIN_ROADS):
        return full_fn(dests), (None if state.sel_dest is None else dests)
    budget = _LOOKUP_BUDGET
    prev_sel = state.selected_road[:R]
    changed = dests != state.sel_dest
    n = jnp.sum(changed.astype(jnp.int32))

    def full(_):
        return full_fn(dests)

    def inc(_):
        flags = changed.astype(jnp.int32)
        topf, topi = jax.lax.top_k(flags, budget)   # stable: row order kept
        safe = jnp.minimum(topi, R - 1)
        sel_c = cand_fn(safe, dests[safe])
        rows = jnp.where(topf > 0, topi, R)
        return prev_sel.at[rows].set(sel_c, mode="drop")

    sel_roads = jax.lax.cond(
        jnp.asarray(force_full) | (n > budget), full, inc, None
    )
    return sel_roads, dests


def _primal_pack(dist, cost, road) -> jnp.ndarray:
    """Flat float32 routing scratch: ``dist[I, D] ++ cost[R] ++
    next_road[I, D]`` (road ids as float32, -1 = unreachable — exact below
    2^24; see bellman_ford.primal_next_roads)."""
    return jnp.concatenate([dist.ravel(), cost, road.ravel()])


def _primal_unpack(buf, i_n: int, d_n: int, num_roads: int):
    """Inverse of :func:`_primal_pack`: ``(dist[I, D], cost[R],
    next_road[I, D])``."""
    dist = buf[: i_n * d_n].reshape(i_n, d_n)
    cost = buf[i_n * d_n: i_n * d_n + num_roads]
    road = buf[i_n * d_n + num_roads:].reshape(i_n, d_n)
    return dist, cost, road


def primal_buf_size(i_n: int, d_n: int, num_roads: int) -> int:
    """Element count of the packed primal routing scratch."""
    return 2 * i_n * d_n + num_roads


def _road_lookup(road_tab, from_inter, dest_col) -> jnp.ndarray:
    """Per-lookup best outgoing road from the PRECOMPUTED table: one element
    gather (the per-tick fast path; the K-slot argmin now runs once per
    refresh inside bellman_ford.primal_next_roads)."""
    return road_tab[from_inter, dest_col].astype(jnp.int32)


def _primal_argmin_road(buf, network, from_inter, dest_inter):
    """Best outgoing road at each ``from_inter`` toward ``dest_inter``.

    ``buf`` is the packed all-pairs primal routing scratch (see
    :func:`make_shortest_path_choice_primal`)."""
    i_n = network.num_intersections
    _, _, road = _primal_unpack(buf, i_n, i_n, network.num_roads)
    return _road_lookup(road, from_inter, dest_inter)


def _dest_inter(network, dest_nodes):
    """DEST dual-node index -> intersection ordinal (clipped for sentinels)."""
    return jnp.clip(
        (dest_nodes - network.num_roads - 1) // 2, 0,
        network.num_intersections - 1,
    )


def primal_table_init(network: Network, max_iters: int | None = None):
    """Free-flow primal routing scratch for :class:`~tarl_tpu.state.SimState`.

    NOTE: ``max_iters`` caps the device relaxation for the INIT only when
    explicitly passed; `make_policy` passes None so the free-flow anchor is
    always exact regardless of the refresh cap.

    Packed as ``concat(dist[I, I].ravel(), road_cost[R], next_road[I, I])``
    — one flat float32 array so the scan carry keeps a single routing slot
    (state.next_hop); ``next_road`` is the refresh-time-materialized best
    outgoing road per (intersection, dest) (bellman_ford.primal_next_roads).

    For LARGE networks the one-time free-flow table is computed on the HOST
    with scipy's sparse Dijkstra: the cold on-device relaxation needs a
    diameter's worth of sweeps and each sweep's [I, K, I] gather hits XLA's
    serial emitter (~400 s at Grid64x64, measured); scipy does the same
    table in seconds.  Small networks keep the device BF so the free-flow
    table is bit-for-bit the dual backend's (float summation order), which
    the cross-backend episode-equality tests rely on.  Congested refreshes
    always stay on device, warm-started from the carried table
    (make_shortest_path_choice_primal).
    """
    import numpy as np

    from .bellman_ford import BIG, primal_all_pairs_dist, primal_next_roads

    def pack(dist):
        road = primal_next_roads(
            dist, network.free_flow, network.inter_out_road,
            network.inter_out_ok, network.road_to,
        )
        return _primal_pack(dist, network.free_flow, road)

    i_n = network.num_intersections
    if i_n * i_n <= 1_000_000:
        dist = primal_all_pairs_dist(
            network.free_flow, network.inter_out_road, network.inter_out_ok,
            network.road_to, max_iters=max_iters,
        )
        return pack(dist)

    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import dijkstra as host_dijkstra
    ok = np.asarray(network.inter_out_ok)         # [I, K]
    out_r = np.asarray(network.inter_out_road)    # [I, K]
    road_to = np.asarray(network.road_to)
    cost = np.asarray(network.free_flow)
    mask = ok.ravel()                             # inter-major [I*K]
    src = np.repeat(np.arange(i_n), ok.shape[1])[mask]
    roads = out_r.ravel()[mask]
    graph = csr_matrix(
        (cost[roads], (src, road_to[roads])), shape=(i_n, i_n)
    )
    dist = host_dijkstra(graph, directed=True)
    # scipy can return duplicate-edge-summed entries only if (src, dst)
    # repeats; the dual construction yields at most one turn edge per
    # ordered pair, and csr_matrix sums duplicates of parallel roads —
    # conservative (an upper bound), corrected by the first device refresh.
    dist = np.where(np.isfinite(dist), dist, float(BIG)).astype(np.float32)
    return pack(jnp.asarray(dist))


def make_shortest_path_choice_primal(
    routing: RoutingConfig = DEFAULT_ROUTING,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    network: Optional[Network] = None,
) -> ChoiceFn:
    """Shortest-path policy on the PRIMAL (intersection) graph.

    Behaviourally equivalent to :func:`make_shortest_path_choice` (same
    congested costs, same refresh cadence, same tie-breaks) but with O(I^2)
    instead of O(N^2) routing state, N = R + 2I — the scalable backend for
    large networks (docs/BENCH.md).  One visible difference, of no behavioural
    consequence: when a head agent's destination is adjacent, the dual table
    selects the zero-cost DEST node (freezing the head until withdraw), while
    this backend selects the best onward road — withdraw always pops such a
    head before the core could transfer it (tick order: withdraw precedes
    choice; direction requires ``departure <= t``, by which time withdraw has
    taken it).
    """

    road_cost_fn = _road_cost_fn(routing)
    buckets = _maybe_delta_buckets(network)
    shifts, slot, perm, inv = buckets
    epi = _maybe_epilogue_tables(network, buckets)

    def refresh_fn(state: SimState, network: Network):
        from .bellman_ford import BIG, primal_relax_next_roads

        i_n = network.num_intersections
        cost = road_cost_fn(state.road, network, physics)
        # Warm start from the previous table inflated by the worst
        # per-road cost ratio — a valid upper bound on every new
        # distance, so relaxation converges down to the exact table
        # (and the early exit fires fast when congestion barely moved).
        prev_dist, prev_cost, _ = _primal_unpack(
            state.next_hop, i_n, i_n, network.num_roads
        )
        ratio = jnp.max(cost / jnp.maximum(prev_cost, 1e-6))
        dist0 = jnp.minimum(prev_dist * jnp.maximum(ratio, 1.0), BIG)
        eye = jnp.eye(i_n, dtype=bool)
        dist, road = primal_relax_next_roads(
            cost, network.inter_out_road, network.inter_out_ok,
            network.road_to, jnp.where(eye, 0.0, dist0),
            routing.max_bf_iters, buckets=buckets, epi_tables=epi,
        )
        return _primal_pack(dist, cost, road)

    def lookup_fn(state: SimState, network: Network, buf,
                  force_full=False):
        i_n = network.num_intersections
        _, _, road_tab = _primal_unpack(buf, i_n, i_n, network.num_roads)
        # Ring-denormalized head destinations (no [R] gather; see the dual
        # backend's note — bitwise equal, dummy dest is 0); table gathers
        # run incrementally over changed heads (_incremental_sel_roads).
        dests = state.road.head_dests()
        sel_roads, sd = _incremental_sel_roads(
            state, network, dests,
            lambda d: _road_lookup(
                road_tab, network.road_to, _dest_inter(network, d)
            ),
            lambda rows, d: _road_lookup(
                road_tab, network.road_to[rows], _dest_inter(network, d)
            ),
            force_full,
        )
        sel = state.selected_road.at[: network.num_roads].set(sel_roads)
        kw = {} if sd is None else {"sel_dest": sd}
        return state._replace(
            selected_road=sel,
            choice_count=state.choice_count + 1,
            **kw,
        )

    def choice(state: SimState, network: Network):
        if routing.refresh_rate >= _NEVER_REFRESH:
            # Static no-refresh episode (free-flow table only): skip the
            # cond entirely — a lax.cond carrying the multi-hundred-MB
            # packed buffer costs a buffer copy per tick on TPU.
            buf = state.next_hop
            do_refresh = False
        else:
            do_refresh = state.choice_count % routing.refresh_rate == 0
            buf = jax.lax.cond(
                do_refresh, lambda _: refresh_fn(state, network),
                lambda _: state.next_hop, operand=None
            )
        new_state = lookup_fn(
            state, network, buf, force_full=do_refresh
        )._replace(next_hop=buf)
        return new_state, None

    # Periodic-episode pieces (core.step.run_episode_periodic hoists the
    # refresh out of the tick scan; see Policy.refresh/lookup).
    choice.refresh_fn = refresh_fn
    choice.lookup_fn = lookup_fn
    return choice


def _round4(n: int) -> int:
    return ((n + 3) // 4) * 4


def _zone_k_tab(road_tab, network: Network, d_n: int):
    """Compress the refresh-time next-road table to int8 out-edge SLOT
    indices per ROAD: ``k_tab[r, d] = k`` s.t. ``inter_out_road[road_to[r],
    k] == next_road[road_to[r], d]`` (first valid match; sentinel K for
    unreachable).  Shape [R, Dp] with the dest axis padded to a multiple of
    4 so the int8 block bitcasts into the flat f32 routing scratch.

    Refresh-cadence work only (one [I, D]xK compare sweep + one [R]-row
    gather); the payoff is the per-tick one-hot lookup reading 1 byte/entry
    instead of 4 (see _zone_onehot_sel)."""
    k_n = network.inter_out_road.shape[1]
    assert k_n < 127, "int8 slot index: out-degree bound exceeds int8"
    k_i = jnp.full(road_tab.shape, k_n, jnp.int8)           # [I, D]
    for k in range(k_n - 1, -1, -1):
        m = (network.inter_out_ok[:, k][:, None]
             & (road_tab == network.inter_out_road[:, k]
                .astype(jnp.float32)[:, None]))
        k_i = jnp.where(m, jnp.int8(k), k_i)
    k_i = jnp.where(road_tab < 0.0, jnp.int8(k_n), k_i)
    k_tab = k_i[network.road_to]                            # [R, D]
    dp = _round4(d_n)
    if dp != d_n:
        k_tab = jnp.concatenate(
            [k_tab,
             jnp.full((k_tab.shape[0], dp - d_n), k_n, jnp.int8)], axis=1
        )
    return k_tab


def _pack_k(k_tab):
    """int8[R, Dp] -> float32[R, Dp // 4] by bitcast (Dp % 4 == 0)."""
    r, dp = k_tab.shape
    return jax.lax.bitcast_convert_type(
        k_tab.reshape(r, dp // 4, 4), jnp.float32
    )


def _unpack_k(flat, r: int, dp: int):
    """float32[R * Dp / 4] -> int8[R, Dp] (inverse of _pack_k)."""
    return jax.lax.bitcast_convert_type(
        flat.reshape(r, dp // 4), jnp.int8
    ).reshape(r, dp)


def _zone_onehot_sel(k_tab, dest_i, dest_list, network: Network):
    """Gather-free per-tick zoned lookup: one fused [R, Dp] one-hot
    compare+select+sum over the int8 k-table, then a K-way select through
    the static ``inter_out_road[road_to]`` rows (loop-invariant — XLA
    hoists it out of the episode scan).  Destinations outside the zone list
    (only the dummy agent's) read column 0; sentinel K maps to -1
    (unreachable) — bitwise-identical to the f32 road-id one-hot."""
    d_n = int(dest_list.shape[0])
    dp = k_tab.shape[1]
    dlp = dest_list
    if dp != d_n:
        dlp = jnp.concatenate(
            [dest_list, jnp.full((dp - d_n,), -2, jnp.int32)]
        )
    hit = dest_i[:, None] == dlp[None, :]                   # [R, Dp]
    no_hit = ~jnp.any(hit, axis=1)
    col0 = jnp.arange(dp, dtype=jnp.int32)[None, :] == 0
    hit = hit | (no_hit[:, None] & col0)
    k = jnp.sum(jnp.where(hit, k_tab, jnp.int8(0)), axis=1,
                dtype=jnp.int8)                             # [R]
    out_r = network.inter_out_road[network.road_to]         # static [R, K]
    k_n = out_r.shape[1]
    sel = jnp.full(k.shape, -1, jnp.int32)
    for j in range(k_n):
        sel = jnp.where(k == jnp.int8(j), out_r[:, j], sel)
    return sel


def make_primal_dest_parts(dest_inters, routing: RoutingConfig = DEFAULT_ROUTING,
                           physics: PhysicsConfig = DEFAULT_PHYSICS,
                           network: Optional[Network] = None):
    """Destination-restricted primal routing: ``(choice, entry_lookup,
    table_init)`` callables over a ``dist[I, D]`` table whose columns are
    the population's actual destination intersections.

    O(I*D) memory and sweep work instead of O(I^2) — the scalable form for
    metropolitan networks with concentrated commuting destinations (e.g.
    Grid128x128 with 200 work zones: 13 MB instead of 1 GB).  Same costs,
    refresh cadence, warm start and tie-breaks as the all-pairs backend;
    lookups map a destination intersection to its column (destinations
    outside the set — only the dummy agent's — read column 0, whose value
    is never used).
    """
    import numpy as np

    dest_np = np.unique(np.asarray(dest_inters, dtype=np.int32))
    d_n = int(dest_np.shape[0])
    dest_list = jnp.asarray(dest_np)

    def col_of(network):
        col = np.zeros((network.num_intersections,), np.int32)
        col[dest_np] = np.arange(d_n, dtype=np.int32)
        return jnp.asarray(col)

    def pack_z(dist, cost, road_tab, network):
        """Zoned buffer layout: ``dist[I, D] ++ cost[R] ++ next_road[I, D]
        ++ f32-bitcast(k_tab[R, Dp] int8)`` — the last block is the per-ROAD
        next-road table compressed to the out-edge SLOT index (int8;
        materialized ONCE PER REFRESH), so the per-tick one-hot lookup reads
        a quarter of the bytes the road-id form did (the metro tick is
        bandwidth-bound on this pass — Grid256/2M: 2.76 ms at f32 ids)."""
        k_tab = _zone_k_tab(road_tab, network, d_n)
        return jnp.concatenate(
            [dist.ravel(), cost, road_tab.ravel(), _pack_k(k_tab).ravel()]
        )

    def unpack_z(buf, network):
        i_n = network.num_intersections
        R = network.num_roads
        dp = _round4(d_n)
        dist = buf[: i_n * d_n].reshape(i_n, d_n)
        cost = buf[i_n * d_n: i_n * d_n + R]
        road_tab = buf[i_n * d_n + R: 2 * i_n * d_n + R].reshape(i_n, d_n)
        k_tab = _unpack_k(buf[2 * i_n * d_n + R:], R, dp)
        return dist, cost, road_tab, k_tab

    def table_init(network):
        # The free-flow table must be EXACT (it anchors every warm-started
        # refresh); only refreshes honor routing.max_bf_iters.
        from .bellman_ford import primal_dest_dist, primal_next_roads

        sh, sl, pm, iv = _maybe_delta_buckets(network)
        dist = primal_dest_dist(
            network.free_flow, network.inter_out_road, network.inter_out_ok,
            network.road_to, dest_list, max_iters=None,
            delta_shifts=sh, delta_slot=sl, delta_perm=pm, delta_inv=iv,
        )
        road = primal_next_roads(
            dist, network.free_flow, network.inter_out_road,
            network.inter_out_ok, network.road_to,
        )
        return pack_z(dist, network.free_flow, road, network)

    road_cost_fn = _road_cost_fn(routing)
    buckets = _maybe_delta_buckets(network)
    shifts, slot, perm, inv = buckets
    epi = _maybe_epilogue_tables(network, buckets)

    def refresh_fn(state: SimState, network: Network):
        from .bellman_ford import BIG, primal_relax_next_roads

        i_n = network.num_intersections
        cost = road_cost_fn(state.road, network, physics)
        prev_dist, prev_cost, _, _ = unpack_z(state.next_hop, network)
        ratio = jnp.max(cost / jnp.maximum(prev_cost, 1e-6))
        dist0 = jnp.minimum(prev_dist * jnp.maximum(ratio, 1.0), BIG)
        anchor = (jnp.arange(i_n, dtype=jnp.int32)[:, None]
                  == dest_list[None, :])
        dist, road = primal_relax_next_roads(
            cost, network.inter_out_road, network.inter_out_ok,
            network.road_to, jnp.where(anchor, 0.0, dist0),
            routing.max_bf_iters, buckets=buckets, epi_tables=epi,
        )
        return pack_z(dist, cost, road, network)

    def lookup_fn(state: SimState, network: Network, buf,
                  force_full=False):
        del force_full  # the one-hot pass IS the cheap full pass
        # Gather-free per-tick lookup: destinations take only the D zone
        # values, so sel = one fused [R, Dp] one-hot compare+select+sum over
        # the refresh-time int8 k-table — replacing three unsorted [R]
        # gathers that dominated the metro tick (Grid256/2M: lookup 6.1 of
        # 11.7 ms; ~7 ns/index serial emitter), at a quarter of the f32
        # road-id form's bytes.  Destinations outside the zone list (only
        # the dummy agent's) read column 0, matching the old dcol-default —
        # bitwise-identical sel.
        _, _, _, k_tab = unpack_z(buf, network)
        dest_i = _dest_inter(network, state.road.head_dests())   # [R]
        sel_roads = _zone_onehot_sel(k_tab, dest_i, dest_list, network)
        sel = state.selected_road.at[: network.num_roads].set(sel_roads)
        return state._replace(
            selected_road=sel, choice_count=state.choice_count + 1,
        )

    def choice(state: SimState, network: Network):
        if routing.refresh_rate >= _NEVER_REFRESH:
            buf = state.next_hop  # static no-refresh (see all-pairs variant)
            do_refresh = False
        else:
            do_refresh = state.choice_count % routing.refresh_rate == 0
            buf = jax.lax.cond(
                do_refresh, lambda _: refresh_fn(state, network),
                lambda _: state.next_hop, operand=None
            )
        return lookup_fn(
            state, network, buf, force_full=do_refresh
        )._replace(next_hop=buf), None

    choice.refresh_fn = refresh_fn
    choice.lookup_fn = lookup_fn

    def entry_lookup(state, network, agent_ids=None):
        origin = (state.agents.origin if agent_ids is None
                  else state.agents.origin[agent_ids])
        dest = (state.agents.dest if agent_ids is None
                else state.agents.dest[agent_ids])
        from_i = jnp.clip(
            (origin - network.num_roads) // 2, 0,
            network.num_intersections - 1,
        )
        _, _, road_tab, _ = unpack_z(state.next_hop, network)
        dcol = col_of(network)[_dest_inter(network, dest)]
        return _road_lookup(road_tab, from_i, dcol)

    # Metadata for parallel drivers (shard_map_episode): the destination
    # list identifies the dist[I, D] buffer layout so the replicated
    # refresh/lookup can be mirrored shard-side.
    table_init.dest_list = dest_np
    choice.dest_list = dest_np
    return choice, entry_lookup, table_init


def primal_entry_lookup(state, network, agent_ids=None):
    """Per-agent entry road from the primal routing scratch (the counterpart
    of :func:`shortest_path_entry`)."""
    origin = state.agents.origin if agent_ids is None else state.agents.origin[agent_ids]
    dest = state.agents.dest if agent_ids is None else state.agents.dest[agent_ids]
    from_i = jnp.clip(
        (origin - network.num_roads) // 2, 0, network.num_intersections - 1
    )
    return _primal_argmin_road(
        state.next_hop, network, from_i, _dest_inter(network, dest)
    )


class ExternalChoice(NamedTuple):
    """Apply an externally supplied multi-hot edge action (the RL env path,
    reinforcement_learning.py:224-231): for every active full edge (u -> v),
    set SELECTED_ROAD[u] = v."""

    action: jnp.ndarray  # bool[Ef]

    def __call__(self, state: SimState, network: Network):
        act = self.action.astype(bool)
        src = jnp.where(act, network.full_src, network.num_nodes)  # drop inactive
        sel = state.selected_road.at[src].set(
            network.full_dst.astype(jnp.int32), mode="drop"
        )
        return state._replace(selected_road=sel), None


def shortest_path_entry(state, network, agent_ids=None):
    """Per-agent entry road from the current next-hop table; with
    ``agent_ids`` given, only those rows are gathered (O(W) per tick)."""
    import jax.numpy as jnp  # local to keep module import order flat

    if agent_ids is None:
        return state.next_hop[state.agents.origin, state.agents.dest]
    return state.next_hop[
        state.agents.origin[agent_ids], state.agents.dest[agent_ids]
    ]
