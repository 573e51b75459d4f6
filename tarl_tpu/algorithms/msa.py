"""User-equilibrium traffic assignment via the Method of Successive Averages,
solved entirely on device.

Re-design of the reference validator (user_equilibrium_msa.py:33-165), which
loops ``networkx.shortest_path`` per OD pair per iteration on the host CPU.
Here each iteration is:

1. BPR node-entry costs from current flows (um.py:122-123,151-153) — or
   *marginal* BPR costs when solving for the system optimum;
2. all-or-nothing assignment: one masked Bellman-Ford all-pairs sweep
   (routing.bellman_ford) followed by a vectorized next-hop *walk* over all
   OD pairs simultaneously (``lax.scan`` over hops, scatter-adding volumes
   onto entered roads);
3. MSA averaging with step ``1/it`` and an L1 convergence gap
   (um.py:149-161).

The whole solve is one ``jax.jit``-compiled ``lax.while_loop``.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MSAConfig, DEFAULT_MSA
from ..metrics.equilibrium import bpr_cost, bpr_marginal_cost
from ..network import Network
from ..routing.bellman_ford import all_pairs_next_hop_nbr
from ..state import AgentState


class MSAResult(NamedTuple):
    flow: jnp.ndarray        # float32[R] — converged road flows
    gap: jnp.ndarray         # float32[] — final L1 flow gap
    iterations: jnp.ndarray  # int32[]
    # Frank-Wolfe relative gap sum(c*(f-aux))/sum(c*f) at the last iterate
    # (inf for the plain-MSA solver, which tracks the L1 gap only).
    rel_gap: jnp.ndarray = jnp.float32(jnp.inf)
    # True iff the solver's own stopping criterion was met within max_iter.
    converged: jnp.ndarray = jnp.bool_(False)


def build_od_demand(agents: AgentState, num_nodes: int):
    """OD demand from agent trips, skipping the dummy row 0 (um.py:53-62).

    Host-side dedup (the trip table is static per scenario): returns
    (origins, dests, volumes) for the unique OD pairs.
    """
    o = np.asarray(agents.origin)[1:]
    d = np.asarray(agents.dest)[1:]
    flat = o.astype(np.int64) * num_nodes + d
    uniq, counts = np.unique(flat, return_counts=True)
    return (
        jnp.asarray(uniq // num_nodes, dtype=jnp.int32),
        jnp.asarray(uniq % num_nodes, dtype=jnp.int32),
        jnp.asarray(counts, dtype=jnp.float32),
    )


def assign_all_or_nothing(
    network: Network,
    road_cost: jnp.ndarray,
    od_o: jnp.ndarray,
    od_d: jnp.ndarray,
    od_vol: jnp.ndarray,
) -> jnp.ndarray:
    """Assign each OD volume along the current shortest path.

    Walks ``next_hop`` from every origin toward its destination in lockstep
    (one scan step = one hop for *all* OD pairs), adding volume to every road
    node entered — the vectorized equivalent of the reference's per-pair
    ``for node in path[1:]`` accumulation (um.py:132-144).
    """
    R = network.num_roads
    n = network.num_nodes
    cost_nodes = jnp.zeros((n,), jnp.float32).at[:R].set(road_cost)
    _, next_hop = all_pairs_next_hop_nbr(network.nbr, network.nbr_ok, cost_nodes)

    def hop(carry, _):
        cur, flow = carry
        nxt = next_hop[cur, od_d]
        active = (cur != od_d) & (nxt >= 0)
        new_cur = jnp.where(active, nxt, cur)
        entered_road = active & (new_cur < R)
        idx = jnp.where(entered_road, new_cur, R)  # R -> dropped
        flow = flow.at[idx].add(od_vol, mode="drop")
        return (new_cur, flow), None

    flow0 = jnp.zeros((R,), jnp.float32)
    (_, flow), _ = jax.lax.scan(hop, (od_o, flow0), length=n)
    return flow


@functools.partial(jax.jit, static_argnames=("msa", "system_optimal"))
def solve_msa(
    network: Network,
    od_o: jnp.ndarray,
    od_d: jnp.ndarray,
    od_vol: jnp.ndarray,
    msa: MSAConfig = DEFAULT_MSA,
    system_optimal: bool = False,
) -> MSAResult:
    """MSA fixed point over road flows (um.py:65-165 on device).

    With ``system_optimal=True`` the assignment prices marginal BPR costs,
    yielding the system-optimal flows used for Price-of-Anarchy.
    """
    cost_fn = bpr_marginal_cost if system_optimal else bpr_cost

    def cond(carry):
        it, _, gap = carry
        return (gap >= msa.tol) & (it < msa.max_iter)

    def body(carry):
        it, flow, _ = carry
        cost = cost_fn(flow, network.free_flow, network.max_flow, msa)
        aux = assign_all_or_nothing(network, cost, od_o, od_d, od_vol)
        step = 1.0 / (it + 1).astype(jnp.float32)
        new_flow = flow + step * (aux - flow)
        gap = jnp.sum(jnp.abs(new_flow - flow))
        return it + 1, new_flow, gap

    init = (jnp.int32(0), jnp.zeros((network.num_roads,), jnp.float32), jnp.float32(jnp.inf))
    it, flow, gap = jax.lax.while_loop(cond, body, init)
    return MSAResult(flow=flow, gap=gap, iterations=it,
                     rel_gap=jnp.float32(jnp.inf), converged=gap < msa.tol)


@functools.partial(jax.jit, static_argnames=("msa", "system_optimal"))
def solve_frank_wolfe(
    network: Network,
    od_o: jnp.ndarray,
    od_d: jnp.ndarray,
    od_vol: jnp.ndarray,
    msa: MSAConfig = DEFAULT_MSA,
    system_optimal: bool = False,
) -> MSAResult:
    """Frank-Wolfe traffic assignment with exact line search.

    Same all-or-nothing subproblem as :func:`solve_msa`, but the averaging
    step ``1/it`` (um.py:149-150) is replaced by the exact minimizer of the
    Beckmann objective along the FW direction ``d = aux - flow``:
    ``g(lam) = sum_r int_0^{f_r + lam d_r} c_r(s) ds`` is convex with the
    monotone derivative ``g'(lam) = sum_r d_r c_r(f_r + lam d_r)``, so a
    fixed-count bisection finds ``lam*`` to ``2^-k`` exactly (no closed
    form exists for general BPR beta).  Convergence is measured by the
    standard FW relative gap ``sum(c (f - aux)) / sum(c f)`` — an upper
    bound on the relative distance to the UE objective.

    ``system_optimal=True`` minimizes total system cost ``sum f c(f)``
    instead: AON under *marginal* costs, line search on the marginal-cost
    directional derivative (also monotone — f c(f) is convex for BPR).
    """
    cost_fn = bpr_marginal_cost if system_optimal else bpr_cost
    ff, cap = network.free_flow, network.max_flow

    # FW needs a FEASIBLE start (the zero flow is not: it satisfies no
    # demand, and the line search from it correctly collapses to lam=0):
    # the standard init is all-or-nothing at empty-network costs.
    zeros = jnp.zeros((network.num_roads,), jnp.float32)
    flow0 = assign_all_or_nothing(
        network, cost_fn(zeros, ff, cap, msa), od_o, od_d, od_vol
    )

    def cond(carry):
        it, _, _, rel = carry
        return (rel >= msa.rel_gap_tol) & (it < msa.max_iter)

    def body(carry):
        it, flow, _, _ = carry
        cost = cost_fn(flow, ff, cap, msa)
        aux = assign_all_or_nothing(network, cost, od_o, od_d, od_vol)
        d = aux - flow
        total = jnp.sum(cost * flow)
        rel = jnp.where(
            total > 0.0, jnp.sum(cost * (flow - aux)) / total, jnp.inf
        )

        def bisect(bounds, _):
            lo, hi = bounds
            mid = 0.5 * (lo + hi)
            gp = jnp.sum(d * cost_fn(flow + mid * d, ff, cap, msa))
            return (
                jnp.where(gp > 0.0, lo, mid),
                jnp.where(gp > 0.0, mid, hi),
            ), None

        (lo, hi), _ = jax.lax.scan(
            bisect, (jnp.float32(0.0), jnp.float32(1.0)),
            length=msa.fw_line_search_steps,
        )
        lam = 0.5 * (lo + hi)
        new_flow = flow + lam * d
        l1 = jnp.sum(jnp.abs(new_flow - flow))
        return it + 1, new_flow, l1, rel

    init = (
        jnp.int32(1),
        flow0,
        jnp.float32(jnp.inf),
        jnp.float32(jnp.inf),
    )
    it, flow, l1, rel = jax.lax.while_loop(cond, body, init)
    # `rel` is the gap of the LAST iterate's subproblem (pre-step); recompute
    # one terminal measure on the final flows for honest reporting.
    cost = cost_fn(flow, ff, cap, msa)
    aux = assign_all_or_nothing(network, cost, od_o, od_d, od_vol)
    total = jnp.maximum(jnp.sum(cost * flow), 1e-9)
    rel_final = jnp.sum(cost * (flow - aux)) / total
    return MSAResult(
        flow=flow, gap=l1, iterations=it, rel_gap=rel_final,
        converged=rel_final < msa.rel_gap_tol,
    )


def solve_assignment(network, od_o, od_d, od_vol,
                     msa: MSAConfig = DEFAULT_MSA,
                     system_optimal: bool = False) -> MSAResult:
    """Dispatch on ``msa.method``: "fw" (default) or the reference-faithful
    "msa" averaging."""
    if msa.method == "fw":
        return solve_frank_wolfe(network, od_o, od_d, od_vol, msa=msa,
                                 system_optimal=system_optimal)
    if msa.method == "msa":
        return solve_msa(network, od_o, od_d, od_vol, msa=msa,
                         system_optimal=system_optimal)
    raise ValueError(f"unknown assignment method {msa.method!r}")


def run_msa(network: Network, agents: AgentState,
            msa: MSAConfig = DEFAULT_MSA) -> dict[int, float]:
    """Reference-contract wrapper: returns ``{road_index: flow}``
    (um.py:65,165).  Solves with ``msa.method`` ("fw" by default)."""
    od_o, od_d, od_vol = build_od_demand(agents, network.num_nodes)
    result = solve_assignment(network, od_o, od_d, od_vol, msa=msa)
    flow = np.asarray(result.flow)
    return {int(i): float(flow[i]) for i in range(network.num_roads)}


# ---------------------------------------------------------------------------
# Host-exact fallback (independent implementation for cross-validation)
# ---------------------------------------------------------------------------

def _dijkstra_host(num_nodes, adj, cost, source):
    """Textbook binary-heap Dijkstra over node-entry costs; returns the
    predecessor array (the independent oracle for the device Bellman-Ford)."""
    import heapq

    dist = np.full(num_nodes, np.inf)
    pred = np.full(num_nodes, -1, dtype=np.int64)
    dist[source] = 0.0
    heap = [(0.0, source)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist[u]:
            continue
        for v in adj[u]:
            nd = d + cost[v]
            if nd < dist[v] - 1e-12:
                dist[v] = nd
                pred[v] = u
                heapq.heappush(heap, (nd, v))
    return dist, pred


def run_msa_host(network: Network, agents: AgentState,
                 msa: MSAConfig = DEFAULT_MSA) -> dict[int, float]:
    """Pure-NumPy assignment with heap Dijkstra — an independent
    implementation of the same algorithms (um.py:65-165 for "msa"; the FW
    step mirrors :func:`solve_frank_wolfe`'s exact bisection line search)
    used to cross-validate the on-device solver in tests.  Same BPR
    parameters and stopping rules."""
    n = network.num_nodes
    num_roads = network.num_roads
    src = np.asarray(network.full_src)
    dst = np.asarray(network.full_dst)
    adj = [[] for _ in range(n)]
    for u, v in zip(src, dst):
        adj[u].append(int(v))

    free_flow = np.zeros(n)
    capacity = np.full(n, 1e-8)
    free_flow[:num_roads] = np.asarray(network.free_flow)
    capacity[:num_roads] = np.maximum(np.asarray(network.max_flow), 1e-8)
    is_road = np.zeros(n, bool)
    is_road[:num_roads] = True

    od_o, od_d, od_vol = build_od_demand(agents, n)
    od_o = np.asarray(od_o)
    od_d = np.asarray(od_d)
    od_vol = np.asarray(od_vol)

    def bpr(flow):
        return np.where(
            is_road,
            free_flow
            * (1.0 + msa.bpr_alpha * (flow / capacity) ** msa.bpr_beta),
            0.0,
        )

    def aon(cost):
        aux = np.zeros(n)
        for o in np.unique(od_o):
            _, pred = _dijkstra_host(n, adj, cost, int(o))
            for d, vol in zip(od_d[od_o == o], od_vol[od_o == o]):
                node = int(d)
                while node != o and node >= 0:
                    if is_road[node]:
                        aux[node] += vol
                    node = int(pred[node])
        return aux

    flow = np.zeros(n)
    if msa.method == "fw":
        flow = aon(bpr(flow))  # feasible start: AON at empty-network costs
        for _ in range(msa.max_iter - 1):
            cost = bpr(flow)
            aux = aon(cost)
            total = float((cost * flow).sum())
            rel = (
                float((cost * (flow - aux)).sum()) / total
                if total > 0 else np.inf
            )
            if rel < msa.rel_gap_tol:
                break
            d = aux - flow
            lo, hi = 0.0, 1.0
            for _k in range(msa.fw_line_search_steps):
                mid = 0.5 * (lo + hi)
                gp = float((d * bpr(flow + mid * d)).sum())
                if gp > 0.0:
                    hi = mid
                else:
                    lo = mid
            flow = flow + 0.5 * (lo + hi) * d
    else:
        cost = bpr(flow)
        for it in range(1, msa.max_iter + 1):
            aux = aon(cost)
            step = 1.0 / it
            new_flow = flow + step * (aux - flow)
            gap = np.abs(new_flow - flow).sum()
            flow = new_flow
            cost = bpr(flow)
            if gap < msa.tol:
                break
    return {int(i): float(flow[i]) for i in range(num_roads)}
