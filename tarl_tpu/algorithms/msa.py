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
    gap: jnp.ndarray         # float32[] — final L1 gap
    iterations: jnp.ndarray  # int32[]


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
    return MSAResult(flow=flow, gap=gap, iterations=it)


def run_msa(network: Network, agents: AgentState,
            msa: MSAConfig = DEFAULT_MSA) -> dict[int, float]:
    """Reference-contract wrapper: returns ``{road_index: flow}``
    (um.py:65,165)."""
    od_o, od_d, od_vol = build_od_demand(agents, network.num_nodes)
    result = solve_msa(network, od_o, od_d, od_vol, msa=msa)
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
    """Pure-NumPy MSA with heap Dijkstra — an independent implementation of
    the reference algorithm (um.py:65-165) used to cross-validate the
    on-device solver in tests. Same BPR parameters, MSA step and L1 gap."""
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

    flow = np.zeros(n)
    cost = np.where(is_road, free_flow, 0.0)
    for it in range(1, msa.max_iter + 1):
        aux = np.zeros(n)
        for o in np.unique(od_o):
            _, pred = _dijkstra_host(n, adj, cost, int(o))
            for d, vol in zip(od_d[od_o == o], od_vol[od_o == o]):
                node = int(d)
                while node != o and node >= 0:
                    if is_road[node]:
                        aux[node] += vol
                    node = int(pred[node])
        step = 1.0 / it
        new_flow = flow + step * (aux - flow)
        gap = np.abs(new_flow - flow).sum()
        flow = new_flow
        cost = np.where(
            is_road,
            free_flow * (1.0 + msa.bpr_alpha * (flow / capacity) ** msa.bpr_beta),
            0.0,
        )
        if gap < msa.tol:
            break
    return {int(i): float(flow[i]) for i in range(num_roads)}
