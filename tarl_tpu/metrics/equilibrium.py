"""Equilibrium metrics computed on device: TSTT, Nash gap, Price of Anarchy.

The reference *plans* these (README.md:27 "Nash gap / TSTT / PoA") but never
implements them; its closest artifacts are the road-optimality delta series
and the MSA-vs-simulated daily-count comparison.  Definitions used here:

* **TSTT** (total system travel time): sum of realized travel times of DONE
  agents plus the accrued time of agents still en route at evaluation time.
* **Nash gap**: total excess of experienced travel time over the current
  shortest-path travel time for each agent's OD pair, under the congested
  costs at evaluation time.  ``relative_gap = gap / sum(shortest)``; 0 at a
  perfect user equilibrium.
* **Price of Anarchy**: ``TSTT_UE / TSTT_SO`` where the system optimum is
  obtained by solving the same MSA assignment under *marginal* BPR costs
  (first-order system-optimal tolling).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import MSAConfig, PhysicsConfig, DEFAULT_MSA, DEFAULT_PHYSICS
from ..network import Network
from ..routing.bellman_ford import all_pairs_next_hop_nbr, node_entry_costs
from ..state import AgentState, RoadState


def tstt(agents: AgentState, time) -> jnp.ndarray:
    """Total system travel time in seconds at ``time``."""
    done_tt = jnp.where(agents.done, agents.arrival - agents.departure, 0.0)
    en_route_tt = jnp.where(agents.on_way, time - agents.departure, 0.0)
    return jnp.sum(done_tt) + jnp.sum(jnp.maximum(en_route_tt, 0.0))


def nash_gap(
    agents: AgentState,
    road: RoadState,
    network: Network,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
) -> dict:
    """Absolute and relative Nash (user-equilibrium) gap.

    Shortest OD travel times come from the on-device all-pairs Bellman-Ford
    under current congested entry costs; experienced times are realized
    (arrival - departure) for DONE agents.  Agents not DONE are excluded.
    """
    cost = node_entry_costs(road, network, physics)
    dist, _ = all_pairs_next_hop_nbr(network.nbr, network.nbr_ok, cost)
    shortest = dist[agents.origin, agents.dest]
    experienced = agents.arrival - agents.departure
    valid = agents.done & jnp.isfinite(shortest) & (shortest < 1e17)
    excess = jnp.where(valid, jnp.maximum(experienced - shortest, 0.0), 0.0)
    base = jnp.where(valid, shortest, 0.0)
    gap = jnp.sum(excess)
    denom = jnp.maximum(jnp.sum(base), 1e-9)
    return {
        "nash_gap": gap,
        "relative_gap": gap / denom,
        "num_agents": jnp.sum(valid.astype(jnp.int32)),
    }


def bpr_cost(flow, free_flow, capacity, msa: MSAConfig = DEFAULT_MSA):
    """BPR link cost ``fftt * (1 + alpha * (v/c)^beta)``
    (user_equilibrium_msa.py:122-123,151-153)."""
    ratio = flow / jnp.maximum(capacity, 1e-8)
    return free_flow * (1.0 + msa.bpr_alpha * ratio ** msa.bpr_beta)


def bpr_marginal_cost(flow, free_flow, capacity, msa: MSAConfig = DEFAULT_MSA):
    """Marginal BPR cost ``d(v * t(v))/dv = t(v) + v * t'(v)`` — pricing each
    driver at the delay they impose; MSA under this cost converges to the
    system optimum."""
    ratio = flow / jnp.maximum(capacity, 1e-8)
    return free_flow * (1.0 + msa.bpr_alpha * (1.0 + msa.bpr_beta) * ratio ** msa.bpr_beta)


def tstt_from_flows(flow, free_flow, capacity, msa: MSAConfig = DEFAULT_MSA):
    """TSTT implied by static link flows under BPR costs (veh * s per hour)."""
    return jnp.sum(flow * bpr_cost(flow, free_flow, capacity, msa))


def price_of_anarchy(tstt_ue, tstt_so) -> jnp.ndarray:
    return tstt_ue / jnp.maximum(tstt_so, 1e-9)


def equilibrium_report(
    agents: AgentState,
    road: RoadState,
    network: Network,
    time,
    *,
    msa: MSAConfig = DEFAULT_MSA,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
) -> dict:
    """One-call summary: TSTT, Nash gap, and PoA vs the MSA system optimum.

    The UE/SO flows are solved with the on-device MSA assignment
    (algorithms.msa.solve_msa) under user and marginal costs respectively.
    """
    from ..algorithms.msa import build_od_demand, solve_assignment

    od_o, od_d, od_vol = build_od_demand(agents, network.num_nodes)
    ue = solve_assignment(network, od_o, od_d, od_vol, msa=msa)
    so = solve_assignment(network, od_o, od_d, od_vol, msa=msa,
                          system_optimal=True)
    t_ue = tstt_from_flows(ue.flow, network.free_flow, network.max_flow, msa)
    t_so = tstt_from_flows(so.flow, network.free_flow, network.max_flow, msa)
    gap = nash_gap(agents, road, network, physics)
    converged_ue = bool(ue.converged)
    converged_so = bool(so.converged)
    if not (converged_ue and converged_so):
        which = "UE" if not converged_ue else "SO"
        print(
            f"⚠️  | equilibrium_report: {which} assignment did NOT converge "
            f"within {msa.max_iter} iterations (method={msa.method}); "
            "PoA/Nash figures below are computed from the unconverged flows"
        )
    return {
        "tstt_simulated": float(tstt(agents, time)),
        "tstt_ue": float(t_ue),
        "tstt_so": float(t_so),
        "price_of_anarchy": float(price_of_anarchy(t_ue, t_so)),
        "nash_gap": float(gap["nash_gap"]),
        "relative_nash_gap": float(gap["relative_gap"]),
        "assignment_method": msa.method,
        "msa_iterations_ue": int(ue.iterations),
        "msa_gap_ue": float(ue.gap),
        "rel_gap_ue": float(ue.rel_gap),
        "rel_gap_so": float(so.rel_gap),
        "converged_ue": converged_ue,
        "converged_so": converged_so,
    }
