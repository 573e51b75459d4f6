"""Pure-functional RL environment over the traffic simulator.

Replaces the reference's TorchRL ``EnvBase`` wrapper (``SimulatorEnv``,
reinforcement_learning.py:102-309) with two pure functions, ``env_reset`` and
``env_step``, so the whole rollout lives inside one compiled program
(``lax.scan`` in rl.ppo) — no host<->device environment stepping.

Semantics matched to the reference ``_step`` (rl.py:222-309):

* phase order choice -> core -> withdraw -> insert (NB: differs from the
  classical ``run()`` order, SURVEY.md §7 "hard parts");
* the action is a multi-hot vector over the FULL edge list; every active
  edge (u -> v) writes SELECTED_ROAD[u] = v (rl.py:224-231);
* reward = -(total agents on the network) (rl.py:266-267); the per-agent
  ``100 * 600 / travel_time`` bonus the reference computes and discards
  (rl.py:259-265) is returned in ``info`` for completeness;
* event-time clock: time only advances when the occupancy vector is
  unchanged from the previous step (rl.py:269-272);
* episode terminates past ``rl.episode_end`` (7 h; rl.py:273-276), reset
  rewinds to ``rl.episode_start`` (6 h - 60 s; rl.py:203).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import (
    DEFAULT_PHYSICS,
    DEFAULT_RL,
    DEFAULT_SIM,
    PhysicsConfig,
    RLConfig,
    SimConfig,
)
from ..core.direction import direction_step
from ..core.insert import insert_agents
from ..core.response import confirm_step
from ..core.withdraw import withdraw_agents
from ..network import Network
from ..routing.policies import ExternalChoice
from ..state import MetricState, SimState
from .observation import observe


class EnvState(NamedTuple):
    sim: SimState
    old_counts: jnp.ndarray  # int32[R] — previous occupancy (rl.py:179,269-272)
    done: jnp.ndarray        # bool[]
    # Carried potential Phi(s) for reward_mode="progress" (0.0 otherwise).
    # Phi is a PURE function of the state — with congested_potential the
    # distance-to-go is valued under the state's OWN congestion, so the
    # next step's Phi(s) must equal this step's Phi(s') (computing both
    # sides of a step under the pre-step cost table leaves inter-step
    # congestion revaluations un-charged, which rewards *causing* jams:
    # enter cheap, collect the road's inflated congested price on exit).
    phi: jnp.ndarray  # float32[]


class Observation(NamedTuple):
    """The composite observation spec (rl.py:140-166)."""

    node_features: jnp.ndarray  # float32[N, 7]
    edge_features: jnp.ndarray  # float32[Ef, 1]
    agent_index: jnp.ndarray    # int32[N]
    time: jnp.ndarray           # float32[1]


def fifo_potential(road, agents, dist_ff: jnp.ndarray,
                   free_flow: jnp.ndarray) -> jnp.ndarray:
    """Phi = sum over queued agents of ``fftt[r] + dist_ff[r, dest]`` — the
    free-flow time to finish the CURRENT road plus the shortest remaining
    distance to the destination.

    Used by ``reward_mode="progress"``: the per-step DECREASE of Phi is a
    dense potential-based shaping reward.  Including the occupied road's own
    fftt matters: the reward for traversing a road is then paid on LEAVING
    it (drop = fftt of the road just completed, on the shortest route), so
    under discounting slow roads are not preferred over staged fast hops —
    without the term, entering a slow-but-direct road collects the whole
    remaining distance up front and beats the faster multi-hop route.
    Ring-buffer aware: only logical slots ``(col - head) mod Nmax < count``
    count, and the sentinel agent 0 never contributes.
    """
    R, nmax = road.fifo_ids.shape
    col = jnp.arange(nmax, dtype=jnp.int32)[None, :]
    valid = ((col - road.head[:, None]) % nmax) < road.count[:, None]
    ids = jnp.where(valid, road.fifo_ids, 0)
    d = dist_ff[jnp.arange(R, dtype=jnp.int32)[:, None], agents.dest[ids]]
    d = d + free_flow[:, None]
    d = jnp.where(valid & (ids != 0) & (d < 1e17), d, 0.0)
    return jnp.sum(d)


def _observe(sim: SimState, network: Network,
             rl: RLConfig = DEFAULT_RL) -> Observation:
    nf, ef, _, ai = observe(sim, network, rl.observe_pending_entrants)
    return Observation(
        node_features=nf,
        edge_features=ef,
        agent_index=ai,
        time=sim.time.reshape(1),
    )


def _phi(road, agents, network, rl: RLConfig, physics: PhysicsConfig,
         dist_ff) -> jnp.ndarray:
    """Phi(s) as a pure state function (see EnvState.phi)."""
    if rl.congested_potential:
        from ..routing.bellman_ford import (
            all_pairs_next_hop_nbr,
            node_entry_costs,
            road_costs,
        )

        dist_tab, _ = all_pairs_next_hop_nbr(
            network.nbr, network.nbr_ok,
            node_entry_costs(road, network, physics),
        )
        own_cost = road_costs(road, network, physics)
    else:
        assert dist_ff is not None, 'reward_mode="progress" needs dist_ff'
        dist_tab = dist_ff
        own_cost = network.free_flow
    return fifo_potential(road, agents, dist_tab, own_cost)


def env_reset(
    sim_state: SimState,
    network: Network,
    rl: RLConfig = DEFAULT_RL,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    dist_ff: jnp.ndarray | None = None,
) -> tuple[EnvState, Observation]:
    """Rewind to the episode start (rl.py:186-219)."""
    from ..core.step import reset_sim_state

    sim = reset_sim_state(sim_state, rl.episode_start)
    phi0 = (
        _phi(sim.road, sim.agents, network, rl, physics, dist_ff)
        if rl.reward_mode == "progress" else jnp.zeros(())
    )
    env = EnvState(
        sim=sim,
        old_counts=sim.road.count,
        done=jnp.zeros((), bool),
        phi=phi0,
    )
    return env, _observe(sim, network, rl)


def env_step(
    env: EnvState,
    action: jnp.ndarray,  # bool[Ef] multi-hot over full edges
    network: Network,
    rl: RLConfig = DEFAULT_RL,
    sim_cfg: SimConfig = DEFAULT_SIM,
    physics: PhysicsConfig = DEFAULT_PHYSICS,
    dist_ff: jnp.ndarray | None = None,  # [N, N] for reward_mode="progress"
) -> tuple[EnvState, Observation, jnp.ndarray, jnp.ndarray, dict]:
    """One environment transition. Returns (env, obs, reward, done, info)."""
    sim = env.sim
    t = sim.time

    # --- choice: apply the action (rl.py:224-231) ---
    sim, _ = ExternalChoice(action)(sim, network)

    # Head agents before the core step — the candidates for the individual
    # reward (rl.py:243,259-265).  head_ids() yields the dummy 0 for empty
    # roads, and the dummy is never DONE, so no stale contribution.
    last_people = sim.road.head_ids()

    # --- core (rl.py:237) ---
    key, k_dir = jax.random.split(sim.key)
    road, road_delta_tt, accept, win_src = direction_step(
        sim.road, sim.selected_road, network, t, k_dir, physics,
        compute_delta=sim_cfg.record_road_optimality_hourly,
    )
    road, popped = confirm_step(road, accept, win_src, network)

    # --- withdraw (rl.py:243-248) ---
    road, agents, wcount = withdraw_agents(
        road, sim.agents, network, t, depth=sim_cfg.withdraw_depth,
        escalate=sim_cfg.withdraw_escalate,
    )
    withdrawn = wcount > 0

    # --- insert (rl.py:252-254) ---
    insert_ptr = sim.insert_ptr
    if sim_cfg.insert_window is not None:
        from ..core.insert import insert_agents_windowed

        road, agents, insert_ptr, _ = insert_agents_windowed(
            road, agents, sim.selected_road, network, t,
            sim.insert_order, sim.insert_ptr, sim_cfg.insert_window, physics,
            sorted_fast=sim_cfg.sorted_population,
            escalate=sim_cfg.insert_escalate,
        )
    else:
        road, agents = insert_agents(
            road, agents, sim.selected_road, network, t, physics
        )

    # --- reward (rl.py:256-267) ---
    new_counts = road.count
    arrived = agents.done[last_people]
    travel = agents.arrival[last_people] - agents.departure[last_people]
    individual_reward = jnp.sum(
        jnp.where(arrived & (travel > 0), 100.0 * 600.0 / jnp.maximum(travel, 1.0), 0.0)
    )
    phi_after = env.phi
    if rl.reward_mode == "individual":
        reward = individual_reward
    elif rl.reward_mode == "system":
        # -(agents in the system): the reference's -(on network) reward
        # (rl.py:266-267) PLUS agents past their departure time still waiting
        # to insert.  The pending term closes the reference reward's
        # stranding exploit (never inserting keeps its reward at 0 — the
        # return-maximizing policy under the event clock, docs/LEARNING.md)
        # and makes the total exactly TSTT in event-step units: the system
        # objective, with no potential machinery to game.
        # (the dummy agent 0's departure is forced past the horizon by the
        # population loader, so it never counts as pending)
        pending = jnp.sum(
            (agents.departure <= t) & (~agents.inserted)
        ).astype(jnp.float32)
        reward = -(jnp.sum(road.count).astype(jnp.float32)
                   + pending) / rl.progress_scale
    elif rl.reward_mode == "throughput":
        reward = jnp.sum(wcount).astype(jnp.float32)
    elif rl.reward_mode == "progress":
        # Classic potential-based shaping: r = Phi(s) - Phi(s'), with the
        # POST-insert state on the right so an entrant's potential is paid
        # up front — the entry-road choice is thereby penalized in
        # proportion to the route it commits the agent to (measuring
        # pre-insert instead makes total reward equal the entry potential,
        # i.e. REWARDS bad entry roads; trained policies then abandoned the
        # Braess shortcut).  Every delivering policy telescopes to the same
        # total; discounting orders them by delivery speed.  Phi(s) is the
        # carried env.phi so each state is valued exactly once (see
        # EnvState.phi for why this matters under congested_potential).
        phi_after = _phi(road, agents, network, rl, physics, dist_ff)
        reward = (env.phi - phi_after) / rl.progress_scale
    else:  # "on_network" — the reference's live reward
        reward = -jnp.sum(new_counts).astype(jnp.float32)

    # --- event-time clock (rl.py:269-272) ---
    unchanged = jnp.all(env.old_counts == new_counts)
    new_time = jnp.where(unchanged, t + sim_cfg.timestep, t)
    done = new_time > rl.episode_end

    # --- metric accumulators (rl.py:279-294 analogue) ---
    hour = jnp.clip((t / 3600.0).astype(jnp.int32), 0, sim_cfg.num_hours - 1)
    m = sim.metrics
    hourly = m.hourly_counts.at[hour].add((withdrawn | popped).astype(jnp.int32))
    delta_hourly = m.delta_tt_hourly
    if road_delta_tt.shape[0]:
        delta_hourly = delta_hourly.at[hour].add(road_delta_tt)
    on_way_total = jnp.sum(new_counts).astype(jnp.float32)
    done_total = m.done_before + jnp.sum(wcount).astype(jnp.float32)

    new_sim = sim._replace(
        road=road,
        agents=agents,
        time=new_time,
        key=key,
        insert_ptr=insert_ptr,
        metrics=MetricState(
            hourly_counts=hourly,
            on_way_before=on_way_total,
            done_before=done_total,
            delta_tt_hourly=delta_hourly,
        ),
    )
    new_env = EnvState(sim=new_sim, old_counts=new_counts, done=done,
                       phi=phi_after)
    info = {
        "individual_reward": individual_reward,
        "on_network": on_way_total,
        "arrivals": done_total - m.done_before,
    }
    return new_env, _observe(new_sim, network, rl), reward, done, info
