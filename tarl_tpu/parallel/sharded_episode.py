"""Spatially sharded simulation: roads and agents partitioned over the mesh.

The reference has no distributed execution (SURVEY.md §2.10); the TPU-native
scale-out for a *single huge scenario* (too many roads/agents for one chip)
shards the per-road ring buffers and the per-agent arrays across all devices
and lets XLA GSPMD insert the collectives implied by the cross-shard
references (edge gathers between road shards, agent-id gathers between the
road and agent shards).  No simulation code changes: the same
``core.step.run_episode`` program runs; only the *placement* of the state
arrays differs, which jit picks up from the argument shardings.

Sharding layout:

* RoadState leaves ``[R, ...]`` and MetricState ``[H, R]`` — road dim over
  the full mesh ``("dp", "sp")``;
* AgentState leaves and ``insert_order`` ``[A]`` — agent dim over the mesh;
* ``selected_road``, ``next_hop`` and scalars — replicated (SELECTED_ROAD is
  written by the choice segment-sample whose output indexing is global).

Both R and A must divide the device count; :func:`pad_agents` appends inert
dummy rows (departure past the horizon) to round A up.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..state import AgentState, SimState


def pad_agents(agents: AgentState, multiple: int) -> AgentState:
    """Append inert dummy agents so the population divides ``multiple``.

    Padding rows mirror the dummy agent row 0 (agents/base.py:131-133):
    departure far past any horizon, never ready, never DONE.
    """
    a = agents.num_agents
    target = ((a + multiple - 1) // multiple) * multiple
    pad = target - a
    if pad == 0:
        return agents

    def pad_leaf(leaf, fill):
        return jnp.concatenate(
            [leaf, jnp.full((pad,) + leaf.shape[1:], fill, dtype=leaf.dtype)]
        )

    return AgentState(
        origin=pad_leaf(agents.origin, 0),
        dest=pad_leaf(agents.dest, 0),
        departure=pad_leaf(agents.departure, 48 * 3600.0),
        arrival=pad_leaf(agents.arrival, 0.0),
        age=pad_leaf(agents.age, 0.0),
        sex=pad_leaf(agents.sex, 0.0),
        employed=pad_leaf(agents.employed, 0.0),
        inserted=pad_leaf(agents.inserted, False),
    )


def shard_sim_state(state: SimState, mesh: Mesh) -> SimState:
    """Place a SimState across the mesh with the layout above."""
    all_axes = P(("dp", "sp"))
    repl = NamedSharding(mesh, P())
    road_s = NamedSharding(mesh, all_axes)
    agent_s = NamedSharding(mesh, all_axes)
    hour_s = NamedSharding(mesh, P(None, ("dp", "sp")))

    road = jax.tree.map(
        lambda a: jax.device_put(a, road_s), state.road
    )
    agents = jax.tree.map(
        lambda a: jax.device_put(a, agent_s), state.agents
    )
    metrics = state.metrics._replace(
        hourly_counts=jax.device_put(state.metrics.hourly_counts, hour_s),
        on_way_before=jax.device_put(state.metrics.on_way_before, repl),
        done_before=jax.device_put(state.metrics.done_before, repl),
        delta_tt_hourly=jax.device_put(state.metrics.delta_tt_hourly, hour_s),
    )
    return state._replace(
        road=road,
        agents=agents,
        metrics=metrics,
        selected_road=jax.device_put(state.selected_road, repl),
        time=jax.device_put(state.time, repl),
        key=jax.device_put(state.key, repl),
        next_hop=jax.device_put(state.next_hop, repl),
        choice_count=jax.device_put(state.choice_count, repl),
        insert_order=jax.device_put(state.insert_order, agent_s),
        insert_ptr=jax.device_put(state.insert_ptr, repl),
        sel_dest=None if state.sel_dest is None else jax.device_put(
            state.sel_dest, repl
        ),
    )


def run_episode_sharded(state, network, policy, num_steps, mesh, **kw):
    """Shard the state and run the standard fused episode under the mesh.

    The jitted ``run_episode`` specializes on the argument shardings; GSPMD
    partitions every tick kernel and inserts the edge-halo collectives.
    """
    from ..core.step import run_episode

    sharded = shard_sim_state(state, mesh)
    with mesh:
        return run_episode(sharded, network, policy, num_steps, **kw)
