"""Scenario caching: ``save/<scenario>/{network,population}.npz``.

Replaces the reference's ``torch.save`` caches ``save/<scenario>/network.pt``
(transportation_simulator.py:230-267) and ``save/<scenario>/population.pt``
(agents/base.py:407-444) with portable ``.npz`` archives, keeping the same
load-or-rebuild-from-XML fallback flow.
"""
from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from ..network import Network
from ..state import AgentState
from ..schema import agent_features_matrix, agents_from_matrix

_NET_STATIC = ("num_roads", "num_intersections", "nmax")
# Static tuple fields (python ints, not traced arrays) — round-trip as int64
# arrays and restore to tuples on load.
_NET_STATIC_TUPLES = ("in_roll_shift_t", "out_roll_shift_t")
# Static bool fields — round-trip as 0/1 arrays, restore to python bool.
_NET_STATIC_BOOLS = ("renumbered",)

# Bump when the Network/AgentState array schema changes; mismatched caches
# are rebuilt from XML (the reference's torch.load would deserialize stale
# objects silently).
# v11: renumbered-build canonical slot order + static ``renumbered`` flag
# (core.rng canonical Gumbel addressing).
CACHE_VERSION = 13


def save_network(network: Network, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arrays = {"__version__": np.asarray(CACHE_VERSION)}
    for f in dataclasses.fields(network):
        v = getattr(network, f.name)
        if f.name in _NET_STATIC_TUPLES:
            arrays[f.name] = np.asarray(v, dtype=np.int64)
        elif f.name in _NET_STATIC_BOOLS:
            arrays[f.name] = np.asarray(int(v), dtype=np.int64)
        else:
            arrays[f.name] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_network_cache(path: str) -> Network:
    with np.load(path) as data:
        if int(data.get("__version__", -1)) != CACHE_VERSION:
            raise ValueError(f"stale network cache {path}")
        kwargs = {}
        for f in dataclasses.fields(Network):
            v = data[f.name]
            if f.name in _NET_STATIC:
                kwargs[f.name] = int(v)
            elif f.name in _NET_STATIC_TUPLES:
                kwargs[f.name] = tuple(int(x) for x in v)
            elif f.name in _NET_STATIC_BOOLS:
                kwargs[f.name] = bool(int(v))
            else:
                kwargs[f.name] = jnp.asarray(v)
    return Network(**kwargs)


def save_population(agents: AgentState, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(
        path,
        __version__=np.asarray(CACHE_VERSION),
        agent_features=np.asarray(agent_features_matrix(agents)),
    )


def load_population_cache(path: str) -> AgentState:
    with np.load(path) as data:
        if int(data.get("__version__", -1)) != CACHE_VERSION:
            raise ValueError(f"stale population cache {path}")
        return agents_from_matrix(data["agent_features"])


def save_sim_state(state, path: str) -> None:
    """Checkpoint a full :class:`~tarl_tpu.state.SimState` mid-episode.

    The reference can only pickle the graph tensor (``TransportationSimulator
    .save``, ts.py:763); here the complete world state — queues, agents,
    clock, PRNG key, metric accumulators, routing scratch — round-trips, so
    an 86,400-tick day can be resumed at any tick.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = _flatten_sim(state)
    np.savez_compressed(path, **{f"leaf_{i}": np.asarray(v)
                                 for i, v in enumerate(leaves)})


def load_sim_state(template, path: str):
    """Restore a SimState saved by :func:`save_sim_state`; ``template`` is a
    structurally identical state (e.g. from ``init_sim_state``)."""
    import jax

    leaves, treedef = _flatten_sim(template)
    with np.load(path) as data:
        new_leaves = [
            jnp.asarray(data[f"leaf_{i}"], dtype=leaf.dtype)
            for i, leaf in enumerate(leaves)
        ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _flatten_sim(state):
    import jax

    return jax.tree_util.tree_flatten(state)


def load_or_build_network(scenario: str, data_root: str = "data",
                          save_root: str = "save") -> Network:
    """Cache-or-XML network load (transportation_simulator.py:246-267)."""
    cache_path = os.path.join(save_root, scenario, "network.npz")
    if os.path.exists(cache_path):
        try:
            return load_network_cache(cache_path)
        except (ValueError, KeyError):
            print(f"♻️  | Stale cache {cache_path}; rebuilding from XML")
    from .matsim import load_network
    from .scenarios import ensure_scenario

    base = ensure_scenario(data_root, scenario)
    network = load_network(os.path.join(base, "network"))
    save_network(network, cache_path)
    return network


def load_or_build_population(scenario: str, data_root: str = "data",
                             save_root: str = "save") -> AgentState:
    """Cache-or-XML population load (agents/base.py:420-444)."""
    cache_path = os.path.join(save_root, scenario, "population.npz")
    if os.path.exists(cache_path):
        try:
            return load_population_cache(cache_path)
        except (ValueError, KeyError):
            print(f"♻️  | Stale cache {cache_path}; rebuilding from XML")
    from .matsim import load_population
    from .scenarios import ensure_scenario

    base = ensure_scenario(data_root, scenario)
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    save_population(agents, cache_path)
    return agents
