"""Column-index schemas and packed-view compatibility layer.

The reference encodes the whole world state into one flat float matrix
``x[N, 3*Nmax+7]`` whose columns are documented by ``FeatureHelpers``
(reference: feature_helpers.py:1-93).  The TPU build keeps native
structure-of-arrays state (see :mod:`tarl_tpu.state`) because ring-buffer
FIFOs and typed columns map far better onto XLA, but this module preserves

* the exact column maps (``FeatureHelpers`` / ``AgentFeatureHelpers`` /
  ``ObservationFeatureHelpers``) so downstream code and tests can speak the
  reference's language, and
* ``pack_state`` / ``unpack_state`` converters producing/consuming the
  reference's packed matrix for golden tests and interop.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FeatureHelpers:
    """Column map of the packed road-node feature row.

    Mirrors reference feature_helpers.py:38-54.  Note the reference declares
    ``NODE_TYPE = 3*Nmax+7`` which is out of bounds of the allocated width
    ``3*Nmax+7`` (transportation_simulator.py:135) and never used; we keep the
    attribute for API parity but it must not be indexed.
    """

    Nmax: int = 100

    @property
    def AGENT_POSITION(self) -> slice:
        return slice(0, self.Nmax)

    @property
    def AGENT_TIME_ARRIVAL(self) -> slice:
        return slice(self.Nmax, 2 * self.Nmax)

    @property
    def AGENT_TIME_DEPARTURE(self) -> slice:
        return slice(2 * self.Nmax, 3 * self.Nmax)

    @property
    def MAX_NUMBER_OF_AGENT(self) -> int:
        return 3 * self.Nmax

    @property
    def NUMBER_OF_AGENT(self) -> int:
        return 3 * self.Nmax + 1

    @property
    def FREE_FLOW_TIME_TRAVEL(self) -> int:
        return 3 * self.Nmax + 2

    @property
    def LENGHT_OF_ROAD(self) -> int:  # [sic] reference spelling, feature_helpers.py:46
        return 3 * self.Nmax + 3

    @property
    def MAX_FLOW(self) -> int:
        return 3 * self.Nmax + 4

    @property
    def SELECTED_ROAD(self) -> int:
        return 3 * self.Nmax + 5

    @property
    def ROAD_INDEX(self) -> int:
        return 3 * self.Nmax + 6

    @property
    def NODE_TYPE(self) -> int:  # declared-but-unused in the reference
        return 3 * self.Nmax + 7

    HEAD_FIFO: int = 0

    @property
    def HEAD_FIFO_ARRIVAL_TIME(self) -> int:
        return self.Nmax

    @property
    def HEAD_FIFO_DEPARTURE_TIME(self) -> int:
        return 2 * self.Nmax

    CONGESTION_FILE: int = 3

    @property
    def width(self) -> int:
        return 3 * self.Nmax + 7


class AgentFeatureHelpers:
    """Agent row column map (reference: feature_helpers.py:56-71)."""

    ORIGIN = 0
    DESTINATION = 1
    DEPARTURE_TIME = 2
    ARRIVAL_TIME = 3
    AGE = 4
    SEX = 5
    EMPLOYMENT_STATUS = 6
    ON_WAY = 7
    DONE = 8

    def __len__(self) -> int:
        return 9


class ObservationFeatureHelpers:
    """Observation column map (reference: feature_helpers.py:74-93)."""

    MAX_NUMBER_OF_AGENT = 0
    NUMBER_OF_AGENT = 1
    FREE_FLOW_TIME_TRAVEL = 2
    LENGHT_OF_ROAD = 3
    MAX_FLOW = 4
    SELECTED_ROAD = 5
    ROAD_INDEX = 6
    ORIGIN = 7
    DESTINATION = 8
    DEPARTURE_TIME = 9
    ARRIVAL_TIME = 10
    AGE = 11
    SEX = 12
    EMPLOYMENT_STATUS = 13
    ON_WAY = 14
    DONE = 15


def pack_state(road_state, network, selected_road) -> jnp.ndarray:
    """Materialize the reference's packed ``x[N, 3*Nmax+7]`` matrix.

    Logical FIFO order (slot 0 = head) is reconstructed from the ring buffer.
    SRC/DEST rows carry the reference's neutral feature: all zeros except
    ``ROAD_INDEX = -1`` (transportation_simulator.py:139-147) and their
    sampled ``SELECTED_ROAD``.
    """
    R, Nmax = road_state.fifo_ids.shape
    N = network.num_nodes
    h = FeatureHelpers(Nmax=Nmax)
    x = jnp.zeros((N, h.width), dtype=jnp.float32)

    logical = (road_state.head[:, None] + jnp.arange(Nmax)[None, :]) % Nmax
    live = jnp.arange(Nmax)[None, :] < road_state.count[:, None]
    ids = jnp.where(live, jnp.take_along_axis(road_state.fifo_ids, logical, axis=1), 0)
    arr = jnp.where(live, jnp.take_along_axis(road_state.fifo_arrival, logical, axis=1), 0.0)
    dep = jnp.where(live, jnp.take_along_axis(road_state.fifo_departure, logical, axis=1), 0.0)

    x = x.at[:R, h.AGENT_POSITION].set(ids.astype(jnp.float32))
    x = x.at[:R, h.AGENT_TIME_ARRIVAL].set(arr)
    x = x.at[:R, h.AGENT_TIME_DEPARTURE].set(dep)
    x = x.at[:R, h.MAX_NUMBER_OF_AGENT].set(network.capacity.astype(jnp.float32))
    x = x.at[:R, h.NUMBER_OF_AGENT].set(road_state.count.astype(jnp.float32))
    x = x.at[:R, h.FREE_FLOW_TIME_TRAVEL].set(network.free_flow)
    x = x.at[:R, h.LENGHT_OF_ROAD].set(network.length)
    x = x.at[:R, h.MAX_FLOW].set(network.max_flow)
    x = x.at[:, h.SELECTED_ROAD].set(selected_road.astype(jnp.float32))
    road_index = jnp.concatenate(
        [jnp.arange(R, dtype=jnp.float32), -jnp.ones(N - R, dtype=jnp.float32)]
    )
    x = x.at[:, h.ROAD_INDEX].set(road_index)
    return x


def agent_features_matrix(agents) -> jnp.ndarray:
    """Materialize the reference's ``agent_features [A, 9]`` float matrix
    (reference: agents/base.py:212)."""
    return jnp.stack(
        [
            agents.origin.astype(jnp.float32),
            agents.dest.astype(jnp.float32),
            agents.departure,
            agents.arrival,
            agents.age,
            agents.sex,
            agents.employed,
            agents.on_way.astype(jnp.float32),
            agents.done.astype(jnp.float32),
        ],
        axis=1,
    )


def agents_from_matrix(mat):
    """Build an :class:`~tarl_tpu.state.AgentState` from a reference-format
    ``[A, 9]`` matrix (numpy or jax)."""
    from .state import AgentState

    mat = jnp.asarray(mat, dtype=jnp.float32)
    return AgentState(
        origin=mat[:, AgentFeatureHelpers.ORIGIN].astype(jnp.int32),
        dest=mat[:, AgentFeatureHelpers.DESTINATION].astype(jnp.int32),
        departure=mat[:, AgentFeatureHelpers.DEPARTURE_TIME],
        arrival=mat[:, AgentFeatureHelpers.ARRIVAL_TIME],
        age=mat[:, AgentFeatureHelpers.AGE],
        sex=mat[:, AgentFeatureHelpers.SEX],
        employed=mat[:, AgentFeatureHelpers.EMPLOYMENT_STATUS],
        # ON_WAY/DONE are derived views in AgentState (done = arrival > 0,
        # on_way = inserted & ~done); reconstruct the backing flag.
        inserted=(mat[:, AgentFeatureHelpers.ON_WAY] > 0)
        | (mat[:, AgentFeatureHelpers.DONE] > 0),
    )
