"""Device-resident simulation state as typed pytrees.

The reference mutates one packed float matrix ``x[N, 3*Nmax+7]`` in place
(feature_helpers.py:1-54, transportation_simulator.py:135) and pops FIFO heads
by shifting every queue left (response_mpnn.py:110-122, agents/base.py:377-396)
— O(R*Nmax) memory traffic per tick.  The TPU-native redesign keeps

* a structure-of-arrays :class:`RoadState` whose FIFOs are **ring buffers**
  (``head`` pointer + ``count``): pushes/pops are pointer arithmetic plus a
  single scatter, never a shift;
* a typed :class:`AgentState` (columns of the reference's
  ``agent_features [A, 9]``, agents/base.py:212) so integer ids stay int32;
* a :class:`SimState` pytree carried through ``lax.scan`` with on-device
  metric accumulators replacing the reference's host-side event lists
  (response_mpnn.py:125, agents/base.py:402).

All arrays are static-shaped; every function touching them is pure.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RoadState(NamedTuple):
    """Per-road FIFO queues as ring buffers.

    Logical slot ``j`` of road ``r`` lives at physical column
    ``(head[r] + j) % Nmax``.  Slot 0 is the FIFO head.  Agent id 0 is the
    reference's sentinel non-agent (direction_mpnn.py:194).
    """

    fifo_ids: jnp.ndarray        # int32[R, Nmax]
    fifo_arrival: jnp.ndarray    # float32[R, Nmax] — tick the agent entered the road
    fifo_departure: jnp.ndarray  # float32[R, Nmax] — earliest tick it may leave
    # Denormalized copy of each queued agent's DEST node, stamped at insert
    # and carried along on transfer: withdraw's eligibility scan then reads
    # it with the same masked row-reductions as the other ring slices instead
    # of K unsorted agents.dest[...] gathers (~7 ns/element on TPU's serial
    # gather emitter — the dest lookups alone cost ~0.7 ms/tick at Grid64x64).
    fifo_dest: jnp.ndarray       # int32[R, Nmax]
    head: jnp.ndarray            # int32[R] — physical index of logical slot 0
    count: jnp.ndarray           # int32[R] — number of agents on the road

    @property
    def num_roads(self) -> int:
        return self.fifo_ids.shape[0]

    @property
    def nmax(self) -> int:
        return self.fifo_ids.shape[1]

    def _row_at(self, arr: jnp.ndarray, phys: jnp.ndarray) -> jnp.ndarray:
        """``arr[r, phys[r]]`` as a masked row-reduction, NOT a gather.

        TPU gathers with per-row dynamic columns hit XLA's serial emitter
        (~7 ns/element — ~220 us for one [R] read at Grid64x64, measured);
        the equivalent select+sum over the small Nmax axis is a fused
        elementwise pass (core.direction's performance note).
        """
        col = jnp.arange(self.nmax, dtype=jnp.int32)[None, :]
        zero = jnp.zeros((), arr.dtype)
        return jnp.where(col == phys[:, None], arr, zero).sum(axis=1)

    def head_ids(self) -> jnp.ndarray:
        """Agent id at each FIFO head (reference: HEAD_FIFO column).

        Empty roads return the dummy sentinel 0.  The reference's shift-based
        FIFO zero-fills popped slots, so every consumer (gridlock mask, RL
        observation, individual reward, next-hop lookup) relies on "empty
        head == agent 0"; the ring buffer must preserve that invariant
        explicitly because popped slots keep their stale contents.
        """
        raw = self._row_at(self.fifo_ids, self.head)
        return jnp.where(self.count > 0, raw, 0)

    def head_arrival(self) -> jnp.ndarray:
        """Arrival time of each head agent; 0 for empty roads (see head_ids)."""
        raw = self._row_at(self.fifo_arrival, self.head)
        return jnp.where(self.count > 0, raw, 0.0)

    def head_departure(self) -> jnp.ndarray:
        """Departure time of each head agent; 0 for empty roads (see head_ids)."""
        raw = self._row_at(self.fifo_departure, self.head)
        return jnp.where(self.count > 0, raw, 0.0)

    def head_dests(self) -> jnp.ndarray:
        """DEST node of each head agent; 0 for empty roads (see head_ids)."""
        raw = self._row_at(self.fifo_dest, self.head)
        return jnp.where(self.count > 0, raw, 0)

    def tail_ids(self) -> jnp.ndarray:
        """Agent id at each FIFO tail (last pushed; response_mpnn.py:72-77).

        Roads with empty queues return the id stored at the head slot, which
        callers must gate on ``count > 0`` exactly as the reference does.
        """
        tail = (self.head + jnp.maximum(self.count - 1, 0)) % self.nmax
        return self._row_at(self.fifo_ids, tail)

    def logical_view(self):
        """(ids, arrival, departure) re-ordered so column 0 is the head —
        the layout of the reference's AGENT_* slices."""
        logical = (self.head[:, None] + jnp.arange(self.nmax)[None, :]) % self.nmax
        return (
            jnp.take_along_axis(self.fifo_ids, logical, axis=1),
            jnp.take_along_axis(self.fifo_arrival, logical, axis=1),
            jnp.take_along_axis(self.fifo_departure, logical, axis=1),
        )


def init_road_state(num_roads: int, nmax: int) -> RoadState:
    return RoadState(
        fifo_ids=jnp.zeros((num_roads, nmax), dtype=jnp.int32),
        fifo_arrival=jnp.zeros((num_roads, nmax), dtype=jnp.float32),
        fifo_departure=jnp.zeros((num_roads, nmax), dtype=jnp.float32),
        fifo_dest=jnp.zeros((num_roads, nmax), dtype=jnp.int32),
        head=jnp.zeros((num_roads,), dtype=jnp.int32),
        count=jnp.zeros((num_roads,), dtype=jnp.int32),
    )


class AgentState(NamedTuple):
    """Typed columns of the reference's ``agent_features [A, 9]`` tensor
    (feature_helpers.py:56-71, agents/base.py:212).  Row 0 is the dummy agent
    whose departure is forced past the horizon (agents/base.py:443-444).

    The reference's ON_WAY / DONE columns are DERIVED VIEWS here (withdraw
    then scatters ONE array instead of three — it is the largest tick phase
    on TPU): ``inserted`` is set once at insertion and never cleared,
    ``arrival`` is stamped at withdrawal, and

    * ``done  = arrival > 0``  (arrival is only ever stamped on completion);
    * ``on_way = inserted & ~done``.
    """

    origin: jnp.ndarray     # int32[A] — SRC node index of the origin intersection
    dest: jnp.ndarray       # int32[A] — DEST node index of the destination
    departure: jnp.ndarray  # float32[A] — scheduled departure (s)
    arrival: jnp.ndarray    # float32[A] — realized arrival (s), 0 until DONE
    age: jnp.ndarray        # float32[A]
    sex: jnp.ndarray        # float32[A] — 1.0 = female
    employed: jnp.ndarray   # float32[A]
    inserted: jnp.ndarray   # bool[A] — ever placed on the network

    @property
    def num_agents(self) -> int:
        return self.origin.shape[0]

    @property
    def done(self) -> jnp.ndarray:
        """DONE column (feature_helpers.py:70): trip completed."""
        return self.arrival > 0.0

    @property
    def on_way(self) -> jnp.ndarray:
        """ON_WAY column (feature_helpers.py:69): currently on the network."""
        return self.inserted & (self.arrival <= 0.0)


def sort_agents_by_departure(agents: "AgentState") -> "AgentState":
    """Relabel agents 1..A-1 into nondecreasing departure order (stable).

    The dummy sentinel keeps id 0 (its departure is forced past the horizon
    by the population loader, so it sorts last anyway and is never
    windowed).  With the relabeled population, ``SimConfig.
    sorted_population`` activates the gather-free windowed-insert fast path
    (core.insert).  The simulation is the unsorted one up to the agent-id
    permutation (ids only name rows; admission order within a tick is
    departure order either way).
    """
    import numpy as np

    dep = np.asarray(agents.departure)
    perm = np.concatenate(
        [[0], 1 + np.argsort(dep[1:], kind="stable")]
    ).astype(np.int32)
    take = lambda a: jnp.asarray(np.asarray(a)[perm])  # noqa: E731
    return AgentState(
        origin=take(agents.origin),
        dest=take(agents.dest),
        departure=take(agents.departure),
        arrival=take(agents.arrival),
        age=take(agents.age),
        sex=take(agents.sex),
        employed=take(agents.employed),
        inserted=take(agents.inserted),
    )


def init_agent_state(
    origin, dest, departure, age=None, sex=None, employed=None
) -> AgentState:
    origin = jnp.asarray(origin, dtype=jnp.int32)
    n = origin.shape[0]
    zeros = jnp.zeros((n,), dtype=jnp.float32)
    return AgentState(
        origin=origin,
        dest=jnp.asarray(dest, dtype=jnp.int32),
        departure=jnp.asarray(departure, dtype=jnp.float32),
        arrival=zeros,
        age=zeros if age is None else jnp.asarray(age, jnp.float32),
        sex=zeros if sex is None else jnp.asarray(sex, jnp.float32),
        employed=zeros if employed is None else jnp.asarray(employed, jnp.float32),
        inserted=jnp.zeros((n,), dtype=bool),
    )


class BacklogState(NamedTuple):
    """Per-SRC ring queues of DUE-but-capacity-blocked insertion candidates
    (core.insert.insert_agents_backlogged).

    The reference re-scans the whole population every tick, so an agent
    blocked by a full entry road keeps re-bidding — with a fresh
    ``SELECTED_ROAD`` read — until admitted (agents/base.py:247-299).  The
    windowed insert reproduces those semantics by pinning its pointer on
    blocked agents and escalating over them, which at a demand-OVERSATURATED
    peak (the official bench holds ~35k due-but-blocked agents by hour two)
    degenerates to ~15 full window passes per tick.

    The structural fact that makes an efficient exact carry possible: with
    the reference's entry rule ``entry = SELECTED_ROAD[origin]``, a road can
    only ever be bid by its tail intersection's SRC node (the SRC's choice
    edges are exactly that intersection's outgoing roads), and every blocked
    agent at one SRC bids the SAME road each tick.  So EVERY due agent flows
    through one FIFO ring per SRC, in ascending-id (= departure) order:

    * the per-tick re-bid of the WHOLE backlog costs one ``selected_road``
      row read per SRC — no per-agent gathers;
    * admission rank within a road IS the queue position — no rank
      computation;
    * a drain pass pops ``min(qcount, remaining)`` from each queue front
      into the road FIFO — a handful of [S]-indexed scatters.

    Queue ids per SRC ascend (appends come from the monotone departure
    frontier), so queue order = the reference's stable candidate order.
    """

    # (agent id, DEST node) interleaved in one array so the drain's peek is
    # ONE take_along_axis and the append is ONE scatter (the insert phase is
    # launch-bound; every merged op is ~4 us/tick on the v5e).
    qpack: jnp.ndarray   # int32[S, Q, 2] — ring; id 0 = empty slot
    qhead: jnp.ndarray   # int32[S] — physical index of the queue front
    qcount: jnp.ndarray  # int32[S]

    @property
    def capacity(self) -> int:
        """Per-SRC queue depth Q."""
        return self.qpack.shape[1]

    @property
    def qids(self) -> jnp.ndarray:
        return self.qpack[..., 0]

    @property
    def qdest(self) -> jnp.ndarray:
        return self.qpack[..., 1]


def init_backlog_state(capacity: int, num_agents: int,
                       num_srcs: int) -> BacklogState:
    del num_agents  # shape-free since the frontier design (kept for API)
    return BacklogState(
        qpack=jnp.zeros((num_srcs, capacity, 2), dtype=jnp.int32),
        qhead=jnp.zeros((num_srcs,), dtype=jnp.int32),
        qcount=jnp.zeros((num_srcs,), dtype=jnp.int32),
    )


class MetricState(NamedTuple):
    """On-device metric accumulators.

    Replaces the reference's host-side ``update_history`` /
    ``withdraw_history`` event lists (response_mpnn.py:125, agents/base.py:402)
    with an ``[H, R]`` hourly traffic-count matrix — the only statistic those
    lists are ever reduced to (transportation_simulator.py:563-746).
    """

    hourly_counts: jnp.ndarray  # int32[H, R] — link traversals per hour
    on_way_before: jnp.ndarray  # float32[] — previous-tick totals for the
    done_before: jnp.ndarray    # float32[]   leg histogram deltas (ts.py:344-349)
    # Hourly-binned congestion delay (sum over ticks of the per-road
    # clamp(travel - fftt, 0) series, direction_mpnn.py:94-96) — keeps the
    # road-optimality artifact O(H*R) for full-day runs where the per-tick
    # [T, R] series is unaffordable.
    delta_tt_hourly: jnp.ndarray  # float32[H, R]


def init_metric_state(num_roads: int, num_hours: int) -> MetricState:
    return MetricState(
        hourly_counts=jnp.zeros((num_hours, num_roads), dtype=jnp.int32),
        on_way_before=jnp.zeros((), dtype=jnp.float32),
        done_before=jnp.zeros((), dtype=jnp.float32),
        delta_tt_hourly=jnp.zeros((num_hours, num_roads), dtype=jnp.float32),
    )


class SimState(NamedTuple):
    """Complete per-tick carry for the episode ``lax.scan``."""

    road: RoadState
    agents: AgentState
    selected_road: jnp.ndarray  # int32[N] — SELECTED_ROAD per node (roads + SRC/DEST)
    time: jnp.ndarray           # float32[] — seconds since midnight
    key: jax.Array              # PRNG key
    metrics: MetricState
    # Routing scratch: dense next-hop table refreshed every k ticks by the
    # shortest-path policy (reference: agents/base.py:560-570).  A [1,1]
    # placeholder when the active policy does not need it.
    next_hop: jnp.ndarray       # int32[N, N] or int32[1, 1]
    choice_count: jnp.ndarray   # int32[] — ticks since policy refresh (base.py:524)
    # Windowed-insertion scratch (core.insert.insert_agents_windowed):
    # departure-sorted agent order and the moving pending pointer.
    insert_order: jnp.ndarray   # int32[A]
    insert_ptr: jnp.ndarray     # int32[]
    # Persistent blocked-candidate set (SimConfig.insert_backlog); None when
    # the feature is off.
    backlog: BacklogState | None = None
    # Incremental shortest-path lookup scratch (routing.policies): the head
    # DEST each road's SELECTED_ROAD was last computed for.  sel is a pure
    # function of (routing table, head dest), so per tick only roads whose
    # head dest changed need the table gathers — at metro scale those
    # unsorted [R] gathers are the whole lookup cost (Grid256: 6.1 of
    # 11.7 ms/tick).  int32[R]; a [1] placeholder when unused; -1 = stale
    # (forces recomputation).
    sel_dest: jnp.ndarray | None = None


class TickLog(NamedTuple):
    """Per-tick scan outputs (the reference's per-tick appends,
    transportation_simulator.py:344-351)."""

    departures: jnp.ndarray       # float32[] — newly departed this tick
    arrivals: jnp.ndarray         # float32[] — newly arrived this tick
    on_way: jnp.ndarray           # float32[] — agents currently en route
    time: jnp.ndarray             # float32[]
    road_delta_tt: jnp.ndarray    # float32[R] or float32[0] — congestion delay
    # Windowed-insertion overflow monitor.  With insert escalation (the
    # SimConfig.insert_escalate default) the run is ALWAYS outcome-identical
    # to the unbounded whole-population scan and this counts the EXTRA
    # window passes the tick needed (0.0 = the base window sufficed).
    # Without escalation: 1.0 on ticks where the insert window's TAIL agent
    # was already due, i.e. due agents may extend past the window and the
    # bounded-entry deviation from the reference's all-at-once scan
    # (core.insert.insert_agents_windowed) is ACTIVE — all-zero means the
    # windowed run is outcome-identical to exact insert.  0.0 always under
    # exact (window=None) insertion.
    window_saturated: jnp.ndarray  # float32[]
