"""Response step: confirm accepted transfers and pop upstream heads.

TPU-native rewrite of ``ResponseMPNN`` (reference: response_mpnn.py:6-139),
the second half of the two-phase commit: for each turn edge (u -> v), the
transfer proposed by the direction step was accepted iff v's FIFO *tail* now
holds the agent that was u's FIFO *head* (response_mpnn.py:62-80).  Upstream
roads with any accepted outgoing edge pop their head (the reference's
``aggr='max'`` reverse-flow aggregation + shift-left update,
response_mpnn.py:21,103-122) — here a single head-pointer advance.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..network import Network
from ..ops.segment import segment_max
from ..state import RoadState


def response_step(
    road: RoadState, network: Network
) -> tuple[RoadState, jnp.ndarray]:
    """Returns ``(road_state, popped_mask)`` where ``popped_mask[R]`` is the
    per-road update mask the reference appends to ``update_history``
    (response_mpnn.py:125) — the raw series behind the hourly traffic counts.
    """
    R = road.num_roads
    u = network.edge_src
    v = network.edge_dst

    head_id = road.head_ids()
    tail_id = road.tail_ids()
    has_up = road.count[u] > 0
    has_dn = road.count[v] > 0
    accepted = has_up & has_dn & (tail_id[v] == head_id[u])

    # float32 so the reduction routes through the Pallas segment kernel on TPU
    popped = segment_max(accepted.astype(jnp.float32), u, R) > 0.0

    new_head = (road.head + popped.astype(jnp.int32)) % road.nmax
    new_count = road.count - popped.astype(jnp.int32)
    return road._replace(head=new_head, count=new_count), popped
