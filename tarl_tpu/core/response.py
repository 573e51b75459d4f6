"""Response step: confirm accepted transfers and pop upstream heads.

TPU-native rewrite of ``ResponseMPNN`` (reference: response_mpnn.py:6-139),
the second half of the two-phase commit.

Documented deviation (bug fix): the reference confirms a transfer on edge
(u -> v) iff v's FIFO *tail* now holds the agent that was u's FIFO *head*
(response_mpnn.py:62-80).  That check DOUBLE-FIRES on opposing road pairs:
when agent a transfers u -> v onto an empty v, v's head *and* tail become a
while u still shows a at its head (the pop hasn't happened yet), so the
reverse edge (v -> u) also "confirms" — v pops the agent it just received
and a vanishes from the network (count decremented, agent still ON_WAY).
The direction step knows exactly which upstream won each road's Gumbel-max,
so :func:`confirm_step` pops precisely those winners — the true positives
of the reference's check and nothing else.  :func:`response_step` keeps the
reference's tail==head formulation for parity tests.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..network import Network
from ..ops.segment import segment_max
from ..state import RoadState


def confirm_step(
    road: RoadState,
    accept: jnp.ndarray,
    win_src: jnp.ndarray,
    network: Network | None = None,
) -> tuple[RoadState, jnp.ndarray]:
    """Pop the head of every road that won a transfer this step.

    ``accept[R]`` / ``win_src[R]`` come from ``direction_step``; each
    upstream can win at most once per step (its head proposes to a single
    selected downstream), so the pop mask is one [R]-index scatter — measured
    cheaper than the gather-based alternative (checking each road's
    downstream neighbors' winners costs 2*KOUT unsorted [R] gathers at
    ~7 ns/element each, ~8x the single scatter).  At metro scale, when the
    network carries an out-table roll plan (core.roll_gather), the winner
    check is instead evaluated GATHER-FREE: roll ``win_src`` to each
    out-slot row and compare against the road's own index — the scatter's
    ~7 ns/index serial emitter is replaced by a few full-bandwidth
    dynamic-slices.  Bitwise-identical pop mask either way.
    Returns ``(road_state, popped_mask)`` like :func:`response_step`.
    """
    R = road.num_roads
    pop_src = jnp.where(accept, win_src, R)
    from .roll_gather import roll_enabled, MIN_ROADS

    use_roll = network is not None and roll_enabled(
        getattr(network, "out_roll_shift", None)
    ) and R >= MIN_ROADS  # below: the single scatter wins (launch-bound)
    if use_roll:
        from .roll_gather import roll_gather

        win_rows = roll_gather(
            pop_src[None, :].astype(jnp.int32), network.out_roll_shift,
            network.out_roll_sel, network.out_roll_exc_src,
            network.out_roll_exc_k, network.out_roll_exc_v,
        )[:, 0]  # [KOUT, R] — win_src at each road's k-th downstream
        iota = jnp.arange(R, dtype=jnp.int32)
        popped = jnp.zeros((R,), bool)
        for k in range(win_rows.shape[0]):
            popped = popped | (
                network.out_edge_ok[k] & (win_rows[k] == iota)
            )
    else:
        # int32 staging: TPU bool scatters run ~7x slower (measured).
        popped = jnp.zeros((R,), jnp.int32).at[pop_src].set(1, mode="drop") > 0
    new_head = (road.head + popped.astype(jnp.int32)) % road.nmax
    new_count = road.count - popped.astype(jnp.int32)
    return road._replace(head=new_head, count=new_count), popped


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
