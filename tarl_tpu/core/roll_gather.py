"""Structured slot-table gathers as rolls: the direction step's last gather.

The slot-major core (core.direction, docstring there) reduced every per-edge
quantity to [R]-rows, leaving ONE runtime gather: ``pack[in_src_tab]`` — a
[KIN*R]-element read with road-id indices.  XLA:TPU lowers arbitrary-index
gathers to a serial emitter at ~7 ns/element (docs/BENCH.md), so at metro
scale this single op costs more than all the elementwise work of the tick
(Grid64x64: 64.5k indices ~ 450 us).

But the indices are STRUCTURED: ``in_src_tab[k, v] - v`` takes very few
distinct values on road networks (a 64x64 grid: ~5 offsets cover >98 % of
each slot row — same observation as routing.bellman_ford.primal_delta_buckets
for the primal sweep).  A fixed-offset read is a roll: with the source
doubled once (``concat(mat, mat)``), ``val[v] = mat[(v + o) % R]`` is ONE
``dynamic_slice`` — an index-free, full-bandwidth copy.  This module

* analyses a slot table host-side into a ROLL PLAN — per slot, the dominant
  mod-R offsets plus an exception list for the tail (build_roll_plan);
* evaluates the gather as B dynamic-slices + selects per slot and one tiny
  exception gather/scatter (roll_gather), bitwise-identical to the direct
  gather.

The plan is stored on :class:`~tarl_tpu.network.Network` as plain array
fields (``in_roll_*``) so it rides through jit/cache like every other slot
table; a ``[K, 0]``-shaped shift array means "declined" (irregular topology
or small R) and callers fall back to the direct gather.

Reference parity: this changes no semantics — it is an evaluation strategy
for the same ``message`` gather of direction_mpnn.py:44-100.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
from jax import lax


def roll_enabled(shift) -> bool:
    """Trace-time gate: a built plan (``B > 0``) that is not disabled by the
    ``TARL_NO_ROLL=1`` env override (A/B measurement switch — the fallback
    is the direct gather/scatter, bitwise-identical)."""
    return (
        shift is not None
        and shift.shape[-1] > 0
        and os.environ.get("TARL_NO_ROLL", "0") == "0"
    )

# Networks below this road count keep the direct gather: the roll path costs
# ~K*B extra ops, which beats the serial gather emitter only once the gather
# is tens of thousands of indices (measured: Grid16x16/R=960 gathers ~45 us
# total — smaller than the op-launch overhead of ~20 rolls).
MIN_ROADS = 8192

# Measured v5e cost constants (CLAUDE.md "slot-major core redesign"): the
# serial gather/scatter emitter runs ~7 ns/index; one roll bucket costs one
# dynamic-slice + select over the [K, C, R] stack — launch-bound at ~8 us
# regardless of width at these sizes.  A plan therefore beats the direct
# gather whenever  B * _ROLL_NS + E_exc * _IDX_NS  <  margin * E * _IDX_NS,
# which on irregular (real-city) meshes admits exception tails far beyond
# the few-percent budget grids need (a Delaunay street mesh concentrates
# only ~65-78 % of its turn edges on 24 Hilbert-order offsets — still a
# 2-3x win over gathering every entry).
_IDX_NS = 7.0
_ROLL_NS = 8000.0
_COST_MARGIN = 0.9


def roll_cost_budget(num_entries: int, num_buckets: int) -> int:
    """Max exception count at which a ``num_buckets``-roll plan still beats
    the direct gather of ``num_entries`` indices under the measured cost
    model (0 when the rolls alone already cost more)."""
    budget = (_COST_MARGIN * num_entries
              - num_buckets * (_ROLL_NS / _IDX_NS))
    return max(int(budget), 0)



def build_roll_plan(
    tab: np.ndarray,
    ok: np.ndarray,
    *,
    max_buckets: int = 24,
    max_exc_frac: float = 0.02,
    min_roads: int = MIN_ROADS,
    min_count: int | None = None,
):
    """Host-side analysis of a ``[K, R]`` slot table of road indices.

    Buckets are GLOBAL (shared across slots): slots of a road network reuse
    the same handful of offsets (a 64x64 grid: 17 distinct across 4 slots),
    so one roll serves every slot that needs that offset and no (slot,
    bucket) pair is dead.  Returns ``(shift[B] int32, sel[K, R] int32,
    exc_src[E] int32, exc_k[E] int32, exc_v[E] int32)`` where ``tab[k, v]
    == (v + shift[sel[k, v]]) % R`` whenever ``sel[k, v] < B``, and the
    ``E`` exceptions (``sel == B``) enumerate the remaining valid entries.
    Declines — returns a ``B == 0`` plan — when ``R < min_roads`` or the
    exception tail exceeds ``max_exc_frac`` of the table (irregular
    topologies, where the roll formulation would degenerate to per-entry
    fixups).
    """
    tab = np.asarray(tab)
    ok = np.asarray(ok).astype(bool)
    K, R = tab.shape

    def _decline():
        return (
            np.zeros((0,), np.int32),
            np.zeros((K, R), np.int32),
            np.zeros((0,), np.int32),
            np.zeros((0,), np.int32),
            np.zeros((0,), np.int32),
        )

    if R < min_roads:
        return _decline()

    iota = np.arange(R, dtype=np.int64)
    off = (tab.astype(np.int64) - iota[None, :]) % R  # mod-R: wraps covered

    offs, cnts = np.unique(off[ok], return_counts=True)
    order = np.argsort(-cnts, kind="stable")
    # A bucket costs one full-width roll + select regardless of how many
    # entries it covers; below ~0.2 % of the table the exception gather
    # (~7 ns/index, SMALL index count) is cheaper than the roll, so
    # low-yield offsets fall to the exception tail instead.
    floor = max(64, int(ok.sum()) // 512) if min_count is None else min_count
    chosen = [int(offs[i]) for i in order[:max_buckets]
              if cnts[i] >= floor]
    B = len(chosen)
    if B == 0:
        return _decline()

    shift = np.asarray(chosen, np.int32)
    sel = np.full((K, R), B, np.int32)
    for j, o in enumerate(chosen):
        sel[ok & (off == o)] = j
    sel[~ok] = 0  # padding slots: value unused, avoid exceptions
    exc_k, exc_v = np.nonzero(ok & (sel == B))
    # Accept on EITHER criterion: the classic exception-fraction budget
    # (grid-like tables) or the cost model (irregular tables whose big
    # exception tail still undercuts the full gather).  The cost-model arm
    # additionally requires the rolls to cover at least HALF the valid
    # entries: a marginally-"cheaper" low-coverage plan (the radial metro's
    # identity order builds B=4 covering 33 %) pays the roll machinery AND
    # most of the gather, and measured slower than either pure form.
    n_ok = int(ok.sum())
    if exc_k.shape[0] > max(max_exc_frac * K * R,
                            min(roll_cost_budget(n_ok, B), n_ok // 2)):
        return _decline()

    exc_k_np = exc_k.astype(np.int32)
    exc_v_np = exc_v.astype(np.int32)
    exc_src = tab[exc_k_np, exc_v_np].astype(np.int32).reshape(-1)
    return shift, sel, exc_src, exc_k_np, exc_v_np


def roll_gather(mat, shift, sel, exc_src, exc_k, exc_v):
    """Evaluate ``mat[:, tab[k]]`` for every slot k via the roll plan.

    ``mat`` is ``[C, R]`` (C stacked per-road arrays sharing the same index
    structure — direction stacks pack/head-id/head-dest so one plan pays for
    all three gathers).  Returns ``[K, C, R]``, bitwise-equal to
    ``mat[:, tab]`` transposed to slot-major.  One dynamic-slice + one
    [K, C, R] select per GLOBAL bucket — slots sharing an offset share the
    roll.
    """
    C, R = mat.shape
    (B,) = shift.shape
    K = sel.shape[0]
    out = jnp.zeros((K, C, R), mat.dtype)
    if exc_src.shape[0]:
        out = out.at[exc_k, :, exc_v].set(mat[:, exc_src].T)
    mat2 = jnp.concatenate([mat, mat], axis=1)  # doubled once, shared by rolls
    for b in range(B):
        rolled = lax.dynamic_slice_in_dim(mat2, shift[b], R, axis=1)
        out = jnp.where((sel == b)[:, None, :], rolled[None], out)
    return out
