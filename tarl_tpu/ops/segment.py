"""Segment (gather/scatter-reduce) primitives over graph edge lists.

These replace the reference's third-party native kernels:

* ``torch_scatter.scatter_add`` / ``scatter_max`` (direction_mpnn.py:4,133-139)
* ``torch_scatter.scatter_softmax`` (reinforcement_learning.py:9,25)
* PyG ``MessagePassing``'s C++-assisted gather/scatter (direction_mpnn.py:19)

On TPU they lower to XLA scatter/segment HLOs which fuse into the surrounding
tick computation; :mod:`tarl_tpu.ops.pallas_segment` provides hand-written
Pallas kernels for the hot shapes.  All functions take a static
``num_segments`` so shapes stay compile-time constant.
"""
from __future__ import annotations

import contextlib
import contextvars
import os

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)

# Route float32 1-D segment reductions through the Pallas one-hot kernels on
# TPU (ops/pallas_segment.py). TARL_PALLAS=0 disables.
_PALLAS_ENABLED = os.environ.get("TARL_PALLAS", "1") != "0"
# The kernels tile over SEGMENT BLOCKS as well as edge tiles
# (pallas_segment.SEG_TILE), so any segment count compiles within VMEM —
# unbounded support matching torch_scatter (VERDICT r2 #6; the old one-hot
# form was hard-capped at 4096 by scoped VMEM).  This bound is now purely a
# PERFORMANCE heuristic: block tiling re-streams every edge tile per block,
# so work grows linearly in num_segments and the XLA scatter path wins for
# very large sparse reductions; the production tick uses the slot-major
# formulation either way (core/direction.py).
_PALLAS_MAX_SEGMENTS = int(os.environ.get("TARL_PALLAS_MAX_SEG", "65536"))

# vmap of pallas_call fails Mosaic lowering on this TPU stack ("grid_context"
# assertion); callers that trace segment ops under vmap (the PPO loss, the
# batched multi-env rollout) wrap themselves in no_pallas() so those regions
# fall back to XLA.  The flag acts at trace time.
_NO_PALLAS = contextvars.ContextVar("tarl_no_pallas", default=False)


@contextlib.contextmanager
def no_pallas():
    """Disable the Pallas fast path for ops traced inside this context."""
    token = _NO_PALLAS.set(True)
    try:
        yield
    finally:
        _NO_PALLAS.reset(token)


def _pallas_ok(data, num_segments: int) -> bool:
    if not _PALLAS_ENABLED or _NO_PALLAS.get():
        return False
    if jax.default_backend() != "tpu":
        return False
    return (
        data.ndim == 1
        and data.dtype == jnp.float32
        and num_segments <= _PALLAS_MAX_SEGMENTS
    )


def segment_sum(data, segment_ids, num_segments: int):
    if _pallas_ok(data, num_segments):
        from .pallas_segment import segment_sum_pallas

        return segment_sum_pallas(data, segment_ids, num_segments)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=False)


def segment_max(data, segment_ids, num_segments: int):
    if _pallas_ok(data, num_segments):
        from .pallas_segment import segment_max_pallas

        return segment_max_pallas(data, segment_ids, num_segments)
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=False)


def segment_min(data, segment_ids, num_segments: int):
    return jax.ops.segment_min(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=False)


def segment_argmax(scores, segment_ids, num_segments: int):
    """Index of the maximum ``scores`` entry within each segment.

    Equivalent to ``torch_scatter.scatter_max``'s returned argmax
    (direction_mpnn.py:139).  Ties break toward the smallest element index.
    Segments with no elements (or only ``-inf`` scores) return ``len(scores)``
    as an out-of-range sentinel the caller can mask on.
    """
    if _pallas_ok(scores, num_segments):
        from .pallas_segment import segment_argmax_pallas

        return segment_argmax_pallas(scores, segment_ids, num_segments)
    n = scores.shape[0]
    seg_best = segment_max(scores, segment_ids, num_segments)
    is_best = (scores == seg_best[segment_ids]) & jnp.isfinite(scores)
    idx = jnp.where(is_best, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    # Clamp the empty-segment identity (INT32_MAX from segment_min) to n so
    # every "no element" case uses the same sentinel.
    return jnp.minimum(segment_min(idx, segment_ids, num_segments), n)


def segment_softmax(logits, segment_ids, num_segments: int):
    """Softmax normalized within each segment (scatter_softmax,
    reinforcement_learning.py:25).  Numerically stabilized by the segment max."""
    seg_max = segment_max(logits, segment_ids, num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[segment_ids]
    expd = jnp.exp(shifted)
    denom = segment_sum(expd, segment_ids, num_segments)
    return expd / jnp.maximum(denom[segment_ids], 1e-30)


def segment_log_softmax(logits, segment_ids, num_segments: int):
    seg_max = segment_max(logits, segment_ids, num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[segment_ids]
    denom = segment_sum(jnp.exp(shifted), segment_ids, num_segments)
    return shifted - jnp.log(jnp.maximum(denom, 1e-30))[segment_ids]


def segment_sample(key, logits, segment_ids, num_segments: int):
    """Sample one element per segment with probability ``softmax(logits)``.

    The Gumbel-max trick: the reference uses it explicitly to pick at most one
    incoming agent per road per tick (direction_mpnn.py:135-139) and implicitly
    (inverse-CDF) in ``GraphDistribution.sample`` (reinforcement_learning.py:62-80)
    — both are categorical sampling per segment, unified here.

    Returns int32[num_segments] element indices, ``len(logits)`` for segments
    that have no element with finite logit.
    """
    gumbel = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    scores = jnp.where(jnp.isfinite(logits), logits + gumbel, NEG_INF)
    return segment_argmax(scores, segment_ids, num_segments)

