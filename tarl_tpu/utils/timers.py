"""Wall-clock phase timing utilities.

The reference times each simulation phase with ``time.time()`` pairs around
host calls (transportation_simulator.py:299-324).  On TPU the analogue is
(a) eager per-phase timing with ``block_until_ready`` barriers (used by
``TransportationSimulator.run``) and (b) ``jax.profiler`` traces for the
fused path (algorithms.episode ``jax_trace_dir``).  This module provides the
small shared pieces.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class Stopwatch:
    """Accumulating named timers."""

    totals: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def time(self, name: str, block_on=None):
        """Time a block; ``block_on`` is an array (or pytree) to
        ``block_until_ready`` so device work is attributed correctly."""
        start = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[name] = self.totals.get(name, 0.0) + (
                time.perf_counter() - start
            )

    def summary(self) -> str:
        total = sum(self.totals.values())
        lines = [f"{k:20} {v:10.3f} s" for k, v in self.totals.items()]
        lines.append(f"{'total':20} {total:10.3f} s")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """``jax.profiler`` trace context (no-op when ``trace_dir`` is None)."""
    if trace_dir is None:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
