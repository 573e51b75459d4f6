"""Episode runner with progress + profiling hooks.

Counterpart of the reference's ``run_episode`` (algorithms/base_runner.py:12-57)
with two execution modes:

* ``mode="fused"`` (default): the whole episode is chunked into fused
  ``lax.scan`` segments on device — the fast TPU path;
* ``mode="eager"``: one host call per tick with per-phase wall-clock timers,
  reproducing the reference's timing breakdown and cProfile support
  (base_runner.py:38-55, main.py:18-22).

``profile="jax"`` captures a ``jax.profiler`` trace instead of cProfile —
the TPU-native tracing analogue (SURVEY.md §5.1).
"""
from __future__ import annotations

import cProfile
import io
import pstats
from pathlib import Path
from typing import Optional, Union

from ..simulator import TransportationSimulator


def run_episode(
    simulator: TransportationSimulator,
    steps: int = 86400,
    *,
    mode: str = "fused",
    chunk: int = 4096,
    profile: bool = False,
    profile_output: Optional[Union[str, Path]] = None,
    jax_trace_dir: Optional[str] = None,
    progress: bool = True,
) -> TransportationSimulator:
    """Run ``steps`` ticks on the configured simulator."""
    print("\n" + "=" * 10 + " 🚀 Starting Simulation " + "=" * 10)

    from ..utils.timers import device_trace

    profiler = cProfile.Profile() if profile else None
    if profiler is not None:
        profiler.enable()

    with device_trace(jax_trace_dir):
        if mode == "fused":
            import time as _t

            # Keep chunks refresh-aligned so run_fast can use the hoisted
            # periodic driver (core.step.run_episode_periodic) for every
            # chunk but the final remainder.
            # Never raise the chunk above the caller's value: it may be a
            # device-memory budget cap (runner.episode_chunk) — when the
            # refresh period exceeds it, skip the periodic driver instead.
            rate = simulator.policy.periodic_rate
            if rate and rate <= chunk and chunk % rate:
                chunk -= chunk % rate
            done = 0
            t0 = _t.time()
            while done < steps:
                n = min(chunk, steps - done)
                simulator.run_fast(n)
                done += n
                if progress:
                    rate = done / max(_t.time() - t0, 1e-9)
                    print(f"\r  tick {done}/{steps} ({rate:,.0f} ticks/s)", end="")
            if progress:
                print()
            # In fused mode the phase split is not observable from the host;
            # attribute the whole episode to the core timer.
            simulator.timers.core_time += _t.time() - t0
        elif mode == "eager":
            iterator = range(steps)
            if progress:
                try:
                    from tqdm import tqdm

                    iterator = tqdm(iterator, desc="Running Simulation", unit="step")
                except ImportError:
                    pass
            for _ in iterator:
                simulator.run()
        else:
            raise ValueError(f"Unknown mode {mode!r}")

    if profiler is not None:
        profiler.disable()
        stream = io.StringIO()
        stats = pstats.Stats(profiler, stream=stream).sort_stats("cumtime")
        stats.print_stats(20)
        print("\n=== Profiling Results ===")
        print(stream.getvalue())
        if profile_output:
            output_path = Path(profile_output)
            output_path.parent.mkdir(parents=True, exist_ok=True)
            output_path.write_text(stream.getvalue())

    return simulator
