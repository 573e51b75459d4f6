"""On-chip A/B of exact-insert modes at the official bench workload
(Grid16x16 / 50k agents / random policy / 2 h peak).

Rows: bounded (insert_escalate=False, the r3 headline), exact via window
escalation (the r3 exact row), exact via the persistent backlog at several
capacities.  One chunk size -> one compile per config.

Run from /root/repo with the default (axon) environment, nothing else on
the TPU.
"""
import os
import sys
import tempfile
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tarl_tpu.config import SimConfig                      # noqa: E402
from tarl_tpu.core.step import Policy, init_sim_state, run_episode  # noqa: E402
from tarl_tpu.io.matsim import load_network, load_population  # noqa: E402
from tarl_tpu.io.scenarios import grid_scenario            # noqa: E402
from tarl_tpu.routing.policies import random_choice        # noqa: E402
from tarl_tpu.state import sort_agents_by_departure        # noqa: E402

ROWS = COLS = int(os.environ.get("TARL_BENCH_GRID", "16"))
NUM_AGENTS = int(os.environ.get("TARL_BENCH_AGENTS", "50000"))
SIM_SECONDS = int(os.environ.get("TARL_BENCH_SECONDS", "7200"))
CHUNK = int(os.environ.get("TARL_BENCH_CHUNK", "1024"))
WINDOW = int(os.environ.get("TARL_BENCH_WINDOW", "1024"))


def main() -> None:
    cache = os.environ.get("TARL_BENCH_DIR") or os.path.join(
        tempfile.gettempdir(), "tarl_bench_scen"
    )
    name = f"BenchGrid{ROWS}x{COLS}_{NUM_AGENTS}"
    base = os.path.join(cache, name)
    if not os.path.exists(os.path.join(base, "network.xml")):
        grid_scenario(cache, name, rows=ROWS, cols=COLS,
                      num_agents=NUM_AGENTS,
                      peak_start=6 * 3600, peak_spread=2 * 3600)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    agents = sort_agents_by_departure(agents)

    def measure(label, **kw):
        sim = SimConfig(
            timestep=1, start_time=6 * 3600,
            end_time=6 * 3600 + SIM_SECONDS,
            record_road_optimality=False,
            insert_window=WINDOW, withdraw_depth=2,
            withdraw_compact=256, sorted_population=True, **kw,
        )
        policy = Policy(choice=random_choice)
        state = init_sim_state(net, agents, sim=sim, policy=policy)
        num_chunks = max(SIM_SECONDS // CHUNK, 2)
        state, _ = run_episode(state, net, policy, CHUNK, sim=sim)
        jax.block_until_ready(state.road.count)
        t0 = time.time()
        final = state
        for _ in range(num_chunks - 1):
            final, logs = run_episode(final, net, policy, CHUNK, sim=sim)
        jax.block_until_ready(final.road.count)
        wall = time.time() - t0
        ticks = (num_chunks - 1) * CHUNK
        rate = agents.num_agents * ticks / wall
        import numpy as np

        done = int(np.asarray(final.agents.done)[1:].sum())
        print(f"{label:34s} {wall / ticks * 1e3:7.3f} ms/tick "
              f"{rate / 1e6:8.1f}M agent-steps/s  done={done}", flush=True)
        return rate

    measure("bounded (r3 headline)",
            insert_escalate=False, withdraw_escalate=False)
    measure("exact escalation (r3 exact row)",
            insert_escalate=True, withdraw_escalate=True)
    for b in (2048, 4096, 8192):
        measure(f"exact backlog B={b}",
                insert_escalate=True, withdraw_escalate=True,
                insert_backlog=b)
    measure("bounded + insert_compact off",
            insert_escalate=False, withdraw_escalate=False,
            insert_compact=None)


if __name__ == "__main__":
    main()
