"""On-chip validation of the per-shard fused winner kernel.

Runs the explicit shard_map episode on a 1-device TPU mesh at Grid64x64
(roll plans active naturally at R=16.5k) with TARL_FUSED_SHARD=1 vs =0 and
asserts bitwise-equal outcomes — this exercises the REAL Mosaic lowering of
core.fused_winner._shard_winner_kernel (the CPU tests cover interpret mode
only) and gives a rough same-program timing signal (with one shard the
kernel sees the full road row, like the serial fused kernel).

Run from /root/repo with the default (axon) environment; no other TPU
process may be active.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from tarl_tpu.config import SimConfig  # noqa: E402
from tarl_tpu.core.step import Policy, init_sim_state  # noqa: E402
from tarl_tpu.io.matsim import load_network, load_population  # noqa: E402
from tarl_tpu.io.scenarios import grid_scenario  # noqa: E402
from tarl_tpu.parallel.shard_map_episode import (  # noqa: E402
    make_road_mesh,
    run_episode_shard_map,
)
from tarl_tpu.routing.policies import random_choice  # noqa: E402

TICKS = int(os.environ.get("TARL_VSF_TICKS", "512"))


def main() -> None:
    cache = os.path.join(tempfile.gettempdir(), "tarl_bench_scen")
    name = "VerifyShardFused64"
    base = os.path.join(cache, name)
    if not os.path.exists(os.path.join(base, "network.xml")):
        grid_scenario(cache, name, rows=64, cols=64, num_agents=5000,
                      peak_start=6 * 3600, peak_spread=3600)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    assert net.in_roll_shift_t, "Grid64 must carry a roll plan"
    print(f"R={net.num_roads} KIN={net.in_src_tab.shape[0]} "
          f"backend={jax.default_backend()}", flush=True)

    sim = SimConfig(start_time=6 * 3600, end_time=6 * 3600 + TICKS)
    policy = Policy(choice=random_choice)
    state = init_sim_state(net, agents, sim=sim, policy=policy)
    mesh = make_road_mesh(1)

    results = {}
    for flag in ("0", "1"):
        os.environ["TARL_FUSED_SHARD"] = flag
        t0 = time.time()
        final, logs = run_episode_shard_map(
            state, net, policy, TICKS, mesh, sim=sim
        )
        jax.block_until_ready(final.road.count)
        compile_s = time.time() - t0
        t0 = time.time()
        final, logs = run_episode_shard_map(
            state, net, policy, TICKS, mesh, sim=sim
        )
        jax.block_until_ready(final.road.count)
        run_s = time.time() - t0
        results[flag] = (final, logs)
        print(f"TARL_FUSED_SHARD={flag}: compile+run {compile_s:.1f}s, "
              f"warm {run_s:.3f}s = {1e3 * run_s / TICKS:.3f} ms/tick",
              flush=True)

    (f0, l0), (f1, l1) = results["0"], results["1"]
    np.testing.assert_array_equal(np.asarray(f0.agents.arrival),
                                  np.asarray(f1.agents.arrival))
    np.testing.assert_array_equal(np.asarray(f0.road.count),
                                  np.asarray(f1.road.count))
    np.testing.assert_array_equal(np.asarray(f0.road.fifo_ids),
                                  np.asarray(f1.road.fifo_ids))
    np.testing.assert_array_equal(np.asarray(l0.arrivals),
                                  np.asarray(l1.arrivals))
    done = int(np.asarray(f1.agents.done)[1:].sum())
    print(f"BITWISE OK (done={done}/5000) — shard fused winner kernel "
          "verified on chip", flush=True)


if __name__ == "__main__":
    main()
