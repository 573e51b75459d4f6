#!/usr/bin/env python
"""End-to-end tour of the TARL-TPU framework on the Braess scenario.

Runs every major subsystem in ~a minute on CPU (or TPU when available):

1. scenario generation + (native) MATSim ingestion,
2. a fused-scan episode under the shortest-path policy,
3. the metric suite (plots, CSVs, MSA comparison, TSTT/Nash-gap/PoA),
4. a few in-graph PPO iterations with checkpointing,
5. a mid-episode simulation-state checkpoint roundtrip.

Usage: python scripts/demo.py [output_dir]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from tarl_tpu.algorithms.episode import run_episode
from tarl_tpu.algorithms.msa import run_msa
from tarl_tpu.config import RLConfig
from tarl_tpu.io.cache import load_sim_state, save_sim_state
from tarl_tpu.metrics.equilibrium import equilibrium_report
from tarl_tpu.models.mpnn import MPNNPolicyNet, MPNNValueNetSimple
from tarl_tpu.rl.ppo import PPO
from tarl_tpu.rl.trainer import ppo_train
from tarl_tpu.simulator import TransportationSimulator, make_policy


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="tarl_demo_")
    data_root = os.path.join(out, "data")
    print(f"demo outputs -> {out}")

    # 1-2) scenario + classical episode ------------------------------------
    sim = TransportationSimulator(
        data_root=data_root, save_root=os.path.join(out, "save")
    )
    sim.load_network("Braess")
    sim.load_population("Braess")
    sim.set_policy(make_policy("dijkstra"))
    sim.config_parameters(timestep_size=2, start_time=6 * 3600)
    run_episode(sim, steps=2500, mode="fused", chunk=512)
    print(f"arrived: {int(sim.state.agents.done[1:].sum())} agents, "
          f"avg travel {sim.average_travel_time():.1f}s")

    # 3) metrics -------------------------------------------------------------
    sim.plot_leg_histogram(out)
    sim.plot_road_optimality(out)
    sim.compute_node_metrics(out)
    sim.plot_daily_counts(run_msa(sim.network, sim.state.agents), out)
    report = equilibrium_report(
        sim.state.agents, sim.state.road, sim.network, sim.state.time
    )
    print("equilibrium:", {k: round(v, 3) for k, v in report.items()})

    # 4) PPO ------------------------------------------------------------------
    rl = RLConfig(rollout_steps=64, minibatch_size=32, num_epochs=2)
    ppo = PPO(
        sim.network,
        MPNNPolicyNet(num_nodes=sim.network.num_nodes,
                      num_node_embeddings=sim.network.num_roads + 1),
        MPNNValueNetSimple(),
        rl=rl,
    )
    ppo_train(ppo, sim.state, num_iterations=3, rl=rl,
              log_dir=os.path.join(out, "runs"),
              checkpoint_dir=os.path.join(out, "runs", "ckpt"),
              checkpoint_interval=3)

    # 5) sim-state checkpoint roundtrip --------------------------------------
    ckpt = os.path.join(out, "sim_state.npz")
    save_sim_state(sim.state, ckpt)
    restored = load_sim_state(sim.state, ckpt)
    assert float(restored.time) == float(sim.state.time)
    print(f"sim-state checkpoint roundtrip OK ({ckpt})")


if __name__ == "__main__":
    main()
