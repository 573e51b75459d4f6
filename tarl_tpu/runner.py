"""Unified experiment orchestration: the reference's ``Runner`` re-imagined.

Reference: src/runner.py:10-226 (RunnerArgs dataclass, setup/train/eval) and
main.py:6-34 (argparse CLI).  Differences by design:

* no ``--device`` plumbing — JAX owns device placement (the single ``--device``
  string of runner.py:31 becomes a no-op informational flag);
* ``--torch-compile`` becomes ``--exec {fused,eager}``: fused runs the whole
  episode as on-device ``lax.scan`` chunks, eager reproduces the reference's
  per-tick host loop with phase timers;
* train/eval share one scenario setup; training uses the in-graph PPO.
"""
from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path

import jax

from .algorithms.episode import run_episode
from .algorithms.msa import run_msa
from .config import RLConfig, SimConfig
from .core.step import Policy
from .io.cache import load_or_build_network
from .metrics.equilibrium import equilibrium_report
from .models.mpnn import MPNNPolicyNet, MPNNValueNetSimple
from .rl.ppo import PPO
from .rl.trainer import ppo_train
from .routing.policies import random_choice
from .simulator import TransportationSimulator, make_policy


@dataclasses.dataclass
class RunnerArgs:
    """CLI arguments (reference: RunnerArgs, runner.py:10-23)."""

    algo: str = "dijkstra"            # dijkstra | random | mpnn | mpnn+ppo |
                                      # transformer | transformer+ppo
    scenario: str = "Easy"
    mode: str = "eval"                # eval | train
    timestep_size: int = 1
    start_end_time: tuple = (0, 86400)
    epochs: int = 1
    rollout_steps: int = 32
    iterations: int = 10              # PPO iterations (new; the reference
                                      # conflated total_frames/rollout_steps)
    seed: int = 0
    device: str = "tpu"               # informational only
    output_dir: str = "runs"
    profile: bool = False
    exec_mode: str = "fused"          # fused | eager
    checkpoint: str = ""              # restore policy/value params for eval
    num_envs: int = 1                 # PPO environment replicas (vmapped,
                                      # sharded over the device mesh)
    # Learning-quality levers (defaults = the recorded demo that reaches
    # user equilibrium on Braess, scripts/train_rl_demo.py / docs/LEARNING.md).
    # The reference's exact reward is available via --reward-mode on_network.
    reward_mode: str = "progress"
    distance_prior: bool = True
    gamma: float = 0.98
    entropy_coef: float = 0.003   # 0.03 is the Bottleneck mixing recipe
    extra_obs: bool = False       # congestion-aware context columns (RLConfig)
    data_root: str = "data"
    save_root: str = "save"


class Runner:
    """Entry point for classical and RL experiments (runner.py:26-226)."""

    def __init__(self, args: RunnerArgs):
        self.args = args
        self.key = jax.random.PRNGKey(args.seed)

    # ------------------------------------------------------------------
    def setup(self) -> None:
        a = self.args
        # Per-tick [T, R] road-optimality series: the DEVICE side is never
        # the bound (algorithms.episode runs fused scans in 4096-tick
        # chunks, so the on-device log is [chunk, R]); the limit is the
        # accumulated HOST series, T*R floats.  Gate on that product — the
        # default 2e8-element budget (~800 MB float32, TARL_PER_TICK_BUDGET
        # overrides) keeps FULL per-tick resolution for the reference's
        # default 86,400-tick Easy workload (86,400 x 24 roads = 2M) and
        # degrades to the O(H*R) hourly accumulator only on big networks,
        # where the reference's unbounded host lists + per-tick .cpu()
        # sync would not survive either (response_mpnn.py:125).
        n_ticks = (a.start_end_time[1] - a.start_end_time[0]) // a.timestep_size
        probe_net = load_or_build_network(a.scenario, a.data_root, a.save_root)
        budget = int(os.environ.get("TARL_PER_TICK_BUDGET", 2 * 10 ** 8))
        per_tick_dense = n_ticks * probe_net.num_roads <= budget
        sparse_ok = os.environ.get("TARL_SPARSE_PER_TICK", "1") != "0"
        if not per_tick_dense:
            if sparse_ok:
                print(
                    f"ℹ️  | {n_ticks} ticks x {probe_net.num_roads} roads "
                    f"exceeds the {budget:.0e}-element dense per-tick "
                    "budget: road-optimality kept at FULL per-tick "
                    "resolution in the sparse (nonzero-triplet) store "
                    "(TARL_SPARSE_PER_TICK=0 restores the hourly fallback)"
                )
            else:
                print(
                    f"ℹ️  | {n_ticks} ticks x {probe_net.num_roads} roads "
                    f"exceeds the {budget:.0e}-element per-tick budget: "
                    "road-optimality recorded at hourly resolution "
                    "(TARL_PER_TICK_BUDGET raises)"
                )
        self.sim = TransportationSimulator(
            sim=SimConfig(
                timestep=a.timestep_size,
                start_time=a.start_end_time[0],
                end_time=a.start_end_time[1],
                seed=a.seed,
                record_road_optimality=per_tick_dense or sparse_ok,
            ),
            data_root=a.data_root,
            save_root=a.save_root,
        )
        if not per_tick_dense:
            self.sim.road_optimality_store = "sparse" if sparse_ok else "hourly"
        # Cap the fused-scan chunk so the on-device [chunk, R] per-tick log
        # stays bounded on big networks (default 5e7 elements = 200 MB).
        # Only applies when per-tick recording is on — without it no
        # [chunk, R] device log exists and big networks keep full chunks.
        dev_budget = int(os.environ.get("TARL_PER_TICK_DEV_BUDGET", 5 * 10 ** 7))
        self.episode_chunk = max(
            64, min(4096, dev_budget // max(probe_net.num_roads, 1))
        ) if (per_tick_dense or sparse_ok) else 4096
        self.sim.load_network(a.scenario)
        self.sim.load_population(a.scenario)

        if a.algo in {"dijkstra", "random", "so"}:
            self.sim.set_policy(make_policy(a.algo, network=self.sim.network))
            self.sim.config_parameters(
                timestep_size=a.timestep_size, start_time=a.start_end_time[0]
            )
        elif a.algo in {"mpnn", "mpnn+ppo", "transformer", "transformer+ppo"}:
            net = self.sim.network
            self.rl_cfg = RLConfig(
                rollout_steps=a.rollout_steps,
                num_epochs=a.epochs,
                episode_start=a.start_end_time[0] or RLConfig.episode_start,
                reward_mode=a.reward_mode,
                gamma=a.gamma,
                gae_lambda=0.9 if a.reward_mode == "progress" else 0.95,
                minibatch_size=min(128, a.rollout_steps),
                entropy_coef=a.entropy_coef,
                extra_obs=a.extra_obs,
            )
            value_uses_graph = False
            if a.algo.startswith("transformer"):
                # The Graph Transformer stack the reference keeps unwired
                # (SURVEY §2.18 "no import from runner.py") is a first-class
                # CLI algorithm here.
                from .models.transformer.agent import (
                    TransformerRoutePolicy,
                    TransformerValueNet,
                    network_positional_encoding,
                )

                pe = network_positional_encoding(net, 16)
                self.policy_net = TransformerRoutePolicy(pe=pe)
                self.value_net = TransformerValueNet(pe=pe)
                value_uses_graph = True
            else:
                self.policy_net = MPNNPolicyNet(
                    num_nodes=net.num_nodes,
                    num_node_embeddings=net.num_roads + 1,
                    use_distance_prior=a.distance_prior,
                    prior_scale=30.0,
                )
                self.value_net = MPNNValueNetSimple()
            self.ppo = PPO(
                net, self.policy_net, self.value_net,
                rl=self.rl_cfg,
                sim_cfg=self.sim.sim,
                value_uses_graph=value_uses_graph,
            )
            self.trainer = self.ppo
            if a.num_envs > 1:
                from .parallel.mesh import make_mesh
                from .parallel.shard import BatchedPPO

                n_dev = min(jax.device_count(), a.num_envs)
                mesh = make_mesh(n_dev, sp=1)
                self.trainer = BatchedPPO(self.ppo, mesh, num_envs=a.num_envs)
            self.sim.set_policy(Policy(choice=random_choice))
            self.sim.config_parameters(
                timestep_size=a.timestep_size, start_time=a.start_end_time[0]
            )
        else:
            raise ValueError(f"Unknown algorithm {a.algo!r}")

    # ------------------------------------------------------------------
    def train(self):
        a = self.args
        if not a.algo.endswith("+ppo") or a.mode != "train":
            raise RuntimeError(
                "Training needs --algo mpnn+ppo or transformer+ppo")
        out = Path(a.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        self.train_state = ppo_train(
            self.trainer,
            self.sim.state,
            num_iterations=a.iterations,
            key=self.key,
            rl=self.rl_cfg,
            log_dir=str(out),
            checkpoint_dir=str(out / "checkpoints"),
            eval_interval=1,
        )
        return self.train_state

    # ------------------------------------------------------------------
    def eval(self):
        a = self.args
        n_timesteps = (a.start_end_time[1] - a.start_end_time[0]) // a.timestep_size

        if a.algo in {"dijkstra", "random", "so"}:
            run_episode(
                self.sim,
                steps=n_timesteps,
                mode=a.exec_mode,
                chunk=getattr(self, "episode_chunk", 4096),
                profile=a.profile,
                profile_output=(
                    Path(a.output_dir) / "profile.txt" if a.profile else None
                ),
            )
            self._summary(self.sim)
        else:
            # Greedy rollout with (possibly trained) policy params
            # (runner.py:177-226).
            params = getattr(self, "train_state", None)
            if params is None:
                ts = self.ppo.init(self.sim.state, self.key)
                params = ts.params
                if a.checkpoint:
                    from .rl.checkpoint import restore_checkpoint

                    restored = restore_checkpoint(
                        a.checkpoint,
                        template={"params": ts.params,
                                  "opt_state": ts.opt_state, "iteration": 0},
                    )
                    params = restored["params"]
                    print(f"🔁 | Loaded policy checkpoint {a.checkpoint}")
            else:
                params = self.train_state.params
            env, rewards, dones, logs = self.ppo.eval_rollout(
                params, self.sim.state, self.key, n_timesteps
            )
            # Adopt the env's final state so the metric suite reads it, and
            # rebuild the leg-histogram series from the rollout logs.
            self.sim.state = env.sim
            import numpy as _np

            arrivals = _np.asarray(logs["arrivals"])
            on_net = _np.asarray(logs["on_network"])
            times = _np.asarray(logs["time"])
            prev_on = _np.concatenate([[0.0], on_net[:-1]])
            departures = on_net - prev_on + arrivals
            self.sim.leg_histogram_values = [
                [float(departures[i]), float(arrivals[i]), float(on_net[i]),
                 float(times[i])]
                for i in range(len(times))
            ]
            self._summary(self.sim)

    # ------------------------------------------------------------------
    def _summary(self, sim: TransportationSimulator):
        a = self.args
        avg_travel = sim.average_travel_time()
        t = sim.timers
        print("\n=== Simulation Summary ===")
        print(f"{'Average travel time:':25} {avg_travel:10.2f} s")
        print(f"{'Agent Insertion time:':25} {t.inserting_time:10.2f} s")
        print(f"{'Route Choice time:':25} {t.choice_time:10.2f} s")
        print(f"{'Core Model time:':25} {t.core_time:10.2f} s")
        print(f"{'Agent Withdrawal time:':25} {t.withdraw_time:10.2f} s")
        print("-" * 42)
        print(f"{'Total simulation time:':25} {t.total:10.2f} s")

        print("\n=== Computing Metrics... ===")
        out = a.output_dir
        sim.plot_computation_time(out)
        sim.compute_node_metrics(out)
        sim.plot_leg_histogram(out)
        # Falls back to the on-device hourly accumulator when the per-tick
        # series was not recorded (long runs).
        sim.plot_road_optimality(out)
        # The MSA validator / equilibrium report solve all-pairs assignments
        # per iteration; guard very large networks (same cost class as the
        # reference's host MSA, user_equilibrium_msa.py:125-144).
        if sim.network.num_nodes > 4096:
            print("(skipping MSA comparison / equilibrium report: "
                  f"{sim.network.num_nodes} nodes > 4096)")
            return None
        expected = run_msa(sim.network, sim.state.agents)
        sim.plot_daily_counts(expected, out)

        report = equilibrium_report(
            sim.state.agents, sim.state.road, sim.network, sim.state.time
        )
        print("\n=== Equilibrium Report (TSTT / Nash gap / PoA) ===")
        for k, v in report.items():
            print(f"{k:25} {v:12.4f}" if isinstance(v, float) else f"{k:25} {v}")
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "equilibrium_report.json"), "w") as f:
            json.dump(report, f, indent=2)
        return report


def main(argv=None):
    """CLI entry (reference: main.py:6-34)."""
    import argparse

    parser = argparse.ArgumentParser(
        description="Unified runner for classical and RL traffic-assignment experiments (TPU-native)"
    )
    parser.add_argument("--algo",
                        choices=["dijkstra", "random", "so", "mpnn", "mpnn+ppo",
                                 "transformer", "transformer+ppo"],
                        default="dijkstra")
    parser.add_argument("--scenario", type=str, default="Easy",
                        help="Scenario directory under data/ (builtin generators: "
                             "TwoLink, Braess, Easy, Grid4x4, Grid8x8)")
    parser.add_argument("--mode", choices=["eval", "train"], default="eval")
    parser.add_argument("--timestep_size", type=int, default=1)
    parser.add_argument("--start-end-time", type=int, nargs=2, default=[0, 86400])
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--rollout-steps", type=int, default=32)
    parser.add_argument("--iterations", type=int, default=10,
                        help="PPO training iterations")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--device", type=str, default="tpu",
                        help="Informational; JAX owns placement")
    parser.add_argument("--output-dir", type=str, default="runs")
    parser.add_argument("--profile", action="store_true")
    parser.add_argument("--exec", dest="exec_mode", choices=["fused", "eager"],
                        default="fused",
                        help="fused = whole episode as on-device lax.scan; "
                             "eager = per-tick host loop with phase timers")
    parser.add_argument("--checkpoint", type=str, default="",
                        help="Checkpoint directory to restore policy params "
                             "for evaluation (saved by --mode train)")
    parser.add_argument("--num-envs", type=int, default=1,
                        help="PPO environment replicas (data-parallel over "
                             "the device mesh)")
    parser.add_argument("--reward-mode", default="progress",
                        choices=["progress", "on_network", "individual",
                                 "throughput", "system"],
                        help="'progress' (default) = potential-based shaping "
                             "that demonstrably learns (docs/LEARNING.md); "
                             "'on_network' = the reference's live reward")
    parser.add_argument("--no-distance-prior", dest="distance_prior",
                        action="store_false",
                        help="Disable the shortest-path logit prior "
                             "(the reference's intended compute_dijkstra_logits)")
    parser.add_argument("--gamma", type=float, default=0.98)
    parser.add_argument("--entropy-coef", type=float, default=0.003,
                        help="PPO entropy bonus (0.03 = the equilibrium-"
                             "mixing recipe, docs/LEARNING.md)")
    parser.add_argument("--extra-obs", action="store_true",
                        help="Append congestion-aware context columns (V/C, "
                             "congested delay, pending demand) to the "
                             "policy/value observation")
    args = parser.parse_args(argv)

    runner = Runner(
        RunnerArgs(
            algo=args.algo,
            scenario=args.scenario,
            mode=args.mode,
            timestep_size=args.timestep_size,
            start_end_time=tuple(args.start_end_time),
            epochs=args.epochs,
            rollout_steps=args.rollout_steps,
            iterations=args.iterations,
            seed=args.seed,
            device=args.device,
            output_dir=args.output_dir,
            profile=args.profile,
            exec_mode=args.exec_mode,
            checkpoint=args.checkpoint,
            num_envs=args.num_envs,
            reward_mode=args.reward_mode,
            distance_prior=args.distance_prior,
            gamma=args.gamma,
            entropy_coef=args.entropy_coef,
            extra_obs=args.extra_obs,
        )
    )
    runner.setup()
    if args.mode == "train":
        runner.train()
    runner.eval()


if __name__ == "__main__":
    main()
