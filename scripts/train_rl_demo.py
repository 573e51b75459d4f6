"""Recorded PPO-learning demonstration (VERDICT r1 #2).

Trains the mpnn+ppo stack (edge-MLP policy with the reference's *intended*
shortest-path distance prior, mpnn_agent.py:84-113, which its live path
disables) under the dense potential-based "progress" reward, then emits an
eval table — classical random / classical dijkstra / untrained mpnn /
trained mpnn — on average travel time, relative Nash gap, TSTT and completion
count, plus the training metrics CSV.

Usage:
    python scripts/train_rl_demo.py [Braess|Easy] [--iterations N]
                                    [--out runs/learning]

Run with the CPU env (see CLAUDE.md):
    env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
        python scripts/train_rl_demo.py Braess
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tarl_tpu.config import RLConfig, SimConfig
from tarl_tpu.core.step import Policy, init_sim_state, run_episode
from tarl_tpu.io.matsim import load_network, load_population
from tarl_tpu.io.scenarios import ensure_scenario
from tarl_tpu.metrics.equilibrium import nash_gap, tstt
from tarl_tpu.models.mpnn import MPNNPolicyNet, MPNNValueNetSimple
from tarl_tpu.rl.ppo import PPO
from tarl_tpu.rl.trainer import ppo_train
from tarl_tpu.routing.policies import random_choice
from tarl_tpu.simulator import make_policy

# Hyperparameters found by the round-2 sweeps (see docs/LEARNING.md):
# Braess/Easy — dense progress shaping, strong-ish discounting (routes
# differ by tens of seconds ~ tens of steps), distance prior at scale 30.
# Bottleneck — the "system" reward (TSTT; the mixing objective) with an
# entropy coefficient high enough to hold the A/B split open while the
# distance prior keeps the decoy route closed; evaluated STOCHASTICALLY
# (a mixed equilibrium is a mixed strategy — argmax cannot express it).
RL = dict(rollout_steps=512, minibatch_size=128, num_epochs=4,
          entropy_coef=0.003, learning_rate=1e-3,
          reward_mode="progress", gamma=0.98, gae_lambda=0.9)
RL_OVERRIDES = {
    "Bottleneck": dict(reward_mode="system", gamma=0.997, gae_lambda=0.95,
                       entropy_coef=0.03),
    # The TPU north-star run (docs/LEARNING.md): 5k agents, the
    # prior-equipped policy starts at the classical optimum and training
    # must preserve it.  Run on the chip: `cd /root/repo && python
    # scripts/train_rl_demo.py Grid8x8` (default env).
    "Grid8x8": dict(rollout_steps=256, num_epochs=5),
}
STOCHASTIC_HEADLINE = {"Bottleneck"}
PRIOR_SCALE = 30.0
EVAL_STEPS = {"Braess": 9000, "Easy": 15000, "Bottleneck": 5000,
              "Grid8x8": 12000}
ITERATIONS = {"Braess": 1000, "Easy": 600, "Bottleneck": 1500,
              "Grid8x8": 600}
# In-training eval length for the best-snapshot tracker: long enough that
# every agent finishes (Bottleneck: last departure 06:10 + ~90 s travel),
# else the selection metric is biased toward policies that serve EARLY
# departers (a 512-tick eval picked a snapshot whose full eval was 6 s
# worse than its short eval suggested).
TRAIN_EVAL_STEPS = {"Bottleneck": 1024}


def metrics_from(agents, road, t, net) -> dict:
    done_n = int(agents.done[1:].sum())
    att = float(
        jnp.where(agents.done, agents.arrival - agents.departure, 0).sum()
        / max(done_n, 1)
    )
    g = nash_gap(agents, road, net)
    return {
        "done": done_n,
        "avg_travel_time_s": round(att, 1),
        "relative_nash_gap": round(float(g["relative_gap"]), 3),
        "tstt_s": round(float(tstt(agents, t))),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("scenario", nargs="?", default="Braess",
                    choices=["Braess", "Easy", "Bottleneck", "Grid8x8"])
    ap.add_argument("--iterations", type=int, default=0)
    ap.add_argument("--out", default="runs/learning")
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--extra-obs", action="store_true",
                    help="Train with the congestion-aware context columns "
                         "(RLConfig.extra_obs); artifacts go to "
                         "<out>/<scenario>_xobs")
    ap.add_argument("--entropy-coef", type=float, default=None,
                    help="Override the scenario's entropy coefficient")
    ap.add_argument("--track-stochastic", action="store_true",
                    help="Select the best snapshot on the STOCHASTIC eval "
                         "(the deployment mode of a mixing policy) instead "
                         "of the greedy one")
    ap.add_argument("--suffix", default="",
                    help="Extra artifact-directory suffix")
    ap.add_argument("--policy", default="mpnn",
                    choices=["mpnn", "transformer"],
                    help="Policy/value stack: the prior-equipped edge-MLP "
                         "MPNN (default) or the Graph Transformer stack "
                         "(§2.18; no distance prior — learns from scratch). "
                         "Artifacts go to <out>/<scenario>_transformer")
    ap.add_argument("--ema", type=float, default=None, metavar="DECAY",
                    help="EMA-smooth the eval/selection weights (e.g. "
                         "0.995): the anti-churn device — the FINAL EMA "
                         "iterate should track the best snapshot instead "
                         "of oscillating (VERDICT r3 #9)")
    ap.add_argument("--lr-anneal", type=float, default=None, metavar="FRAC",
                    help="Cosine-anneal the lr to 0 over the final FRAC of "
                         "training (e.g. 0.4): the policy freezes in the "
                         "mid-training equilibrium instead of churning at "
                         "full step size after convergence (VERDICT r3 #9)")
    args = ap.parse_args(argv)
    scen = args.scenario
    iters = args.iterations or ITERATIONS[scen]
    out = os.path.join(
        args.out,
        scen.lower() + ("_xobs" if args.extra_obs else "")
        + ("_transformer" if args.policy == "transformer" else "")
        + args.suffix,
    )
    os.makedirs(out, exist_ok=True)
    eval_steps = EVAL_STEPS[scen]

    base = ensure_scenario(args.data_root, scen)
    net = load_network(os.path.join(base, "network"))
    agents, _ = load_population(
        os.path.join(base, "population"), os.path.join(base, "network")
    )
    st = init_sim_state(net, agents, policy=Policy(choice=random_choice))

    lab = args.policy  # table-key prefix: "mpnn" or "transformer"
    table = {}

    # --- classical baselines, same horizon / timestep-1 protocol ---------
    for algo in ("random", "dijkstra"):
        pol = make_policy(algo)
        sim = SimConfig(start_time=6 * 3600 - 60, timestep=1)
        s0 = init_sim_state(net, agents, policy=pol, sim=sim)
        final, _ = run_episode(s0, net, pol, eval_steps, sim=sim)
        table[f"classical_{algo}"] = metrics_from(
            final.agents, final.road, final.time, net
        )
        print(f"{algo:18}: {table[f'classical_{algo}']}", flush=True)

    # --- mpnn+ppo ---------------------------------------------------------
    hp = {**RL, **RL_OVERRIDES.get(scen, {})}
    if args.entropy_coef is not None:
        hp["entropy_coef"] = args.entropy_coef
    if args.lr_anneal:
        upd_per_iter = hp["num_epochs"] * -(
            -hp["rollout_steps"] // hp["minibatch_size"]
        )
        total_upd = iters * upd_per_iter
        hp["lr_anneal_updates"] = int(total_upd * args.lr_anneal)
        hp["lr_anneal_start"] = total_upd - hp["lr_anneal_updates"]
    rl = RLConfig(**hp, extra_obs=args.extra_obs)
    if args.policy == "transformer":
        # The §2.18 stack, from scratch (no distance prior): the recorded
        # braess_transformer run (docs/LEARNING.md "Graph Transformer on
        # Braess").
        from tarl_tpu.models.transformer.agent import (
            TransformerRoutePolicy,
            TransformerValueNet,
            network_positional_encoding,
        )

        pe = network_positional_encoding(net, 16)
        ppo = PPO(net, TransformerRoutePolicy(pe=pe),
                  TransformerValueNet(pe=pe), rl=rl, value_uses_graph=True)
    else:
        pnet = MPNNPolicyNet(
            num_nodes=net.num_nodes, num_node_embeddings=net.num_roads + 1,
            use_distance_prior=True, prior_scale=PRIOR_SCALE,
        )
        ppo = PPO(net, pnet, MPNNValueNetSimple(), rl=rl)

    def eval_policy(params, key=0, det=True):
        env, *_ = ppo.eval_rollout(
            params, st, jax.random.PRNGKey(key), eval_steps, deterministic=det
        )
        return metrics_from(env.sim.agents, env.sim.road, env.sim.time, net)

    ts0 = ppo.init(st, jax.random.PRNGKey(0))
    table[f"{lab}_untrained"] = eval_policy(ts0.params)
    print(f"{lab + ' untrained':18}: {table[f'{lab}_untrained']}", flush=True)

    t0 = time.time()
    ckpt_dir = os.path.join(out, "checkpoints")
    ts = ppo_train(
        ppo, st, num_iterations=iters, key=jax.random.PRNGKey(0), rl=rl,
        log_dir=out, eval_interval=max(iters // 30, 1),
        eval_steps=TRAIN_EVAL_STEPS.get(scen),
        checkpoint_dir=ckpt_dir,
        checkpoint_interval=max(iters // 2, 1), verbose=False,
        stochastic_eval=args.track_stochastic,
        stochastic_eval_samples=3,  # de-noise the selection metric
        track_best=("eval_stochastic/avg_travel_time"
                    if args.track_stochastic else "eval/avg_travel_time"),
        ema_decay=args.ema,
    )
    train_s = time.time() - t0
    print(f"trained {iters} iterations in {train_s:.0f}s", flush=True)

    table[f"{lab}_trained_greedy"] = eval_policy(ts.params)
    table[f"{lab}_trained_stochastic"] = eval_policy(ts.params, key=3, det=False)
    if args.ema:
        from tarl_tpu.rl.checkpoint import restore_checkpoint as _restore

        ema_restored = _restore(
            os.path.join(ckpt_dir, "final_ema"),
            template={"params": ts.params, "opt_state": ts.opt_state,
                      "iteration": 0},
        )
        table[f"{lab}_final_ema_greedy"] = eval_policy(ema_restored["params"])
        table[f"{lab}_final_ema_stochastic"] = eval_policy(
            ema_restored["params"], key=3, det=False
        )
        print(f"{lab + ' final EMA(gr)':18}: {table[f'{lab}_final_ema_greedy']}",
              flush=True)
        print(f"{lab + ' final EMA(st)':18}: "
              f"{table[f'{lab}_final_ema_stochastic']}", flush=True)
    print(f"{lab + ' trained':18}: {table[f'{lab}_trained_greedy']}", flush=True)
    print(f"{lab + ' trained (st)':18}: {table[f'{lab}_trained_stochastic']}",
          flush=True)

    # Best-eval snapshot (rl.trainer track_best): PPO churns after
    # converging, so the last iterate is often not the best policy.
    best_path = os.path.join(ckpt_dir, "best")
    if os.path.exists(best_path):
        from tarl_tpu.rl.checkpoint import restore_checkpoint

        restored = restore_checkpoint(
            best_path, template={"params": ts.params,
                                 "opt_state": ts.opt_state, "iteration": 0}
        )
        with open(os.path.join(ckpt_dir, "best.json")) as f:
            best_info = json.load(f)
        table[f"{lab}_best_greedy"] = eval_policy(restored["params"])
        table[f"{lab}_best_stochastic"] = eval_policy(
            restored["params"], key=3, det=False
        )
        table[f"{lab}_best_greedy"]["best_iteration"] = best_info["iteration"]
        print(f"{lab + ' best (gr)':18}: {table[f'{lab}_best_greedy']}",
              flush=True)
        print(f"{lab + ' best (st)':18}: {table[f'{lab}_best_stochastic']}",
              flush=True)

    result = {
        "scenario": scen,
        "policy": args.policy,
        "iterations": iters,
        "train_seconds": round(train_s, 1),
        "hyperparameters": {**hp, "prior_scale": PRIOR_SCALE,
                            "extra_obs": args.extra_obs,
                            "track_stochastic": args.track_stochastic,
                            "ema_decay": args.ema},
        "eval_steps": eval_steps,
        "table": table,
    }
    with open(os.path.join(out, "eval_table.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out}/eval_table.json")

    headline = (f"{lab}_trained_stochastic" if scen in STOCHASTIC_HEADLINE
                else f"{lab}_trained_greedy")
    tr = table[headline]
    # The best-eval snapshot supersedes the last iterate when it wins on
    # travel time (rl.trainer track_best).
    for cand in (f"{lab}_best_greedy", f"{lab}_best_stochastic",
                 f"{lab}_final_ema_greedy", f"{lab}_final_ema_stochastic"):
        if cand in table and (table[cand]["avg_travel_time_s"]
                              < tr["avg_travel_time_s"]):
            headline, tr = cand, table[cand]
    rnd = table["classical_random"]
    dij = table["classical_dijkstra"]
    ok_att = tr["avg_travel_time_s"] < rnd["avg_travel_time_s"] or (
        tr["done"] > rnd["done"] and tr["tstt_s"] < rnd["tstt_s"]
    )
    ok_gap = tr["relative_nash_gap"] < rnd["relative_nash_gap"]
    print(f"\ntrained vs random: att {tr['avg_travel_time_s']} vs "
          f"{rnd['avg_travel_time_s']}, gap {tr['relative_nash_gap']} vs "
          f"{rnd['relative_nash_gap']} -> {'PASS' if ok_att and ok_gap else 'FAIL'}")
    print(f"dijkstra reference: att {dij['avg_travel_time_s']}, "
          f"gap {dij['relative_nash_gap']}")
    return 0 if (ok_att and ok_gap) else 1


if __name__ == "__main__":
    raise SystemExit(main())
