"""Hyperparameter sweeps.

The reference tunes with a wandb Bayes sweep over PPO hyperparameters
maximizing rollout/ep_rew_mean (train/sweep-bayes.yml), run as independent
agents on separate machines (README.md:101-107).  This module provides:

* the same search space as a dict (SWEEP_SPACE, mirroring sweep-bayes.yml);
* a local random-search runner that trains short budgets sequentially on
  the local chip(s) -- no external service needed;
* ``wandb_sweep_config()`` producing a wandb-compatible sweep dict for
  users who do want wandb agents (`wandb.sweep(wandb_sweep_config())`).
"""

from __future__ import annotations

import dataclasses
import json
import math
import random

# train/sweep-bayes.yml:7-39
SWEEP_SPACE = {
    "learning_rate": {"distribution": "log_uniform", "min": math.log(1e-5), "max": math.log(1e-2)},
    "clip_range": {"values": [0.1, 0.2, 0.3]},
    "batch_size": {"values": [64, 128, 256]},
    "n_epochs": {"values": [5, 10, 20, 50]},
    "ent_coef": {"distribution": "log_uniform", "min": math.log(1e-4), "max": math.log(0.1)},
    "n_steps": {"values": [1024, 2048, 4096]},
    "max_grad_norm": {"values": [0.5, 1.0, 5.0]},
    "vf_coef": {"values": [0.25, 0.5, 1.0]},
    "n_envs": {"values": [4, 6, 8]},
}

METRIC = {"name": "rollout/ep_rew_mean", "goal": "maximize"}


def wandb_sweep_config(program: str = "python -m gym_puzzles_tpu.train.cli"):
    return {"program": program, "method": "bayes", "metric": METRIC,
            "parameters": SWEEP_SPACE}


def sample_params(rng: random.Random) -> dict:
    out = {}
    for name, spec in SWEEP_SPACE.items():
        if "values" in spec:
            out[name] = rng.choice(spec["values"])
        else:
            out[name] = math.exp(rng.uniform(spec["min"], spec["max"]))
    return out


def run_local_sweep(env_id: str = "MultiRobotPuzzle-v0", trials: int = 8,
                    budget_timesteps: int = 100_000, seed: int = 0,
                    n_envs: int | None = None, log=print):
    """Sequential random search; returns trials sorted by mean episode
    return over the final quarter of training."""
    from gym_puzzles_tpu.train.ppo import PPO, PPOConfig
    import numpy as np
    import jax

    rng = random.Random(seed)
    results = []
    for t in range(trials):
        hp = sample_params(rng)
        if n_envs is not None:
            hp["n_envs"] = n_envs
        cfg = PPOConfig(env_id=env_id, total_timesteps=budget_timesteps,
                        seed=seed + t, **{k: v for k, v in hp.items()
                                          if k in PPOConfig.__dataclass_fields__})
        algo = PPO(cfg)
        rewards = []

        def log_fn(u, m):
            if np.isfinite(m["ep_rew_mean"]):
                rewards.append(float(m["ep_rew_mean"]))

        algo.learn(log_fn=log_fn)
        tail = rewards[-max(1, len(rewards) // 4):] if rewards else [float("-inf")]
        score = float(np.mean(tail))
        results.append({"trial": t, "score": score, "params": hp})
        log(json.dumps(results[-1]))
    return sorted(results, key=lambda r: -r["score"])
