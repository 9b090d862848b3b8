"""Weak-scaling benchmark: env-steps/s at 1..N devices, envs-per-device held
constant.

The BASELINE north star asks for >=90% scaling efficiency from 1 host to N.
The env batch is embarrassingly parallel (no cross-env interaction), so the
only per-update communication is the O(params) gradient all-reduce in the
PPO learner -- this harness measures exactly that overhead by timing the
``shard_map``-ed train step (rollout scan + GAE + minibatch SGD + ``psum``)
on meshes of growing size.

Usage::

    python -m gym_puzzles_tpu.parallel.scaling_bench \
        [--env MultiRobotPuzzle-v0] [--envs-per-device 2048] [--updates 3]

On a single-chip machine this degenerates to the n=1 row; on a pod slice it
produces the full efficiency ladder.  Each row prints one JSON line::

    {"metric": "scaling", "devices": n, "env_steps_per_s": r,
     "per_device": r/n, "efficiency_vs_1dev": e}
"""

from __future__ import annotations

import argparse
import json
import time

import jax

from gym_puzzles_tpu.parallel.mesh import DistributedPPO, make_mesh
from gym_puzzles_tpu.train.ppo import PPOConfig


def measure(cfg: PPOConfig, n_devices: int, updates: int = 3) -> float:
    """Best sustained env-steps/s over `updates` timed train steps."""
    mesh = make_mesh(n_devices)
    algo = DistributedPPO(cfg, mesh)
    ts = algo.init_state()
    ts, metrics = algo.train_step(ts)  # compile + warm
    jax.device_get(metrics["timesteps"])
    per_update = cfg.n_steps * cfg.n_envs
    best = 0.0
    for _ in range(updates):
        t0 = time.time()
        ts, metrics = algo.train_step(ts)
        jax.device_get(metrics["timesteps"])  # force completion (tunneled rt)
        best = max(best, per_update / (time.time() - t0))
    return best


def run(env_id: str = "MultiRobotPuzzle-v0", envs_per_device: int = 2048,
        n_steps: int = 64, updates: int = 3, backend: str | None = None):
    n_total = len(jax.devices())
    sizes = []
    n = 1
    while n <= n_total:
        sizes.append(n)
        n *= 2
    if sizes[-1] != n_total:
        sizes.append(n_total)

    rows = []
    base = None
    for n in sizes:
        cfg = PPOConfig(
            env_id=env_id,
            n_envs=envs_per_device * n,
            n_steps=n_steps,
            batch_size=envs_per_device * n,
            n_epochs=2,
            total_timesteps=n_steps * envs_per_device * n,
        )
        rate = measure(cfg, n, updates)
        if base is None:
            base = rate
        row = {
            "metric": "scaling",
            "devices": n,
            "env_steps_per_s": round(rate, 1),
            "per_device": round(rate / n, 1),
            "efficiency_vs_1dev": round(rate / (base * n), 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env", default="MultiRobotPuzzle-v0")
    p.add_argument("--envs-per-device", type=int, default=2048)
    p.add_argument("--n-steps", type=int, default=64)
    p.add_argument("--updates", type=int, default=3)
    args = p.parse_args()
    run(args.env, args.envs_per_device, args.n_steps, args.updates)


if __name__ == "__main__":
    main()
