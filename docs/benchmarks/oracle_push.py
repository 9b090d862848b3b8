#!/usr/bin/env python
"""Physical-ceiling probe for the v0-family reward bars: a hand-scripted
oracle pusher, evaluated honestly.

Heavy-v0's registered reward_threshold is 500 (gym_puzzles/__init__.py:14)
under a reward that charges per-step distance penalties for up to 3000
steps and pays +10000 on completion (multi_robot_puzzle_00.py:479-517).
Whether +500 is *reachable* therefore depends on how fast the block can
physically be pushed home: a policy that completes the puzzle in 1850
steps still nets about -25k (measured, docs/benchmarks/eval_hv0_X2_*).

This script drives every agent with a scripted controller -- head to the
point a fixed offset BEHIND the block (opposite the goal), which herds all
agents into a pushing line, then lean into the block at max speed:

    target   = block + offset * (block - goal)/|block - goal|
    velocity = unit_inf(target - agent)        (max-speed in both axes)

computed purely from the public observation layout (agent->block deltas,
block->goal deltas; 00.py:442-472).  Rolled on the fused TPU backend over
128 i.i.d. spawns per offset, under DEFAULT reward weights -- exactly the
honest-eval protocol.  The resulting (completion rate, completion time,
mean return) distribution is the reference's own physics ceiling for this
controller family, and bounds what any trained policy can earn:

    python docs/benchmarks/oracle_push.py MultiRobotPuzzleHeavy-v0 \
        > docs/benchmarks/oracle_push_hv0_r4.jsonl
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


from gym_puzzles_tpu.train.scripted import planner_action, pusher_action  # noqa: E402


def run(env_id, offset_px, n=128, seed=0, controller="pusher", gate=None):
    from gym_puzzles_tpu.api.registry import make

    backend = "fused" if jax.default_backend() == "tpu" else "xla"
    env = make(env_id, num_envs=n, auto_reset=False, reset_mode="reference",
               backend=backend)
    params = env.default_params()
    A = env.cfg.act_dim // 3
    max_steps = env.cfg.max_episode_steps

    def step(carry, _):
        vstate, obs, finished, total, length = carry
        if controller == "planner":
            act = planner_action(obs, A, gate=gate)
        else:
            act = pusher_action(obs, A, offset_px)
        vstate, obs, reward, done, _ = env._step_fn(vstate, act, params)
        total = total + jnp.where(finished, 0.0, reward)
        length = length + jnp.where(finished, 0, 1).astype(jnp.int32)
        finished = finished | done
        return (vstate, obs, finished, total, length), None

    @jax.jit
    def roll(key):
        vstate, obs = env.reset(key, params)
        carry = (vstate, obs, jnp.zeros((n,), bool), jnp.zeros((n,), jnp.float32),
                 jnp.zeros((n,), jnp.int32))
        carry, _ = jax.lax.scan(step, carry, None, length=max_steps)
        return carry[3], carry[4]

    totals, lengths = jax.device_get(roll(jax.random.key(seed)))
    done = lengths < max_steps
    row = {
        "env_id": env_id,
        "controller": controller,
        "offset_px": offset_px,
        "gate": gate,
        "n": n,
        "completed": int(done.sum()),
        "mean_return": float(totals.mean()),
        "median_return": float(np.median(totals)),
        "over_bar": int((totals > 500).sum()),
        "median_len": int(np.median(lengths[done])) if done.any() else None,
        "p90_len": int(np.percentile(lengths[done], 90)) if done.any() else None,
        "median_completed_return": float(np.median(totals[done])) if done.any() else None,
        "best_return": float(totals.max()),
    }
    return row


def main():
    from gym_puzzles_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    env_id = sys.argv[1] if len(sys.argv) > 1 else "MultiRobotPuzzleHeavy-v0"
    controller = sys.argv[2] if len(sys.argv) > 2 else "pusher"
    if controller == "planner":
        for gate in (None,):
            print(json.dumps(run(env_id, 0.0, controller="planner",
                                 gate=gate)), flush=True)
    else:
        for offset in (110.0, 140.0, 170.0):
            print(json.dumps(run(env_id, offset)), flush=True)


if __name__ == "__main__":
    main()
