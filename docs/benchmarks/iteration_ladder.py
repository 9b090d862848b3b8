#!/usr/bin/env python
"""Solver iteration-count ladder: throughput vs trajectory divergence.

SURVEY hard-part (d): the reference runs ``world.Step(dt, 6*30, 2*30)`` =
180 velocity / 60 position iterations (multi_robot_puzzle_00.py:428) --
~20x Box2D's own default of 8/3.  Parity pins the rebuild to 180/60; this
script measures what reduced iteration counts buy (fused-kernel steps/s)
and cost (trajectory divergence vs the 180/60 configuration), on v0 and
v2, on the real chip:

    python docs/benchmarks/iteration_ladder.py > docs/benchmarks/iteration_ladder_r4.jsonl

One JSON row per (env, vel_iters, pos_iters): throughput at 4096 envs and
max-abs obs divergence of a 128-env random-action drive vs the 180/60
trajectory at checkpoints 50/100/200/400 steps (v0 obs are pixel-scale,
v2 normalized units -- compare within an env, not across).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

LADDER = [(180, 60), (60, 20), (8, 3)]
ENVS = ["MultiRobotPuzzle-v0", "MultiRobotPuzzle-v2"]
CHECKPOINTS = (50, 100, 200, 400)


def throughput(env_id, vi, pi, num_envs=4096, chunk=200, iters=3):
    from gym_puzzles_tpu.api.registry import make

    env = make(env_id, num_envs=num_envs, backend="fused",
               velocity_iters=vi, position_iters=pi)
    params = env.default_params()
    vstate, _ = env.reset(jax.random.key(0), params)
    actions = jax.random.uniform(
        jax.random.key(1), (chunk, num_envs, env.cfg.act_dim),
        minval=-1.0, maxval=1.0)

    @jax.jit
    def rollout(vstate, actions):
        def f(vs, a):
            vs, _o, r, d, _ = env._step_fn(vs, a, params)
            return vs, (r.sum(), d.sum())

        vs, (rs, ds) = lax.scan(f, vstate, actions)
        return vs, rs.sum(), ds.sum()

    t0 = time.time()
    vstate, rsum, _ = rollout(vstate, actions)
    float(rsum)  # forced device_get: the only true sync on this runtime
    print(f"# {env_id} {vi}/{pi}: compile+first {time.time()-t0:.1f}s",
          file=sys.stderr)
    best = 0.0
    for _ in range(iters):
        t0 = time.time()
        vstate, rsum, _ = rollout(vstate, actions)
        float(rsum)
        best = max(best, chunk * num_envs / (time.time() - t0))
    return best


def divergence(env_id, vi, pi, n_envs=128, n_steps=400):
    """Shared spawn + shared random action stream; obs divergence of the
    (vi, pi) trajectory vs the reference-config 180/60 trajectory."""
    from gym_puzzles_tpu.api.registry import make

    ref = make(env_id, num_envs=n_envs, backend="fused", auto_reset=False)
    red = make(env_id, num_envs=n_envs, backend="fused", auto_reset=False,
               velocity_iters=vi, position_iters=pi)
    params = ref.default_params()
    key = jax.random.key(7)
    vs_a, obs_a = ref.reset(key, params)
    vs_b, obs_b = red.reset(key, params)
    acts = jax.random.uniform(
        jax.random.key(8), (n_steps, n_envs, ref.cfg.act_dim),
        minval=-1.0, maxval=1.0)

    def roll(env):
        @jax.jit
        def run(vstate, actions):
            def f(vs, a):
                vs, obs, r, d, _ = env._step_fn(vs, a, params)
                return vs, (obs, r, d)

            return lax.scan(f, vstate, actions)

        return run

    _, (obs_r, rew_r, done_r) = roll(ref)(vs_a, acts)
    _, (obs_x, rew_x, done_x) = roll(red)(vs_b, acts)
    obs_r, obs_x = np.asarray(obs_r), np.asarray(obs_x)
    out = {}
    for c in CHECKPOINTS:
        out[f"obs_maxdiff_{c}"] = float(
            np.abs(obs_r[:c] - obs_x[:c]).max())
    out["return_reldiff"] = float(
        np.abs(np.asarray(rew_r).sum() - np.asarray(rew_x).sum())
        / max(1.0, np.abs(np.asarray(rew_r).sum())))
    out["done_agree_frac"] = float(
        (np.asarray(done_r) == np.asarray(done_x)).mean())
    return out


def main():
    from gym_puzzles_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    for env_id in ENVS:
        for vi, pi in LADDER:
            row = {"env_id": env_id, "velocity_iters": vi,
                   "position_iters": pi}
            row["steps_per_s"] = round(throughput(env_id, vi, pi), 1)
            if (vi, pi) != (180, 60):
                row.update(divergence(env_id, vi, pi))
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
