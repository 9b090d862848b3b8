"""Measure where a step's time goes: linear fit of chunk time vs
(velocity_iters, position_iters) to split the Pallas solve from the
surrounding XLA (narrowphase / islands / obs / reward / autoreset).

Usage: python docs/benchmarks/profile_split.py [num_envs]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
from jax import lax


def time_chunk(env, params, iters_pair, chunk=200, reps=3):
    import gym_puzzles_tpu.envs.base as base  # noqa: F401

    key = jax.random.key(0)
    vstate, obs = env.reset(key, params)
    actions = jax.random.uniform(
        jax.random.key(1), (chunk, env.num_envs, env.cfg.act_dim), minval=-1.0, maxval=1.0
    )

    @jax.jit
    def rollout(vstate, actions):
        def f(vs, a):
            vs, _obs, r, d, _ = env._step_fn(vs, a, params)
            return vs, (r.sum(), d.sum())

        vs, (rs, ds) = lax.scan(f, vstate, actions)
        return vs, rs.sum()

    vstate2, rsum = rollout(vstate, actions)
    float(rsum)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        _, rsum = rollout(vstate, actions)
        float(rsum)
        best = min(best, time.time() - t0)
    return best


def main(num_envs=4096):
    from gym_puzzles_tpu.api.registry import make, _logic
    from gym_puzzles_tpu.utils import enable_compilation_cache
    from gym_puzzles_tpu.api.vector import VectorEnv

    enable_compilation_cache()
    configs = [(180, 60), (60, 20), (20, 60), (180, 20), (1, 1)]
    results = {}
    for vi, pi in configs:
        logic = _logic("MultiRobotPuzzle-v0")
        cfg = dataclasses.replace(logic.cfg, velocity_iters=vi, position_iters=pi)
        logic = type(logic)(cfg)
        env = VectorEnv(logic, num_envs, backend="pallas")
        params = env.default_params()
        dt = time_chunk(env, params, (vi, pi))
        results[(vi, pi)] = dt
        print(f"vel={vi:4d} pos={pi:3d}: {dt*1e3:8.1f} ms/chunk "
              f"({200*num_envs/dt:,.0f} steps/s)", flush=True)

    # least-squares fit t = a + b*vi + c*pi
    import numpy as np

    A = np.array([[1.0, vi, pi] for (vi, pi) in results])
    y = np.array(list(results.values()))
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    a, b, c = coef
    print(f"fit per-chunk: overhead {a*1e3:.1f} ms + {b*1e6:.1f} us/vel-iter "
          f"+ {c*1e6:.1f} us/pos-iter")
    print(f"at 180/60: overhead {a*1e3:.1f} ms, vel {180*b*1e3:.1f} ms, "
          f"pos {60*c*1e3:.1f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
