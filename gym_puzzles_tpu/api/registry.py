"""Env registry: the rebuild's equivalent of the reference's Gym
registration (gym_puzzles/__init__.py:3-36), returning jit-vectorized envs
instead of registry entries.

    env = make("MultiRobotPuzzle-v0", num_envs=4096)
    vstate, obs = env.reset(jax.random.key(0))
    vstate, obs, reward, done, info = env.step(vstate, actions)
"""

from __future__ import annotations

import functools

from gym_puzzles_tpu.envs.config import VARIANTS, EnvConfig
from gym_puzzles_tpu.api.vector import VectorEnv

ENV_IDS = tuple(VARIANTS)


def registry_spec(env_id: str) -> EnvConfig:
    """Static spec (obs/act dims, step limit 2000/3000/1500, reward
    thresholds 500/110 -- gym_puzzles/__init__.py)."""
    try:
        return VARIANTS[env_id]
    except KeyError:
        raise KeyError(f"unknown env id {env_id!r}; known: {list(ENV_IDS)}") from None


@functools.lru_cache(maxsize=None)
def _logic(env_id: str, solver_unroll: bool = False):
    import dataclasses

    cfg = registry_spec(env_id)
    if solver_unroll:
        cfg = dataclasses.replace(cfg, solver_unroll=True)
    if cfg.variant == "v0":
        from gym_puzzles_tpu.envs.v0 import V0Env

        return V0Env(cfg)
    if cfg.variant == "v2":
        from gym_puzzles_tpu.envs.v2 import V2Env

        return V2Env(cfg)
    from gym_puzzles_tpu.envs.v3 import V3Env

    return V3Env(cfg)


def make(env_id: str, num_envs: int = 1, auto_reset: bool = True,
         reset_mode: str = "fast", solver_unroll: bool = False,
         batch_axis: int = -1, backend: str = "xla") -> VectorEnv:
    """Build a batched env.  ``reset_mode='reference'`` reproduces the
    reference's reset-takes-a-random-step contract exactly (00.py:411).
    ``backend='pallas'`` runs the contact solve in the VMEM-resident TPU
    kernel (the throughput path; requires num_envs % 128 == 0)."""
    return VectorEnv(_logic(env_id, solver_unroll), num_envs, auto_reset=auto_reset,
                     reset_mode=reset_mode, batch_axis=batch_axis, backend=backend)
