"""Hardware-vectorized env: jit + vmap over a batch of env states.

This is the TPU replacement for the reference's ``DummyVecEnv`` (a sequential
Python loop over 6 envs, train/train.py:80): thousands of envs advance in
lockstep inside one XLA program, with per-env PRNG keys replacing the global
``np.random`` stream (SURVEY quirk #2).

Reset semantics are selectable:

* ``reset_mode='reference'`` -- reset takes one uniform random action and
  returns that step's observation, byte-for-byte the reference contract
  (00.py:411).  Costs one physics step per reset.
* ``reset_mode='fast'`` (default) -- reset returns the spawned state's
  observation directly.  Same distribution over states up to one random
  step; used for training/benchmarking where autoreset would otherwise pay
  a second physics step on every env every step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from gym_puzzles_tpu.envs.base import PuzzleEnvLogic
from gym_puzzles_tpu.envs.config import RewardParams


@struct.dataclass
class VectorState:
    """Batched env state + per-env autoreset keys."""

    env: object  # EnvState with [E, ...] leaves
    key: object  # [E] PRNG keys


def _tree_select(done, a, b, axis=0):
    def sel(x, y):
        if axis == -1:
            m = done  # trailing batch axis broadcasts naturally
        else:
            m = done.reshape(done.shape + (1,) * (x.ndim - 1))
        return jnp.where(m, x, y)

    return jax.tree_util.tree_map(sel, a, b)


class VectorEnv:
    """Batched, jitted env.  All methods are pure: state in, state out.

    ``batch_axis`` picks where the env-batch dimension lives in the *state*
    pytree.  The default -1 is lane-major: on TPU the minor-most dimension
    maps to the 128 VPU lanes, so per-env physics scalars occupy full lanes
    ([B, 2, E] instead of [E, B, 2], which would waste 64x the vector unit
    on the padded trailing dims).  The public obs/action/reward contract is
    batch-FIRST regardless; transposes happen only at the obs boundary.
    """

    def __init__(self, logic: PuzzleEnvLogic, num_envs: int, auto_reset: bool = True,
                 reset_mode: str = "fast", batch_axis: int = -1,
                 backend: str = "xla"):
        assert reset_mode in ("fast", "reference")
        assert batch_axis in (0, -1)
        assert backend in ("xla", "pallas", "fused")
        if backend in ("pallas", "fused"):
            assert batch_axis == -1, "pallas backend requires lane-major layout"
            assert num_envs % 128 == 0, "pallas backend needs num_envs % 128 == 0"
        self.logic = logic
        self.cfg = logic.cfg
        self.num_envs = num_envs
        self.auto_reset = auto_reset
        self.reset_mode = reset_mode
        self.batch_axis = batch_axis
        self.backend = backend
        ax = batch_axis

        reset_one = logic.reset if reset_mode == "reference" else logic.reset_fast
        self._reset_one = reset_one

        def fix_obs(obs):
            return obs.T if ax == -1 else obs

        def step_backend(state, act, params):
            """One batched engine step on the selected backend."""
            if backend == "fused":
                return logic.step_fused(state, act, params)
            if backend == "pallas":
                return logic.step_batched(state, act, params)
            return jax.vmap(logic.step, in_axes=(ax, ax, None), out_axes=ax)(
                state, act, params
            )

        def reset_batch(reset_keys, params):
            """Batched reset.  In reference mode the quirk's random step
            (00.py:411) runs through the SAME backend step as training --
            on the fused/pallas backends this is what makes the faithful
            reset contract affordable (one extra kernel launch instead of a
            full XLA-path step; see docs/BENCHMARKS.md)."""
            if reset_mode != "reference":
                return jax.vmap(reset_one, in_axes=(0, None), out_axes=ax)(
                    reset_keys, params
                )
            state, act = jax.vmap(logic.reset_spawn, out_axes=ax)(reset_keys)
            state, obs, _r, _d, _info = step_backend(state, act, params)
            # the random step does not count against the episode clock
            t0 = jnp.zeros_like(state.t)
            return state.replace(t=t0), obs

        @jax.jit
        def _reset(keys, params):
            env_keys, reset_keys = jax.vmap(jax.random.split, out_axes=1)(keys)
            state, obs = reset_batch(reset_keys, params)
            return VectorState(env=state, key=env_keys), fix_obs(obs)

        @jax.jit
        def _step(vstate, action, params):
            act = action.T if ax == -1 else action  # user passes [E, act_dim]
            state, obs, reward, done, info = step_backend(vstate.env, act, params)
            key = vstate.key
            if auto_reset:
                next_keys, reset_keys = jax.vmap(jax.random.split, out_axes=1)(key)
                r_state, r_obs = reset_batch(reset_keys, params)
                state = _tree_select(done, r_state, state, ax)
                obs = jnp.where(done if ax == -1 else done[:, None], r_obs, obs)
                # typed PRNG keys: 1-D mask, or broadcasting silently makes
                # an [E, E] key array and poisons the next trace
                key = jnp.where(done, next_keys, key)
            return VectorState(env=state, key=key), fix_obs(obs), reward, done, info

        self._reset_fn = _reset
        self._step_fn = _step

    # -- public -------------------------------------------------------------
    def default_params(self) -> RewardParams:
        return self.logic.default_params()

    def reset(self, key, params: RewardParams | None = None):
        """key: single PRNG key (split per env) or [E] batch of keys."""
        params = self.default_params() if params is None else params
        if getattr(key, "ndim", 0) == 0:  # single typed key -> one per env
            keys = jax.random.split(key, self.num_envs)
        else:
            keys = key
        return self._reset_fn(keys, params)

    def step(self, vstate: VectorState, action, params: RewardParams | None = None):
        """action: [E, act_dim].  Returns (vstate, obs [E, obs_dim],
        reward [E], done [E], info dict of [E] arrays)."""
        params = self.default_params() if params is None else params
        return self._step_fn(vstate, action, params)

    @functools.cached_property
    def single_observation_space(self):
        return _box_space(self.cfg.obs_dim)

    @functools.cached_property
    def single_action_space(self):
        return _box_space(self.cfg.act_dim, low=-1.0, high=1.0)


def _box_space(dim, low=float("-inf"), high=float("inf")):
    """A gymnasium Box when available, else a minimal stand-in."""
    try:
        import numpy as np
        from gymnasium import spaces

        return spaces.Box(low=low, high=high, shape=(dim,), dtype=np.float32)
    except Exception:
        import dataclasses

        @dataclasses.dataclass
        class Box:
            low: float
            high: float
            shape: tuple
            dtype: str = "float32"

        return Box(low, high, (dim,))
