"""Drop-in adapters for external trainers.

``GymPuzzleEnv`` -- single-env, old-Gym 0.21 calling convention exactly as
the reference registers it (reset() -> obs, step(a) -> (obs, reward, done,
info), seed(), render(mode), plus the reward-tuning hooks set_reward_params
/ update_params / update_goal, 00.py:231-246).  numpy in / numpy out, so
SB3-style code can switch from ``gym.make('MultiRobotPuzzle-v0')`` to
``gym_puzzles_tpu.api.gym_compat.GymPuzzleEnv('MultiRobotPuzzle-v0')``.

``GymnasiumVectorAdapter`` -- gymnasium.vector.VectorEnv-shaped wrapper
around the batched env (reset(seed)->(obs, info), step->5-tuple with
terminated/truncated split).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class GymPuzzleEnv:
    metadata = {"render.modes": ["human", "rgb_array", "agent"], "video.frames_per_second": 50}

    def __init__(self, env_id: str, seed: int | None = None):
        from gym_puzzles_tpu.api.registry import _logic, registry_spec

        self.spec_cfg = registry_spec(env_id)
        self._logic = _logic(env_id)
        self._params = self._logic.default_params()
        self._reset = jax.jit(self._logic.reset)
        self._step = jax.jit(self._logic.step)
        self._key = jax.random.key(0 if seed is None else seed)
        self._state = None
        self._viewer = None
        self.observation_space = _space(self.spec_cfg.obs_dim)
        self.action_space = _space(self.spec_cfg.act_dim, low=-1.0, high=1.0)

    # -- old gym API --------------------------------------------------------
    def seed(self, seed=None):
        self._key = jax.random.key(0 if seed is None else seed)
        return [seed]

    def reset(self):
        self._key, k = jax.random.split(self._key)
        self._state, obs = self._reset(k, self._params)
        return np.asarray(obs)

    def step(self, action):
        action = jnp.asarray(np.asarray(action, np.float32))
        self._state, obs, reward, done, info = self._step(self._state, action, self._params)
        return (
            np.asarray(obs),
            float(reward),
            bool(done),
            {"done_status": int(info["done_status"])},
        )

    def render(self, mode="human"):
        from gym_puzzles_tpu.render import render_state

        style = "agent_vision" if mode == "agent" else "human_vision"
        frame = render_state(self._logic, self._state, mode=style)
        if mode in ("rgb_array", "state_pixels", "agent"):
            return frame
        # mode='human': live display (the reference's pyglet viewer,
        # 00.py:528-534) -- interactive matplotlib window when a display
        # exists, ANSI terminal frames otherwise (render/window.py)
        if self._viewer is None:
            from gym_puzzles_tpu.render.window import LiveViewer

            self._viewer = LiveViewer()
        self._viewer.show(np.asarray(frame))
        return frame

    def close(self):
        if self._viewer is not None:
            self._viewer.close()
            self._viewer = None

    # -- reference reward-tuning hooks (00.py:231-246) ----------------------
    def set_reward_params(self, agentDelta=None, agentDistance=None, blockDelta=None,
                          blockDistance=None, puzzleComp=None, outOfBounds=None,
                          blkOutOfBounds=None):
        p = self._params
        f = lambda v, old: old if v is None else jnp.asarray(v, jnp.float32)
        self._params = p.replace(
            weight_delta_agent=f(agentDelta, p.weight_delta_agent),
            weight_agent_dist=f(agentDistance, p.weight_agent_dist),
            weight_delta_block=f(blockDelta, p.weight_delta_block),
            weight_blk_dist=f(blockDistance, p.weight_blk_dist),
            puzzle_complete_reward=f(puzzleComp, p.puzzle_complete_reward),
            out_of_bounds_penalty=f(outOfBounds, p.out_of_bounds_penalty),
            blk_out_of_bounds_penalty=f(blkOutOfBounds, p.blk_out_of_bounds_penalty),
        )

    def update_params(self, timestep, decay):
        self._params = self._params.update_params(timestep, decay)

    def update_goal(self, epoch, nb_epochs):
        from gym_puzzles_tpu.envs import config as C

        base = {"v0": C.V0_EPSILON, "v2": C.V2_EPSILON, "v3": C.V3_EPSILON}[
            self.spec_cfg.variant
        ]
        self._params = self._params.update_goal(epoch, nb_epochs, base)


class GymnasiumVectorAdapter:
    """gymnasium.vector-style API over the batched env."""

    def __init__(self, env_id: str, num_envs: int, **make_kw):
        from gym_puzzles_tpu.api.registry import make

        self.env = make(env_id, num_envs=num_envs, **make_kw)
        self.num_envs = num_envs
        self._params = self.env.default_params()
        self._vstate = None
        self.single_observation_space = self.env.single_observation_space
        self.single_action_space = self.env.single_action_space

    def reset(self, seed=None, options=None):
        key = jax.random.key(0 if seed is None else seed)
        self._vstate, obs = self.env.reset(key, self._params)
        return np.asarray(obs), {}

    def step(self, actions):
        self._vstate, obs, reward, done, info = self.env.step(
            self._vstate, jnp.asarray(np.asarray(actions, np.float32)), self._params
        )
        truncated = np.asarray(info["truncated"])
        terminated = np.asarray(done) & ~truncated
        return (
            np.asarray(obs),
            np.asarray(reward),
            terminated,
            truncated,
            {"done_status": np.asarray(info["done_status"])},
        )

    def close(self):
        pass


def _space(dim, low=float("-inf"), high=float("inf")):
    try:
        from gymnasium import spaces

        return spaces.Box(low=low, high=high, shape=(dim,), dtype=np.float32)
    except Exception:
        from gym_puzzles_tpu.api.vector import _box_space

        return _box_space(dim, low, high)
