"""v0 image-observation pipeline (the reference's ``obs_type='image'``
capability: stacked (H*obs_depth, W, 3) uint8 frames with frameskip 4,
multi_robot_puzzle_00.py:161-162,197-200,594-601 -- declared but off by
default there, preserved here as an explicit wrapper).

Physics runs batched on device; frames are rasterized host-side (C++
rasterizer when built) from state snapshots, exactly the split the
reference's pyglet glReadPixels pipeline implied.
"""

from __future__ import annotations

import collections
import dataclasses

import numpy as np

import jax


class ImageObsEnv:
    """Single-env image-observation variant of MultiRobotPuzzle-v0."""

    def __init__(self, env_id: str = "MultiRobotPuzzle-v0", obs_depth: int = 3,
                 frameskip: int = 4, downsample: int = 1, seed: int = 0):
        from gym_puzzles_tpu.api.registry import registry_spec
        from gym_puzzles_tpu.envs.v0 import V0Env

        base_cfg = registry_spec(env_id)
        assert base_cfg.variant == "v0", "image obs is a v0 capability"
        cfg = dataclasses.replace(base_cfg, frameskip=frameskip)
        self._logic = V0Env(cfg)
        self._params = self._logic.default_params()
        self._reset = jax.jit(self._logic.reset)
        self._step = jax.jit(self._logic.step)
        self._key = jax.random.key(seed)
        self.obs_depth = obs_depth
        self.downsample = downsample
        self._frames = collections.deque(maxlen=obs_depth)
        h = 480 // downsample
        w = 640 // downsample
        self.observation_shape = (h * obs_depth, w, 3)

    def _frame(self, state):
        from gym_puzzles_tpu.render import render_state

        img = render_state(self._logic, state)
        if self.downsample > 1:
            img = img[:: self.downsample, :: self.downsample]
        return img

    def _obs(self):
        while len(self._frames) < self.obs_depth:
            self._frames.appendleft(np.zeros_like(self._frames[0]))
        return np.concatenate(list(self._frames), axis=0)

    def reset(self):
        self._key, k = jax.random.split(self._key)
        self._state, _low = self._reset(k, self._params)
        self._frames.clear()
        self._frames.append(self._frame(self._state))
        return self._obs()

    def step(self, action):
        self._state, _low, reward, done, info = self._step(
            self._state, np.asarray(action, np.float32), self._params
        )
        self._frames.append(self._frame(self._state))
        return self._obs(), float(reward), bool(done), {
            "done_status": int(info["done_status"]),
        }
