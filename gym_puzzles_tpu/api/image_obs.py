"""v0 image-observation pipeline (the reference's ``obs_type='image'``
capability: stacked (H*obs_depth, W, 3) uint8 frames with frameskip 4,
multi_robot_puzzle_00.py:161-162,197-200,594-601 -- declared but off by
default there, preserved here as an explicit wrapper).

Two implementations:

* :class:`ImageObsEnv` -- single env, frames rasterized host-side (C++
  rasterizer when built) from state snapshots, the split the reference's
  pyglet glReadPixels pipeline implied.
* :class:`DeviceImageVectorEnv` -- the TPU-native path: thousands of envs
  render their frames *inside* the jitted step (render/device.py), frame
  stacks carried on device, so a CNN policy trains on pixels with zero
  host round-trips per step.
"""

from __future__ import annotations

import collections
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct


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


@struct.dataclass
class ImageVectorState:
    """Batched env state + on-device frame stacks."""

    vec: object  # VectorState
    frames: object  # [E, depth, h, w, 3] uint8, oldest first


class DeviceImageVectorEnv:
    """Batched image-obs env with on-device rendering (duck-typed to
    :class:`~gym_puzzles_tpu.api.vector.VectorEnv` so PPO drives it
    unchanged).

    Obs = the reference's stacked frame layout, batched:
    ``[E, h*obs_depth, w, 3]`` uint8 (00.py:197-200), zero-padded at episode
    starts exactly like the host pipeline.  Physics honours the reference's
    image-mode ``frameskip`` (default 4, 00.py:161-162).
    """

    def __init__(self, env_id: str = "MultiRobotPuzzle-v0", num_envs: int = 8,
                 obs_depth: int = 3, frameskip: int = 4, downsample: int = 4,
                 backend: str = "xla", mode: str = "human_vision",
                 block_shape: str = "t", auto_reset: bool = True,
                 reset_mode: str = "fast", velocity_iters: int | None = None,
                 position_iters: int | None = None):
        from gym_puzzles_tpu.api.registry import _image_logic
        from gym_puzzles_tpu.api.vector import VectorEnv
        from gym_puzzles_tpu.render.device import make_device_renderer

        logic = _image_logic(env_id, frameskip, block_shape,
                             velocity_iters, position_iters)
        self._env = VectorEnv(logic, num_envs, backend=backend,
                              auto_reset=auto_reset, reset_mode=reset_mode)
        self.logic = logic
        self.cfg = logic.cfg
        self.num_envs = num_envs
        self.obs_depth = obs_depth
        # pipeline config, so evaluation can rebuild the training obs
        # pipeline exactly (same frameskip/downsample/mode -> same obs_shape)
        self.frameskip = frameskip
        self.downsample = downsample
        self.mode = mode
        self.block_shape = block_shape
        render = make_device_renderer(logic, downsample=downsample, mode=mode)
        h, w = render.height, render.width
        self.obs_shape = (h * obs_depth, w, 3)
        ax = self._env.batch_axis
        render_batch = jax.vmap(render, in_axes=ax, out_axes=0)  # [E, h, w, 3]

        def stack_obs(frames):
            E = frames.shape[0]
            return frames.reshape(E, obs_depth * h, w, 3)

        @jax.jit
        def _reset(keys, params):
            vec, _low = self._env._reset_fn(keys, params)
            frame = render_batch(vec.env)
            frames = jnp.zeros((num_envs, obs_depth, h, w, 3), jnp.uint8)
            frames = frames.at[:, -1].set(frame)
            return ImageVectorState(vec=vec, frames=frames), stack_obs(frames)

        @jax.jit
        def _step(istate, action, params):
            vec, _low, reward, done, info = self._env._step_fn(
                istate.vec, action, params
            )
            frame = render_batch(vec.env)  # post-autoreset state
            # done -> fresh zero-padded stack (episode boundary), else shift
            shifted = jnp.concatenate(
                [istate.frames[:, 1:], frame[:, None]], axis=1
            )
            fresh = jnp.zeros_like(istate.frames).at[:, -1].set(frame)
            frames = jnp.where(done[:, None, None, None, None], fresh, shifted)
            return (ImageVectorState(vec=vec, frames=frames), stack_obs(frames),
                    reward, done, info)

        self._reset_fn = _reset
        self._step_fn = _step

    def default_params(self):
        return self._env.default_params()

    def reset(self, key, params=None):
        params = self.default_params() if params is None else params
        if getattr(key, "ndim", 0) == 0:
            key = jax.random.split(key, self.num_envs)
        return self._reset_fn(key, params)

    def step(self, istate, action, params=None):
        params = self.default_params() if params is None else params
        return self._step_fn(istate, action, params)
