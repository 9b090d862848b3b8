"""Renderer smoke tests: frames have the right shape and show the scene."""

import numpy as np
import jax
import pytest

import gym_puzzles_tpu as gpt
from gym_puzzles_tpu.api.registry import _logic


@pytest.mark.parametrize("env_id,hw", [
    ("MultiRobotPuzzle-v0", (480, 640)),
    ("MultiRobotPuzzle-v2", (810, 1440)),
    ("MultiRobotPuzzle-v3", (480, 640)),
])
def test_render_shapes(env_id, hw):
    from gym_puzzles_tpu.render import render_state

    logic = _logic(env_id)
    state, _obs = jax.jit(logic.reset_fast)(jax.random.key(0), logic.default_params())
    img = render_state(logic, state)
    assert img.shape == (*hw, 3) and img.dtype == np.uint8
    # scene is not empty: some non-black pixels from walls/bodies/goal
    assert (img.sum(axis=2) > 0).mean() > 0.01


def test_agent_vision_mode():
    from gym_puzzles_tpu.render import render_state

    logic = _logic("MultiRobotPuzzle-v2")
    state, _ = jax.jit(logic.reset_fast)(jax.random.key(1), logic.default_params())
    human = render_state(logic, state, mode="human_vision")
    agent = render_state(logic, state, mode="agent_vision")
    # agent vision drops the fills -> strictly fewer lit pixels
    assert (agent.sum(axis=2) > 0).sum() < (human.sum(axis=2) > 0).sum()


def test_cpp_and_numpy_rasterizers_agree():
    from gym_puzzles_tpu.render import raster

    if raster._cpp is None:
        pytest.skip("native rasterizer not built")
    img_a = np.zeros((64, 64, 3), np.uint8)
    img_b = np.zeros((64, 64, 3), np.uint8)
    tri = np.array([[5.0, 5.0], [50.0, 10.0], [20.0, 55.0]])
    raster._cpp.fill_polygon(img_a, tri.astype(np.float32), (255, 10, 20))
    cpp, raster._cpp = raster._cpp, None
    try:
        raster._fill_polygon(img_b, tri, (255, 10, 20))
    finally:
        raster._cpp = cpp
    assert (img_a == img_b).mean() > 0.995


def test_image_obs_pipeline():
    from gym_puzzles_tpu.api.image_obs import ImageObsEnv

    env = ImageObsEnv(obs_depth=2, frameskip=4, downsample=2)
    obs = env.reset()
    assert obs.shape == (2 * 240, 320, 3)
    obs, r, d, info = env.step(np.zeros(6, np.float32))
    assert obs.shape == (2 * 240, 320, 3)
    assert obs.dtype == np.uint8


@pytest.mark.parametrize("env_id,mode", [
    ("MultiRobotPuzzle-v0", "human_vision"),
    ("MultiRobotPuzzle-v2", "agent_vision"),
    ("MultiRobotPuzzle-v3", "human_vision"),
])
def test_device_renderer_matches_host(env_id, mode):
    """On-device (jitted) rasterizer == host rasterizer, pixel for pixel,
    at the image pipeline's slice-style downsampling."""
    from gym_puzzles_tpu.render.device import make_device_renderer
    from gym_puzzles_tpu.render.raster import render_state

    logic = _logic(env_id)
    state, _ = jax.jit(logic.reset_fast)(jax.random.key(5), logic.default_params())
    dev = jax.jit(make_device_renderer(logic, downsample=4, mode=mode))
    img_d = np.asarray(dev(state))
    img_h = render_state(logic, state, mode=mode)[::4, ::4]
    assert img_d.shape == img_h.shape
    match = (img_d == img_h).all(axis=-1).mean()
    assert match == 1.0, f"device/host pixel mismatch: {match:.5f}"


def test_device_image_vector_env():
    """Batched on-device image obs: stacked uint8 frames, zero-padded at
    episode start, fresh stack after autoreset (00.py:197-200 layout)."""
    from gym_puzzles_tpu.api.image_obs import DeviceImageVectorEnv

    env = DeviceImageVectorEnv("MultiRobotPuzzle-v0", num_envs=4,
                               obs_depth=3, downsample=8)
    ist, obs = env.reset(jax.random.key(0))
    h, w = 480 // 8, 640 // 8
    assert obs.shape == (4, 3 * h, w, 3) and obs.dtype == np.uint8
    # reset stack: two zero frames + one rendered frame
    obs_np = np.asarray(obs)
    assert (obs_np[:, : 2 * h] == 0).all()
    assert (obs_np[:, 2 * h:] > 0).any()
    a = np.zeros((4, 6), np.float32)
    ist, obs, r, d, _ = env.step(ist, a)
    obs_np = np.asarray(obs)
    assert (obs_np[:, :h] == 0).all() and (obs_np[:, h:] > 0).any()
    ist, obs, r, d, _ = env.step(ist, a)
    assert (np.asarray(obs) > 0).any(axis=(1, 2, 3)).all()  # stack full


def test_cnn_ppo_train_step():
    """PPO with the SB3-CnnPolicy-equivalent net on on-device pixels."""
    from gym_puzzles_tpu.api.image_obs import DeviceImageVectorEnv
    from gym_puzzles_tpu.train.ppo import PPO, PPOConfig

    env = DeviceImageVectorEnv("MultiRobotPuzzle-v0", num_envs=2, downsample=16)
    cfg = PPOConfig(env_id="MultiRobotPuzzle-v0", policy="cnn", n_envs=2,
                    n_steps=4, batch_size=8, n_epochs=1, total_timesteps=8)
    algo = PPO(cfg, env=env)
    ts = algo.init_state()
    ts, m = algo.train_step(ts)
    m = jax.device_get(m)
    assert np.isfinite(m["loss"]) and int(m["timesteps"]) == 8
