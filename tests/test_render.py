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
