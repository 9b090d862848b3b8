"""Golden env-level parity: the actual reference envs (via the legacy-gym
shim) and the rebuild stepped from identical injected states with identical
action sequences; obs / reward / done compared per step.

Tolerances: the engine matches Box2D to f32 round-off in free motion and to
~1e-3 m through contacts (solve-order divergence, see engine/world.py); v0
obs are pixel-scale so tolerances are in pixels.
"""

import numpy as np
import pytest

import tests.reference_oracle as oracle

import jax
import jax.numpy as jnp

from gym_puzzles_tpu.api.registry import _logic


def drive_pair(env_id, inject_fn, block_pose, agent_poses, goal=None, n_steps=40,
               update_params=None, seed=0, ref_kwargs=None, logic_kwargs=None):
    """Returns (ref_traj, our_traj): lists of (obs, reward, done)."""
    np.random.seed(123)
    ref = oracle.make_reference(env_id, **(ref_kwargs or {}))
    if update_params is not None:
        ref.update_params(*update_params)
    inject_fn(ref)

    logic = _logic(env_id, **(logic_kwargs or {}))
    params = logic.default_params()
    if update_params is not None:
        params = params.update_params(*update_params)
    pos, ang = oracle.body_origin_poses(env_id, ref)
    goal_pos = None
    if goal is not None:
        goal_pos = np.asarray(goal, np.float32)
    elif env_id.endswith("v0"):
        goal_pos = np.array([320.0, 262.5, 0.0], np.float32)
    elif env_id.endswith("v3"):
        goal_pos = logic.goal_norm
    state = logic.inject(pos, ang, goal_pos)

    step = jax.jit(logic.step)

    rng = np.random.RandomState(seed)
    act_dim = logic.cfg.act_dim
    ref_traj, our_traj = [], []
    for _ in range(n_steps):
        a = rng.uniform(-1, 1, act_dim)
        o_r, r_r, d_r, _ = ref.step(a.astype(np.float64))
        state, o_m, r_m, d_m, _ = step(state, jnp.asarray(a, jnp.float32), params)
        ref_traj.append((np.asarray(o_r, np.float64), float(r_r), bool(d_r)))
        our_traj.append((np.asarray(o_m, np.float64), float(r_m), bool(d_m)))
        if d_r or d_m:
            break
    return ref_traj, our_traj


def compare(ref_traj, our_traj, obs_atol, rew_atol):
    assert len(ref_traj) == len(our_traj)
    for t, ((o_r, r_r, d_r), (o_m, r_m, d_m)) in enumerate(zip(ref_traj, our_traj)):
        np.testing.assert_allclose(
            o_m, o_r, atol=obs_atol, err_msg=f"obs mismatch at step {t}"
        )
        assert abs(r_m - r_r) <= rew_atol, f"reward mismatch at step {t}: {r_m} vs {r_r}"
        assert d_m == d_r, f"done mismatch at step {t}"


def test_v0_parity_free_motion():
    """No contacts: agents far from block, block far from goal."""
    ref_t, our_t = drive_pair(
        "MultiRobotPuzzle-v0",
        lambda e: oracle.inject_v0(e, (16.0, 12.0, 0.5), [(4.0, 4.0, 0.0), (4.0, 11.0, 0.0)]),
        None, None, n_steps=30,
    )
    compare(ref_t, our_t, obs_atol=0.05, rew_atol=0.02)  # px units


def test_v0_parity_contact():
    """Agents start adjacent to the block and push it."""
    ref_t, our_t = drive_pair(
        "MultiRobotPuzzle-v0",
        lambda e: oracle.inject_v0(e, (10.0, 8.0, 0.0), [(7.8, 8.0, 0.0), (10.0, 5.6, 0.0)]),
        None, None, n_steps=50,
    )
    compare(ref_t, our_t, obs_atol=1.0, rew_atol=1.0)  # px; contact-order tolerance


def test_heavy_v0_parity():
    ref_t, our_t = drive_pair(
        "MultiRobotPuzzleHeavy-v0",
        lambda e: oracle.inject_v0(
            e,
            (10.0, 8.0, 0.0),
            [(6.5, 8.0, 0.0), (10.0, 4.0, 0.0), (14.0, 8.0, 0.0), (10.0, 12.5, 0.0), (4.0, 4.0, 0.0)],
        ),
        None, None, n_steps=40,
    )
    compare(ref_t, our_t, obs_atol=1.0, rew_atol=1.0)


def test_v2_parity():
    goal = (0.9, 0.4, 0.0)
    ref_t, our_t = drive_pair(
        "MultiRobotPuzzle-v2",
        lambda e: oracle.inject_v2(
            e, (1.29, 0.72, 0.3), [(0.4, 0.5, 4.712389), (0.4, 1.0, 4.712389)], goal
        ),
        None, None, goal=goal, n_steps=50, update_params=(0, 0.997),
    )
    compare(ref_t, our_t, obs_atol=0.02, rew_atol=0.05)  # normalized units


def test_heavy_v2_parity():
    goal = (0.85, 0.35, 0.0)
    ref_t, our_t = drive_pair(
        "MultiRobotPuzzleHeavy-v2",
        lambda e: oracle.inject_v2(
            e, (1.29, 0.72, 1.0), [(0.35, 0.6, 4.712389), (0.45, 0.95, 4.712389)], goal
        ),
        None, None, goal=goal, n_steps=40, update_params=(0, 0.997),
    )
    compare(ref_t, our_t, obs_atol=0.02, rew_atol=0.05)


def test_v3_parity():
    ref_t, our_t = drive_pair(
        "MultiRobotPuzzle-v3",
        lambda e: oracle.inject_v3(e, (11.0, 8.0, 0.2), [(3.0, 5.0, 0.0), (3.0, 11.0, 0.0)]),
        None, None, n_steps=40,
    )
    compare(ref_t, our_t, obs_atol=0.02, rew_atol=0.2)  # normalized units


def test_v3_three_agent_parity():
    """The v3 constructor surface (core.py:86-93): RobotPuzzleBase(num_agents=3)
    vs make's num_agents=3 world, driven through contact-free motion."""
    ref_t, our_t = drive_pair(
        "MultiRobotPuzzle-v3",
        lambda e: oracle.inject_v3(
            e, (11.0, 8.0, 0.2),
            [(3.0, 4.0, 0.0), (3.0, 8.0, 0.0), (3.0, 12.0, 0.0)],
        ),
        None, None, n_steps=40,
        ref_kwargs=dict(num_agents=3, goal_velocity=2.0, block_density=7.0,
                        hardmode=True),
        logic_kwargs=dict(num_agents=3),
    )
    assert len(ref_t[0][0]) == 4 * 3 + 3 + 16  # 31-dim obs
    compare(ref_t, our_t, obs_atol=0.02, rew_atol=0.2)


def test_v3_heavy_parity():
    """RobotPuzzleBase(heavy=True): 2x-scale, 2x-density T block (core.py:204-211)."""
    ref_t, our_t = drive_pair(
        "MultiRobotPuzzle-v3",
        lambda e: oracle.inject_v3(e, (11.0, 8.0, 0.3), [(3.0, 5.0, 0.0), (3.0, 11.0, 0.0)]),
        None, None, n_steps=40,
        ref_kwargs=dict(heavy=True),
        logic_kwargs=dict(heavy=True),
    )
    compare(ref_t, our_t, obs_atol=0.02, rew_atol=0.2)


def test_v3_contact_parity():
    ref_t, our_t = drive_pair(
        "MultiRobotPuzzle-v3",
        lambda e: oracle.inject_v3(e, (11.0, 8.0, 0.0), [(8.6, 8.0, 0.0), (11.0, 5.7, 0.0)]),
        None, None, n_steps=40,
    )
    compare(ref_t, our_t, obs_atol=0.05, rew_atol=0.5)
