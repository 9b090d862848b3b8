"""Drive the actual reference envs (read-only at /root/reference) headless
through the legacy-gym shim, as the golden oracle for env-level parity.

Uses state *injection*: after the reference env constructs itself, body
poses are overwritten to a chosen configuration and internal distance caches
recomputed, so the rebuild can mirror the exact same start state without
reproducing the global-np.random spawn stream.
"""

from __future__ import annotations

import sys

import numpy as np

_SHIM = "/root/repo/tests/gym_shim"
_REF = "/root/reference"


def _ensure_path():
    for p in (_SHIM, _REF):
        if p not in sys.path:
            sys.path.insert(0, p)


def make_reference(env_id: str, **kwargs):
    """Instantiate a reference env class headless (construction runs reset,
    which consumes global np.random -- seed beforehand if you care).
    ``kwargs`` forward to the constructor -- only RobotPuzzleBase (v3) takes
    any (num_agents/heavy/goal_velocity/block_density/hardmode,
    core.py:86-93)."""
    _ensure_path()
    import importlib

    entry = {
        "MultiRobotPuzzle-v0": ("gym_puzzles.envs.multi_robot_puzzle_00", "MultiRobotPuzzle"),
        "MultiRobotPuzzleHeavy-v0": ("gym_puzzles.envs.multi_robot_puzzle_00", "MultiRobotPuzzleHeavy"),
        "MultiRobotPuzzle-v2": ("gym_puzzles.envs.multi_robot_puzzle_02", "MultiRobotPuzzle2"),
        "MultiRobotPuzzleHeavy-v2": ("gym_puzzles.envs.multi_robot_puzzle_02", "MultiRobotPuzzleHeavy2"),
        "MultiRobotPuzzle-v3": ("gym_puzzles.envs.core", "RobotPuzzleBase"),
    }[env_id]
    mod = importlib.import_module(entry[0])
    return getattr(mod, entry[1])(**kwargs)


def _set_body(body, pos, angle):
    body.position = (float(pos[0]), float(pos[1]))
    body.angle = float(angle)
    body.linearVelocity = (0.0, 0.0)
    body.angularVelocity = 0.0
    # awake=False zeroes b2Body::m_sleepTime (SetAwake(false)), so the
    # subsequent wake starts the sleep clock at exactly 0 -- matching the
    # rebuild's inject(), which builds bodies with sleep_time=0.
    body.awake = False
    body.awake = True


def inject_v0(env, block_pose, agent_poses):
    """block_pose: (x, y, angle) body-origin; agent_poses: [(x, y, angle)]."""
    _set_body(env.blocks[0], block_pose[:2], block_pose[2])
    for agent, p in zip(env.agents, agent_poses):
        _set_body(agent, p[:2], p[2])
    for agent in env.agents:
        agent.goal_contact = False
    env.wall_contact = False
    env.blks_in_place = 0
    env.prev_blks_in_place = 0
    env._calculate_distance()
    env._calculate_agent_distance()


def inject_v2(env, block_pose, agent_poses, goal_norm):
    _set_body(env.blocks[0], block_pose[:2], block_pose[2])
    for agent, p in zip(env.agents, agent_poses):
        _set_body(agent, p[:2], p[2])
    for agent in env.agents:
        agent.goal_contact = False
    env.wall_contact = False
    env.blks_in_place = 0
    env.prev_blks_in_place = 0
    env.block_final_pos = {env.goal_block.userData: tuple(map(float, goal_norm))}
    env._calculate_distance()
    env._calculate_agent_distance()


def inject_v3(env, block_pose, agent_poses):
    _set_body(env.goal_block.block, block_pose[:2], block_pose[2])
    for agent, p in zip(env.agents, agent_poses):
        _set_body(agent.agent, p[:2], p[2])
        agent._goal_contact = False
    env.wall_contact = False
    env._get_obs()  # recomputes agent_dist / block_distance caches


def body_origin_poses(env_id, env):
    """Extract (origin position, angle) for every body in the rebuild's slot
    order: walls 0-3, block, agents."""
    if env_id.endswith("v3"):
        blocks = [env.goal_block.block]
        agents = [a.agent for a in env.agents]
    else:
        blocks = list(env.blocks)
        agents = list(env.agents)
    bodies = list(env.boundary) + blocks + agents
    pos = np.array([[b.position[0], b.position[1]] for b in bodies])
    ang = np.array([b.angle for b in bodies])
    return pos, ang
