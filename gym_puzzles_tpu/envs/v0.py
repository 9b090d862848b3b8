"""MultiRobotPuzzle-v0 / MultiRobotPuzzleHeavy-v0.

Pure-functional rebuild of envs/multi_robot_puzzle_00.py: holonomic
(velocity-set) octagon robots push a T-block to a fixed goal at screen
center + (0, 0.75 m); unnormalized pixel-scale observations; reward shaped by
delta-distances, proximity penalties, per-agent contact bonus, the +-10
block-in-place reward and +10000 completion (00.py:474-519).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gym_puzzles_tpu.envs import common as cm
from gym_puzzles_tpu.envs import config as C
from gym_puzzles_tpu.envs.base import PuzzleEnvLogic

F = jnp.float32
DS = 1.0  # downsample factor (00.py:38); kept explicit in the reward math


class V0Env(PuzzleEnvLogic):
    def __init__(self, cfg):
        super().__init__(cfg)
        # set_final_loc (00.py:115-128): goal at screen center + rel*SCALE px.
        w, h = C.V0_VIEWPORT_W, C.V0_VIEWPORT_H
        self.goal_px = np.array(
            [w // 2 + 0.0 * C.V0_SCALE, h // 2 + 0.75 * C.V0_SCALE, 0.0], np.float32
        )  # (320, 262.5, 0)

    # -- spawn (00.py:299-378): block first, then agents; all uniform in the
    # bordered screen box ---------------------------------------------------
    def _spawn(self, key):
        import jax

        lay = self.layout
        A = self.cfg.num_agents
        kb_x, kb_y, kb_a, k_ag = jax.random.split(key, 4)
        w, h = lay.world_w, lay.world_h
        b = C.V0_BORDER

        bx = cm.uniform(kb_x, b, w - b)
        by = cm.uniform(kb_y, b, h - b)
        bang = cm.uniform(kb_a, 0.0, 2.0 * np.pi)
        axy = cm.uniform(k_ag, b, jnp.array([w - b, h - b]), (A, 2))

        origin = jnp.concatenate(
            [
                jnp.asarray(self.wall_positions, F),
                jnp.stack([bx, by])[None],
                axy,
            ]
        )
        angles = jnp.concatenate([jnp.zeros(4), bang[None], jnp.zeros(A)])
        from gym_puzzles_tpu.engine import world as eng

        bodies = eng.init_bodies(lay.table, origin, angles)
        return bodies, jnp.asarray(self.goal_px)

    # -- distances in pixel units (00.py:277-291) ---------------------------
    def _distances(self, bodies, goal_pos):
        s = C.V0_SCALE
        bc, ac = cm.centers(self.layout, bodies)
        block_distance = cm.distance(bc * s, goal_pos[:2])
        fangle = goal_pos[2]
        angle = bodies.angle[self.layout.block_slot]
        block_angle = jnp.abs(
            jnp.mod(fangle, 2.0 * np.pi) - jnp.mod(jnp.abs(angle), 2.0 * np.pi)
        )
        agent_dist = cm.distance(ac * s, bc[None] * s)
        return agent_dist, block_distance, block_angle

    # -- control (00.py:415-424): velocity set + soft assist ----------------
    def _control(self, state, action):
        lay = self.layout
        A = self.cfg.num_agents
        a = action.reshape(A, 3)
        vel_set = a[:, :2] * C.V0_SPEED
        omega_set = a[:, 2]

        bodies = state.bodies
        vel = cm.set_agent_rows(lay, bodies.vel, vel_set)
        omega = cm.set_agent_rows(lay, bodies.omega, omega_set)

        # soft force: per agent, 1.1^(-agent_dist) along the Chebyshev unit
        # vector agent->block, accumulated on the block (quirks #3, #9)
        bc, ac = cm.centers(lay, bodies)
        mag = 1.1 ** (-state.agent_dist)  # [A]
        unit = cm.chebyshev_unit(ac, bc[None])  # [A, 2]
        block_force = (mag[:, None] * unit).sum(axis=0)

        A = self.cfg.num_agents
        force = cm.body_rows(lay, block_force, jnp.zeros((A, 2), F), extra_shape=(2,))
        torque = jnp.zeros((lay.table.num_bodies,), F)

        # wakes: SetLinearVelocity/SetAngularVelocity wake on nonzero value;
        # ApplyForce(wake=True) always wakes the block.
        agent_wake = (vel_set**2).sum(-1) > 0.0
        agent_wake = agent_wake | (omega_set**2 > 0.0)
        wake = jnp.concatenate(
            [jnp.zeros((4,), bool), jnp.ones((1,), bool), agent_wake]
        )
        return bodies.replace(vel=vel, omega=omega), force, torque, wake

    # -- obs + reward + done (00.py:438-521) --------------------------------
    def _score(self, state, bodies, goal_contact, agent_dist, block_distance,
               block_angle, params):
        lay = self.layout
        s = C.V0_SCALE
        bc, ac = cm.centers(lay, bodies)

        # per agent: (dx, dy) px, dist, contact
        rel = (ac - bc[None]) * s  # [A, 2]
        agent_obs = jnp.concatenate(
            [rel, agent_dist[:, None], goal_contact[:, None].astype(F)], axis=1
        ).reshape(-1)

        # block: relative to goal + angle diff + dist
        x = bc[0] * s
        y = bc[1] * s
        angle = jnp.mod(bodies.angle[lay.block_slot], 2.0 * np.pi)
        fx, fy, fangle = state.goal_pos[0], state.goal_pos[1], state.goal_pos[2]
        a_diff = jnp.mod(fangle, 2.0 * np.pi) - angle
        blk_obs = jnp.stack([x - fx, y - fy, a_diff, cm.distance(jnp.stack([x, y]), state.goal_pos[:2])])

        verts = cm.block_world_vertices(lay, bodies) * s  # [8, 2] px
        obs = jnp.concatenate([agent_obs, blk_obs, verts.reshape(-1)])

        # is_in_place ignores angle (quirk #4): both |dx|,|dy| <= EPSILON px
        in_place = (jnp.abs(fx - x) <= C.V0_EPSILON) & (jnp.abs(fy - y) <= C.V0_EPSILON)
        blks = in_place.astype(jnp.int32)

        reward = (state.block_distance - block_distance) * params.weight_delta_block * DS / 4.0
        reward -= params.weight_blk_dist * block_distance * DS / 4.0
        delta_agent = state.agent_dist - agent_dist
        reward += (delta_agent * params.weight_delta_agent * DS / 4.0).sum()
        reward -= (params.weight_agent_dist * agent_dist * DS / 4.0).sum()
        reward += 0.25 * goal_contact.sum()

        reward += (blks - state.blks_in_place) * C.V0_BLOCK_REWARD
        done = blks == 1
        reward = reward + jnp.where(done, C.V0_FINAL_REWARD, 0.0)
        done_status = jnp.where(done, 3, 0).astype(jnp.int32)
        return obs.astype(F), reward.astype(F), done, done_status, blks
