"""MultiRobotPuzzle-v3 (RobotPuzzleBase).

Pure-functional rebuild of envs/core.py: the modular v0 variant with
normalized observations in ~[-1, 1], velocity-set robots (max_speed 5),
a fixed goal at (5/6*W - 4/3*border, H/2) px, distance-threshold completion
worth +100, and the aspect-skewed y normalization quirk (core.py:289-295
divides y by the *width* scale -- SURVEY quirk #11).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gym_puzzles_tpu.envs import common as cm
from gym_puzzles_tpu.envs import config as C
from gym_puzzles_tpu.envs.base import PuzzleEnvLogic

F = jnp.float32


class V3Env(PuzzleEnvLogic):
    def __init__(self, cfg):
        super().__init__(cfg)
        w, h = C.V3_SCREEN_W, C.V3_SCREEN_H
        # core.py:277-281
        self.goal_px = np.array(
            [5.0 / 6.0 * w - 4.0 / 3.0 * C.V3_BORDER, h // 2, 0.0], np.float32
        )
        self.width_scale = w / C.V3_SCALE / 2.0  # 10.6667
        self.height_scale = h / C.V3_SCALE / 2.0  # 8.0
        # goal in normalized units (core.py:332-336)
        self.goal_norm = np.array(
            [
                (self.goal_px[0] - w / 2.0) / (w / 2.0),
                (self.goal_px[1] - h / 2.0) / (w / 2.0),
                0.0,
            ],
            np.float32,
        )

    def _norm_pose(self, xy, rot):
        """core.py:289-295: x,y centered and divided by width_scale (y too!)."""
        ws, hs = self.width_scale, self.height_scale
        x = (xy[..., 0] - ws) / ws
        y = (xy[..., 1] - hs) / ws
        return x, y, jnp.mod(rot, 2.0 * np.pi)

    # -- spawn (core.py:204-243) -------------------------------------------
    def _spawn(self, key):
        import jax

        lay = self.layout
        A = self.cfg.num_agents
        kb, k_ag = jax.random.split(key)
        kb_x, kb_y, kb_a = jax.random.split(kb, 3)
        w, h = lay.world_w, lay.world_h
        b = C.V3_BORDER

        bx = cm.uniform(kb_x, w / 3.0 + 2.0 * b, w * 2.0 / 3.0 - 2.0 * b)
        by = cm.uniform(kb_y, 3.0 * b, h - 3.0 * b)
        bang = cm.uniform(kb_a, 0.0, 2.0 * np.pi)
        axy = cm.uniform(
            k_ag,
            jnp.array([b, b]),
            jnp.array([w / 3.0 - 2.0 * b, h - b]),
            (A, 2),
        )

        origin = jnp.concatenate(
            [jnp.asarray(self.wall_positions, F), jnp.stack([bx, by])[None], axy]
        )
        angles = jnp.concatenate([jnp.zeros(4), bang[None], jnp.zeros(A)])
        from gym_puzzles_tpu.engine import world as eng

        bodies = eng.init_bodies(lay.table, origin, angles)
        return bodies, jnp.asarray(self.goal_norm)

    # -- distances in normalized units (core.py:297-350) --------------------
    def _distances(self, bodies, goal_pos):
        lay = self.layout
        bc, ac = cm.centers(lay, bodies)
        a0 = int(lay.agent_slots[0])
        bx, by, _ = self._norm_pose(bc, bodies.angle[lay.block_slot])
        axx, ayy, _ = self._norm_pose(ac, bodies.angle[a0:a0 + lay.num_agents])
        agent_dist = jnp.sqrt((axx - bx) ** 2 + (ayy - by) ** 2)
        block_distance = jnp.sqrt((goal_pos[0] - bx) ** 2 + (goal_pos[1] - by) ** 2)
        brot = jnp.mod(bodies.angle[lay.block_slot], 2.0 * np.pi)
        block_angle = jnp.mod(goal_pos[2], 2.0 * np.pi) - brot
        return agent_dist, block_distance, block_angle

    # -- control (core.py:353-364, robot.py:65-68) --------------------------
    def _control(self, state, action):
        lay = self.layout
        A = self.cfg.num_agents
        a = action.reshape(A, 3)
        vel_set = a[:, :2] * C.V3_AGENT_MAX_SPEED
        omega_set = a[:, 2]

        bodies = state.bodies
        vel = cm.set_agent_rows(lay, bodies.vel, vel_set)
        omega = cm.set_agent_rows(lay, bodies.omega, omega_set)

        bc, ac = cm.centers(lay, bodies)
        mag = 1.1 ** (-state.agent_dist)
        unit = cm.chebyshev_unit(ac, bc[None])
        block_force = (mag[:, None] * unit).sum(axis=0)

        force = cm.body_rows(lay, block_force, jnp.zeros((A, 2), F), extra_shape=(2,))
        torque = jnp.zeros((lay.table.num_bodies,), F)

        agent_wake = ((vel_set**2).sum(-1) > 0.0) | (omega_set**2 > 0.0)
        wake = jnp.concatenate(
            [jnp.zeros((4,), bool), jnp.ones((1,), bool), agent_wake]
        )
        return bodies.replace(vel=vel, omega=omega), force, torque, wake

    # -- obs + reward + done (core.py:297-414) ------------------------------
    def _score(self, state, bodies, goal_contact, agent_dist, block_distance,
               block_angle, params):
        lay = self.layout
        bc, ac = cm.centers(lay, bodies)
        a0 = int(lay.agent_slots[0])
        bx, by, brot = self._norm_pose(bc, bodies.angle[lay.block_slot])
        axx, ayy, arot = self._norm_pose(ac, bodies.angle[a0:a0 + lay.num_agents])

        agent_obs = jnp.stack(
            [bx - axx, by - ayy, arot, goal_contact.astype(F)], axis=1
        ).reshape(-1)

        gx, gy, grot = state.goal_pos[0], state.goal_pos[1], state.goal_pos[2]
        grot = jnp.mod(grot, 2.0 * np.pi)
        blk_obs = jnp.stack([gx - bx, gy - by, grot - brot])

        verts = cm.block_world_vertices(lay, bodies)  # [8,2] world meters
        ws, hs = self.width_scale, self.height_scale
        verts_n = jnp.stack(
            [(verts[:, 0] - ws) / ws, (verts[:, 1] - hs) / ws], axis=1
        )
        obs = jnp.concatenate([agent_obs, blk_obs, verts_n.reshape(-1)])

        # completion: distance threshold, no blocks-in-place counter
        # (core.py:376: EPSILON / screen_width * 2)
        thresh = C.V3_EPSILON / C.V3_SCREEN_W * 2.0
        in_place = block_distance <= thresh

        reward = (state.block_distance - block_distance) * params.weight_delta_block
        reward -= params.weight_blk_dist * block_distance
        delta_agent = state.agent_dist - agent_dist
        reward += (delta_agent * params.weight_delta_agent / 4.0).sum()
        reward -= (params.weight_agent_dist * agent_dist / 4.0).sum()
        reward += 0.25 * goal_contact.sum()

        done = in_place
        # core.py:410 adds the *unshaped* puzzle_complete_reward (=100)
        reward = reward + jnp.where(done, params.puzzle_complete_reward, 0.0)
        done_status = jnp.where(done, 3, 0).astype(jnp.int32)
        blks = in_place.astype(jnp.int32)
        return obs.astype(F), reward.astype(F), done, done_status, blks
