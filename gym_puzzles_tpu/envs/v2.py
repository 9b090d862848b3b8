"""MultiRobotPuzzle-v2 / MultiRobotPuzzleHeavy-v2.

Pure-functional rebuild of envs/multi_robot_puzzle_02.py: car-like
(non-holonomic) robots steered by (turn, vel) actions -- forward force at a
far offset point, lateral-velocity-killing impulse, the spin-pumping
ApplyAngularImpulse(+0.1*I*w) quirk, and the inverted torque sign
(02.py:444-474, SURVEY quirk #8) -- pushing a low-friction T-block to a
random goal in the right third of the screen.  Normalized observations with
the scaled-epsilon tail; out-of-bounds termination with shaped penalties;
completion reward scaled by the fraction of agents in contact.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gym_puzzles_tpu.engine import math2d as m2
from gym_puzzles_tpu.envs import common as cm
from gym_puzzles_tpu.envs import config as C
from gym_puzzles_tpu.envs.base import PuzzleEnvLogic

F = jnp.float32
RATIO = np.float32(C.V2_RATIO)  # SCALE/VIEWPORT_W = m -> screen-width fraction


def norm_angle(a):
    """02.py:255-261: angle -> [-1, 1] with a sign flip at pi."""
    theta = jnp.mod(a, 2.0 * np.pi)
    return jnp.where(theta <= np.pi, -theta / np.pi, (2.0 * np.pi - theta) / np.pi)


class V2Env(PuzzleEnvLogic):
    # -- spawn (02.py:303-361; SIMPLE/ANYWHERE branches selected by the
    # cfg's v2_simple/v2_anywhere -- the registered envs run the module
    # constants SIMPLE=True/ANYWHERE=False, 02.py:61-62) -------------------
    def _spawn(self, key):
        import jax

        lay = self.layout
        A = self.cfg.num_agents
        simple = self.cfg.v2_simple
        anywhere = self.cfg.v2_anywhere
        kb_a, kb_xy, k_ag, k_aang, kg_x, kg_y = jax.random.split(key, 6)
        w, h = lay.world_w, lay.world_h
        b = C.V2_BORDER

        bang = cm.uniform(kb_a, 0.0, 2.0 * np.pi)
        if simple:
            # block centered (02.py:316-317)
            bx = jnp.asarray(w / 2.0, F)
            by = jnp.asarray(h / 2.0, F)
        else:
            # block uniform in the middle third (02.py:318-320)
            bxy = cm.uniform(
                kb_xy, jnp.array([w / 3.0 + b, b]),
                jnp.array([w * 2.0 / 3.0 - b, h - b]), (2,)
            )
            bx, by = bxy[0], bxy[1]

        # agents: left third (ANYWHERE=False) or full width (02.py:349-355)
        ax_hi = (w - b) if anywhere else (w / 3.0 - b)
        axy = cm.uniform(
            k_ag, jnp.array([b, b]), jnp.array([ax_hi, h - b]), (A, 2)
        )
        if simple:
            a_ang = jnp.full((A,), 1.5 * np.pi, F)  # 02.py:356
        else:
            a_ang = cm.uniform(k_aang, 0.0, 2.0 * np.pi, (A,))  # 02.py:357

        origin = jnp.concatenate(
            [jnp.asarray(self.wall_positions, F), jnp.stack([bx, by])[None], axy]
        )
        angles = jnp.concatenate([jnp.zeros(4), bang[None], a_ang])
        from gym_puzzles_tpu.engine import world as eng

        bodies = eng.init_bodies(lay.table, origin, angles)

        # random goal in the right third, stored normalized (02.py:303-311;
        # the goal border is 0.4 under SIMPLE, 0.3 otherwise -- a local
        # shadow of the module BORDER, 02.py:305-306)
        gb = 0.4 if simple else 0.3
        gx = cm.uniform(kg_x, w * 2.0 / 3.0 + gb, w - gb) * RATIO
        gy = cm.uniform(kg_y, gb, h - gb) * RATIO
        goal = jnp.stack([gx, gy, jnp.asarray(0.0, F)])
        return bodies, goal

    # -- distances in normalized units (02.py:263-277) ----------------------
    def _distances(self, bodies, goal_pos):
        lay = self.layout
        bc, ac = cm.centers(lay, bodies)
        block_distance = cm.distance(bc * RATIO, goal_pos[:2])
        agent_dist = cm.distance(ac * RATIO, bc[None] * RATIO)
        brot = jnp.mod(bodies.angle[lay.block_slot], 2.0 * np.pi)
        block_angle = jnp.abs(
            jnp.mod(goal_pos[2], 2.0 * np.pi)
            - jnp.mod(jnp.abs(bodies.angle[lay.block_slot]), 2.0 * np.pi)
        )
        del brot
        return agent_dist, block_distance, block_angle

    # -- control (02.py:446-474) --------------------------------------------
    def _control(self, state, action):
        lay = self.layout
        A = self.cfg.num_agents
        a = action.reshape(A, 2)
        turn, vel_cmd = a[:, 0], a[:, 1]

        bodies = state.bodies
        slots = lay.agent_slots  # numpy, for static table lookups only
        a0 = int(slots[0])
        sl = slice(a0, a0 + A)
        q = m2.rot(bodies.angle[sl])  # [A, 2]

        # forward force f = R*(0,1)*vel*FORCE applied at R*(0,2) offset from
        # the COM -- parallel to the offset, so zero torque (02.py:449-454)
        fwd = m2.rot_vec(q, jnp.broadcast_to(jnp.array([0.0, 1.0], F), (A, 2)))
        f_agent = fwd * (vel_cmd * C.V2_FORCE)[:, None]

        # lateral friction impulse: v -= dot(right, v) * right
        # (ApplyLinearImpulse at the COM changes v immediately, 02.py:116-122)
        right = m2.rot_vec(q, jnp.broadcast_to(jnp.array([1.0, 0.0], F), (A, 2)))
        v_a = bodies.vel[sl]
        lat = m2.dot(right, v_a)[:, None] * right
        v_a = v_a - lat

        # ApplyAngularImpulse(0.1 * inertia * w): w += invI * 0.1 * I_origin * w.
        # v2 agents have localCenter=(0,0) so this is w *= 1.1 -- it PUMPS
        # spin (02.py:456, quirk #8 part 1)
        w_a = bodies.omega[sl]
        i_origin = lay.table.inertia_com[slots] + lay.table.mass[slots] * (
            lay.table.local_center[slots] ** 2
        ).sum(-1)
        w_a = w_a + lay.table.inv_inertia[slots] * (0.1 * i_origin * w_a)

        # torque: magnitude from |turn|, sign INVERTED, zeroed if |vel|<0.1
        # (02.py:458-467, quirk #8 part 2)
        max_torque = 0.0005
        torque_mag = jnp.abs(turn) * max_torque
        turn_eff = jnp.where(jnp.abs(vel_cmd) < 0.1, 0.0, turn)
        t_agent = jnp.where(
            turn_eff < 0.0, torque_mag, jnp.where(turn_eff > 0.0, -torque_mag, 0.0)
        )

        # soft assist on the block: 10^(-dist)/50 along Chebyshev direction
        bc, ac = cm.centers(lay, bodies)
        mag = (10.0 ** (-state.agent_dist)) / 50.0
        unit = cm.chebyshev_unit(ac, bc[None])
        block_force = (mag[:, None] * unit).sum(axis=0)

        force = cm.body_rows(lay, block_force, f_agent, extra_shape=(2,))
        torque = cm.body_rows(lay, jnp.asarray(0.0, F), t_agent)
        vel = cm.set_agent_rows(lay, bodies.vel, v_a)
        omega = cm.set_agent_rows(lay, bodies.omega, w_a)

        # every agent gets ApplyForce/Impulse with wake=True; block likewise
        wake = jnp.concatenate(
            [jnp.zeros((4,), bool), jnp.ones((1 + A,), bool)]
        )
        return bodies.replace(vel=vel, omega=omega), force, torque, wake

    # -- obs + reward + done (02.py:488-584) --------------------------------
    def _score(self, state, bodies, goal_contact, agent_dist, block_distance,
               block_angle, params):
        lay = self.layout
        bc, ac = cm.centers(lay, bodies)
        a0 = int(lay.agent_slots[0])
        sl = slice(a0, a0 + self.cfg.num_agents)

        a_xy = ac * RATIO
        b_xy = bc * RATIO
        a_vel = bodies.vel[sl]
        agent_obs = jnp.concatenate(
            [
                a_xy,
                norm_angle(bodies.angle[sl])[:, None],
                a_xy - b_xy[None],
                a_vel,
                bodies.omega[sl][:, None],
                agent_dist[:, None],
            ],
            axis=1,
        ).reshape(-1)

        x, y = b_xy[0], b_xy[1]
        angle = jnp.mod(bodies.angle[lay.block_slot], 2.0 * np.pi)
        fx, fy, fangle = state.goal_pos[0], state.goal_pos[1], state.goal_pos[2]
        a_diff = (jnp.mod(fangle, 2.0 * np.pi) - angle) / np.pi
        blk_obs = jnp.stack([x - fx, y - fy, a_diff, cm.distance(b_xy, state.goal_pos[:2])])

        verts = cm.block_world_vertices(lay, bodies) * RATIO
        obs = jnp.concatenate(
            [agent_obs, blk_obs, verts.reshape(-1), params.scaled_epsilon[None]]
        )

        # shaping (02.py:537-546): no /4 factors, no contact bonus
        reward = (state.block_distance - block_distance) * params.weight_delta_block
        reward -= params.weight_blk_dist * block_distance
        delta_agent = state.agent_dist - agent_dist
        reward += (delta_agent * params.weight_delta_agent).sum()
        reward -= (params.weight_agent_dist * agent_dist).sum()

        # out-of-bounds checks on world-unit centers (02.py:279-295)
        w, h = lay.world_w, lay.world_h
        bnd = C.V2_BOUNDS

        def oob(c):
            return (
                (c[..., 0] < bnd)
                | (c[..., 0] > w - bnd)
                | (c[..., 1] < bnd)
                | (c[..., 1] > h - bnd)
            )

        agent_oob = oob(ac).any()
        block_oob = oob(bc)

        in_place = (jnp.abs(fx - x) <= params.scaled_epsilon) & (
            jnp.abs(fy - y) <= params.scaled_epsilon
        )
        blks_new = in_place.astype(jnp.int32)
        n_contact = goal_contact.sum()
        complete = blks_new == 1

        # priority: agent OOB > block OOB > completion (early returns in the
        # reference; blks_in_place only updates on the completion path)
        reward = jnp.where(
            agent_oob,
            reward - params.shaped_bounds_penalty,
            jnp.where(
                block_oob,
                reward - params.shaped_blk_bounds_penalty,
                reward
                + jnp.where(
                    complete,
                    params.shaped_puzzle_reward * (n_contact.astype(F) / self.cfg.num_agents),
                    0.0,
                ),
            ),
        )
        done = agent_oob | block_oob | complete
        done_status = jnp.where(
            agent_oob, 1, jnp.where(block_oob, 2, jnp.where(complete, 3, 0))
        ).astype(jnp.int32)
        blks = jnp.where(agent_oob | block_oob, state.blks_in_place, blks_new)
        return obs.astype(F), reward.astype(F), done, done_status, blks
