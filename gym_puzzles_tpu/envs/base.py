"""Functional env base: reset/step skeleton shared by all variants.

The reference's ``reset`` takes one *random* action and returns that step's
observation (00.py:411, 02.py:442, core.py:287 -- SURVEY quirk #1); the
skeleton reproduces that, with the action drawn from the env's own PRNG key
instead of the global numpy stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gym_puzzles_tpu.engine import world as eng
from gym_puzzles_tpu.envs import common as cm
from gym_puzzles_tpu.envs import layout as lay
from gym_puzzles_tpu.envs.config import EnvConfig, RewardParams

F = jnp.float32


class PuzzleEnvLogic:
    """Single-env pure logic; the api layer vmaps/jits it.

    Subclasses implement ``_spawn``, ``_distances``, ``_control``,
    ``_score``; everything else (engine plumbing, contact flags, the
    reset-random-step quirk) lives here.
    """

    def __init__(self, cfg: EnvConfig):
        self.cfg = cfg
        self.layout, self.wall_positions = lay.build(cfg)

    # -- subclass interface ------------------------------------------------
    def _spawn(self, key):
        """-> (Bodies, goal_pos [3])"""
        raise NotImplementedError

    def _distances(self, bodies, goal_pos):
        """-> (agent_dist [A], block_distance [], block_angle [])"""
        raise NotImplementedError

    def _control(self, state, action):
        """-> (Bodies with velocity-type controls applied, force [B,2],
        torque [B], wake [B] bool)"""
        raise NotImplementedError

    def _score(self, state, bodies, goal_contact, agent_dist, block_distance,
               block_angle, params):
        """-> (obs, reward, done, done_status, blks_in_place)"""
        raise NotImplementedError

    # -- public API --------------------------------------------------------
    def default_params(self) -> RewardParams:
        return RewardParams.default(self.cfg.variant)

    def reset_spawn(self, key):
        """Spawn a fresh episode state plus the reference reset contract's
        uniform random action (00.py:411) -- the pre-step half of
        :meth:`reset`, split out so the vectorized reference-mode autoreset
        can run the quirk step through the batched/fused engine path."""
        k_spawn, k_act = jax.random.split(key)
        bodies, goal_pos = self._spawn(k_spawn)
        state = self.state_from_bodies(bodies, goal_pos)
        action = cm.uniform(k_act, -1.0, 1.0, (self.cfg.act_dim,))
        return state, action

    def reset(self, key, params: RewardParams):
        """Spawn a fresh episode, then take one uniform random action and
        return its observation (the reference's reset contract)."""
        state, action = self.reset_spawn(key)
        state, obs, _r, _d, _info = self.step(state, action, params)
        # The random step does not count against the episode clock.
        return state.replace(t=jnp.asarray(0, jnp.int32)), obs

    def state_from_bodies(self, bodies, goal_pos):
        """Fresh EnvState around given body state (no contacts, flags off,
        distances computed)."""
        contacts = eng.init_contacts(self.layout.table)
        agent_dist, block_distance, block_angle = self._distances(bodies, goal_pos)
        A = self.cfg.num_agents
        return cm.EnvState(
            bodies=bodies,
            contacts=contacts,
            goal_contact=jnp.zeros((A,), bool),
            wall_contact=jnp.asarray(False),
            agent_dist=agent_dist,
            block_distance=block_distance,
            block_angle=block_angle,
            blks_in_place=jnp.asarray(0, jnp.int32),
            goal_pos=goal_pos,
            t=jnp.asarray(0, jnp.int32),
            done_status=jnp.asarray(0, jnp.int32),
        )

    def inject(self, origin_positions, angles, goal_pos=None):
        """Build an EnvState from explicit body-origin poses [B,2]/[B] --
        the parity-test entry point for mirroring an oracle world."""
        bodies = eng.init_bodies(self.layout.table, origin_positions, angles)
        if goal_pos is None:
            bodies2, goal_pos = self._spawn(__import__("jax").random.key(0))
            del bodies2
        return self.state_from_bodies(bodies, jnp.asarray(goal_pos, F))

    def reset_fast(self, key, params: RewardParams):
        """Spawn only -- observation computed directly from the spawned
        state, skipping the reference's random-action step.  Same state
        distribution up to one step; used by the vectorized autoreset path
        where the extra physics step would double the cost of every step."""
        bodies, goal_pos = self._spawn(key)
        state = self.state_from_bodies(bodies, goal_pos)
        obs, _r, _d, _s, _b = self._score(
            state, state.bodies, state.goal_contact, state.agent_dist,
            state.block_distance, state.block_angle, params,
        )
        return state, obs

    def step(self, state: cm.EnvState, action, params: RewardParams):
        action = jnp.asarray(action, F)
        bodies, force, torque, wake = self._control(state, action)
        bodies, contacts, goal_contact, wall_contact = cm.physics(
            self.layout, self.cfg, bodies, state.contacts, force, torque, wake,
            state.goal_contact, state.wall_contact,
        )
        return self._finish(state, bodies, contacts, goal_contact, wall_contact, params)

    def step_batched(self, state: cm.EnvState, action, params: RewardParams):
        """Batched step (env batch on the TRAILING axis of every leaf) using
        the Pallas contact-solve kernel for the physics.  Same semantics as
        vmap(step); used by VectorEnv(backend='pallas')."""
        action = jnp.asarray(action, F)  # [act_dim, E]
        bodies, force, torque, wake = jax.vmap(
            self._control, in_axes=(-1, -1), out_axes=-1
        )(state, action)
        bodies, contacts, goal_contact, wall_contact = cm.physics_batched(
            self.layout, self.cfg, bodies, state.contacts, force, torque, wake,
            state.goal_contact, state.wall_contact,
        )
        return jax.vmap(
            self._finish, in_axes=(-1, -1, -1, -1, -1, None), out_axes=-1
        )(state, bodies, contacts, goal_contact, wall_contact, params)

    def step_fused(self, state: cm.EnvState, action, params: RewardParams):
        """Batched step (trailing env axis) with the whole engine tick --
        narrow phase through sleep -- in ONE Pallas kernel
        (engine/step_pallas.py).  Same semantics as step_batched; used by
        VectorEnv(backend='fused')."""
        action = jnp.asarray(action, F)  # [act_dim, E]
        bodies, force, torque, wake = jax.vmap(
            self._control, in_axes=(-1, -1), out_axes=-1
        )(state, action)
        bodies, contacts, goal_contact, wall_contact = cm.physics_fused(
            self.layout, self.cfg, bodies, state.contacts, force, torque, wake,
            state.goal_contact, state.wall_contact,
        )
        return jax.vmap(
            self._finish, in_axes=(-1, -1, -1, -1, -1, None), out_axes=-1
        )(state, bodies, contacts, goal_contact, wall_contact, params)

    def _finish(self, state, bodies, contacts, goal_contact, wall_contact,
                params: RewardParams):
        """Post-physics: distances, obs, reward, termination, state assembly."""
        agent_dist, block_distance, block_angle = self._distances(bodies, state.goal_pos)
        obs, reward, done, done_status, blks = self._score(
            state, bodies, goal_contact, agent_dist, block_distance, block_angle, params
        )
        t = state.t + 1
        truncated = t >= self.cfg.max_episode_steps  # gym TimeLimit wrapper
        new_state = cm.EnvState(
            bodies=bodies,
            contacts=contacts,
            goal_contact=goal_contact,
            wall_contact=wall_contact,
            agent_dist=agent_dist,
            block_distance=block_distance,
            block_angle=block_angle,
            blks_in_place=blks,
            goal_pos=state.goal_pos,
            t=t,
            done_status=done_status,
        )
        info = {"done_status": done_status, "truncated": truncated, "t": t}
        return new_state, obs, reward, done | truncated, info
