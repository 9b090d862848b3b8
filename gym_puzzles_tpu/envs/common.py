"""Shared env-layer machinery: state pytree, engine plumbing, helpers.

The reference env step (e.g. multi_robot_puzzle_00.py:413-521) mutates a pile
of instance attributes; here the same data is a single pytree threaded
through a pure ``(state, action, params, key) -> (state, obs, reward, done)``
function, so the whole env batch lives on device inside one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gym_puzzles_tpu.engine import world as eng
from gym_puzzles_tpu.engine.types import Bodies, Contacts
from gym_puzzles_tpu.envs.layout import WorldLayout

F = jnp.float32


@struct.dataclass
class EnvState:
    """Everything the reference keeps on ``self`` that affects behavior."""

    bodies: Bodies
    contacts: Contacts
    goal_contact: object  # [A] bool (ContactDetector flags, 00.py:92-111)
    wall_contact: object  # [] bool (set but never consumed by the reference)
    agent_dist: object  # [A] f32 (units are variant-specific)
    block_distance: object  # [] f32
    block_angle: object  # [] f32
    blks_in_place: object  # [] int32
    goal_pos: object  # [3] f32 (fx, fy, fangle) in variant units
    t: object  # [] int32 steps since reset
    done_status: object  # [] int32: 0 running, 1 agent-oob, 2 block-oob, 3 complete


def distance(a, b):
    """Euclidean distance (00.py:130-132)."""
    d = a - b
    return jnp.sqrt((d * d).sum(axis=-1))


def chebyshev_unit(src, dst):
    """The reference's ``unitVector`` (00.py:134-138): difference normalized
    by the max-abs component (Chebyshev norm), biasing diagonals.  Kept for
    parity (SURVEY quirk #3)."""
    d = dst - src
    denom = jnp.maximum(jnp.abs(d[..., 0]), jnp.abs(d[..., 1]))
    # The reference divides by zero if the centers coincide (prob-0 event
    # under continuous spawn); guard with a tiny floor to keep jit NaN-free.
    return d / jnp.maximum(denom, 1e-12)[..., None]


def update_contact_flags(layout: WorldLayout, info: eng.StepInfo, goal_contact, wall_contact):
    """Fold one tick's begin/end touch events into the ContactDetector flags.

    Box2D fires the events in contact-list order (newest contact first); when
    both a begin and an end hit the same flag in one tick, the older
    contact's end event lands last, so *end wins* (see SURVEY §2.2 contact
    callbacks; tolerance-tested divergence)."""
    ab = layout.agent_block_pairs  # [A, P] numpy, static
    begin = (ab & info.begin[None, :]).any(axis=1)
    end = (ab & info.end[None, :]).any(axis=1)
    goal_contact = jnp.where(end, False, jnp.where(begin, True, goal_contact))

    aw = layout.agent_wall_pairs
    w_begin = (aw & info.begin[None, :]).any()
    w_end = (aw & info.end[None, :]).any()
    wall_contact = jnp.where(w_end, False, jnp.where(w_begin, True, wall_contact))
    return goal_contact, wall_contact


def physics(layout: WorldLayout, cfg, bodies: Bodies, contacts: Contacts,
            force, torque, wake, goal_contact, wall_contact):
    """Run ``frameskip`` engine ticks.  Forces and control wakes apply to the
    first tick only: Box2D clears accumulators after every Step, and the
    reference applies controls once before its frameskip loop
    (00.py:413-428)."""
    bodies, contacts, info = eng.step(
        layout.table, bodies, contacts, force, torque, wake,
        cfg.dt, cfg.velocity_iters, cfg.position_iters, cfg.solver_unroll,
    )
    goal_contact, wall_contact = update_contact_flags(layout, info, goal_contact, wall_contact)
    no_wake = jnp.zeros_like(wake)
    for _ in range(cfg.frameskip - 1):
        bodies, contacts, info = eng.step(
            layout.table, bodies, contacts,
            jnp.zeros_like(force), jnp.zeros_like(torque), no_wake,
            cfg.dt, cfg.velocity_iters, cfg.position_iters, cfg.solver_unroll,
        )
        goal_contact, wall_contact = update_contact_flags(
            layout, info, goal_contact, wall_contact
        )
    return bodies, contacts, goal_contact, wall_contact


def block_world_vertices(layout: WorldLayout, bodies: Bodies):
    """World positions of the dedup'd block vertices [8, 2]
    (blocks are built from box fixtures whose local verts are static)."""
    origin, q = eng.body_origins(layout.table, bodies)
    b = layout.block_slot
    from gym_puzzles_tpu.engine import math2d as m2
    import numpy as np

    verts = np.asarray(layout.block_verts, np.float32)  # [8, 2] static
    return m2.xf_vec(origin[b], q[b], verts)


def centers(layout: WorldLayout, bodies: Bodies):
    """(block_center [2], agent_centers [A,2]) world COM.

    Agents occupy the contiguous trailing slots, so this is a static slice
    (array-index gathers/scatters lower to XLA gather/scatter ops that wreck
    TPU fusion -- a single one in the step costs more than the entire
    physics solve, measured)."""
    a0 = int(layout.agent_slots[0])
    return bodies.pos[layout.block_slot], bodies.pos[a0:a0 + layout.num_agents]


def set_agent_rows(layout: WorldLayout, full, agent_rows):
    """Replace the agent rows of a [B, ...] array via slice+concat (never
    scatter -- see centers)."""
    a0 = int(layout.agent_slots[0])
    return jnp.concatenate([full[:a0], agent_rows], axis=0)


def body_rows(layout: WorldLayout, block_row, agent_rows, extra_shape=()):
    """Assemble a per-body array: zeros for walls, given block row, given
    agent rows.  Shapes: block_row [...], agent_rows [A, ...]."""
    zeros = jnp.zeros((layout.block_slot,) + extra_shape, F)
    return jnp.concatenate([zeros, block_row[None], agent_rows], axis=0)


def uniform(key, lo, hi, shape=()):
    return jax.random.uniform(key, shape, F, minval=lo, maxval=hi)


def physics_fused(layout: WorldLayout, cfg, bodies, contacts,
                  force, torque, wake, goal_contact, wall_contact):
    """Like :func:`physics_batched`, but with the entire engine tick fused
    into one Pallas kernel (engine/step_pallas.py)."""
    import jax

    from gym_puzzles_tpu.engine import step_pallas as stp

    flags = jax.vmap(
        update_contact_flags, in_axes=(None, -1, -1, -1), out_axes=-1
    )
    bodies, contacts, info = stp.step_fused(
        layout.table, bodies, contacts, force, torque, wake,
        cfg.dt, cfg.velocity_iters, cfg.position_iters,
    )
    goal_contact, wall_contact = flags(layout, info, goal_contact, wall_contact)
    no_wake = jnp.zeros_like(wake)
    for _ in range(cfg.frameskip - 1):
        bodies, contacts, info = stp.step_fused(
            layout.table, bodies, contacts,
            jnp.zeros_like(force), jnp.zeros_like(torque), no_wake,
            cfg.dt, cfg.velocity_iters, cfg.position_iters,
        )
        goal_contact, wall_contact = flags(layout, info, goal_contact, wall_contact)
    return bodies, contacts, goal_contact, wall_contact


def physics_batched(layout: WorldLayout, cfg, bodies, contacts,
                    force, torque, wake, goal_contact, wall_contact):
    """Batched (trailing-env-axis) physics via the Pallas solver kernel;
    semantics identical to :func:`physics` under vmap."""
    import jax

    flags = jax.vmap(
        update_contact_flags, in_axes=(None, -1, -1, -1), out_axes=-1
    )
    bodies, contacts, info = eng.step_batched(
        layout.table, bodies, contacts, force, torque, wake,
        cfg.dt, cfg.velocity_iters, cfg.position_iters,
    )
    goal_contact, wall_contact = flags(layout, info, goal_contact, wall_contact)
    no_wake = jnp.zeros_like(wake)
    for _ in range(cfg.frameskip - 1):
        bodies, contacts, info = eng.step_batched(
            layout.table, bodies, contacts,
            jnp.zeros_like(force), jnp.zeros_like(torque), no_wake,
            cfg.dt, cfg.velocity_iters, cfg.position_iters,
        )
        goal_contact, wall_contact = flags(layout, info, goal_contact, wall_contact)
    return bodies, contacts, goal_contact, wall_contact
