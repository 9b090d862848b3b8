"""Engine step: the batched, jit-compiled replacement for ``b2World::Step``.

One call = one physics tick for one env (vmap over the env batch on top):

    narrow phase for pairs with an awake dynamic endpoint
      -> touch events + warm-start impulse matching   [b2ContactManager::Collide]
    island labeling + wake propagation                 [b2World::Solve traversal]
    integrate velocities + damping (awake bodies)      [b2Island::Solve]
    init velocity constraints, warm start
    velocity iterations (sequential impulses)
    integrate positions (clamped)
    position iterations (Baumgarte, per-island early exit)
    sleep bookkeeping (velocity zeroing!)              [b2Island::Solve tail]

Reference call: ``world.Step(1.0/FPS, 6*30, 2*30)`` -- dt=0.02 s, 180
velocity / 60 position iterations (multi_robot_puzzle_00.py:428,
multi_robot_puzzle_02.py:478, core.py:367).  Iteration counts are static
arguments here so variants compile their exact configuration.

Sleeping is modeled because box2d-py 2.3.5 ignores ``doSleep=False``
(empirically verified): the reference's worlds sleep slow bodies after 0.5 s,
zeroing their velocities -- observable in obs and trajectories, e.g. the
slowly drifting T-block's velocity sawtooths under the soft assist force.

Known divergences from Box2D (documented, tolerance-tested): no TOI
(continuous collision) sub-stepping against static walls -- at these speeds
(<= 5 m/s, dt 0.02) tunneling cannot occur through the 0.2..2 m thick
walls -- and contact solve order is static pair order instead of per-island
traversal order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gym_puzzles_tpu.engine import math2d as m2
from gym_puzzles_tpu.engine import narrowphase as nph
from gym_puzzles_tpu.engine import solver as slv
from gym_puzzles_tpu.engine.types import Bodies, Contacts, ShapeTable


@struct.dataclass
class StepInfo:
    """Per-pair contact outcome of one tick, for env-layer flags."""

    touching: object  # [P] bool, manifold non-empty at tick start
    begin: object  # [P] bool, touch began this tick
    end: object  # [P] bool, touch ended this tick


def init_bodies(table: ShapeTable, origin_pos, angle) -> Bodies:
    """Build body state from body-*origin* positions (what CreateDynamicBody
    takes) and angles; stores world COM like Box2D's sweep.  Bodies start
    awake with zero velocity (b2BodyDef defaults)."""
    origin_pos = jnp.asarray(origin_pos, dtype=jnp.float32)
    angle = jnp.asarray(angle, dtype=jnp.float32)
    q = m2.rot(angle)
    com = origin_pos + m2.rot_vec(q, table.local_center)
    B = table.num_bodies
    return Bodies(
        pos=com,
        angle=angle,
        vel=jnp.zeros_like(origin_pos),
        omega=jnp.zeros_like(angle),
        awake=jnp.ones((B,), bool),
        sleep_time=jnp.zeros((B,), jnp.float32),
    )


def init_contacts(table: ShapeTable) -> Contacts:
    P = table.num_pairs
    return Contacts(
        man=nph.Manifold(
            flip=jnp.zeros((P,), bool),
            local_normal=jnp.zeros((P, 2), jnp.float32),
            local_point=jnp.zeros((P, 2), jnp.float32),
            points=jnp.zeros((P, 2, 2), jnp.float32),
            ids=jnp.full((P, 2), -1, jnp.int32),
            count=jnp.zeros((P,), jnp.int32),
        ),
        normal_impulse=jnp.zeros((P, 2), jnp.float32),
        tangent_impulse=jnp.zeros((P, 2), jnp.float32),
        touching=jnp.zeros((P,), bool),
    )


def body_origins(table: ShapeTable, bodies: Bodies):
    """World origin positions [B,2] (b2Body::GetPosition)."""
    q = m2.rot(bodies.angle)
    return bodies.pos - m2.rot_vec(q, table.local_center), q


def collide_all(table: ShapeTable, bodies: Bodies) -> nph.Manifold:
    """Narrow phase over the dense static pair list (vmapped)."""
    origin, q = body_origins(table, bodies)
    ia = table.pair_body_a  # numpy, static
    ib = table.pair_body_b
    fa = table.pair_fix_a
    fb = table.pair_fix_b

    # numpy gathers with static indices: per-pair constants, no device work.
    man = jax.vmap(nph.collide_polygons)(
        table.fix_verts[fa],
        table.fix_normals[fa],
        table.fix_count[fa],
        origin[ia],
        q[ia],
        table.fix_verts[fb],
        table.fix_normals[fb],
        table.fix_count[fb],
        origin[ib],
        q[ib],
    )
    # Sanitize dead/padded slots so downstream masked math never sees NaN.
    slot_alive = jnp.arange(2)[None, :] < man.count[:, None]
    points = jnp.where(slot_alive[..., None], man.points, 0.0)
    return man.replace(points=points)


def _tree_select(mask, a, b):
    """Per-pair select between two pytrees with leading axis P."""
    def sel(x, y):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - 1))
        return jnp.where(m, x, y)

    return jax.tree_util.tree_map(sel, a, b)


def step(
    table: ShapeTable,
    bodies: Bodies,
    contacts: Contacts,
    force,
    torque,
    wake,
    dt: float,
    velocity_iters: int,
    position_iters: int,
    solver_unroll: bool = False,
):
    """One physics tick for a single env.

    ``force`` [B,2] / ``torque`` [B] are this tick's accumulators (cleared
    implicitly: pass fresh ones each call, as ``b2World`` clears them after
    Step).  ``wake`` [B] marks bodies the controls woke (ApplyForce /
    SetLinearVelocity-with-nonzero semantics -- computed by the env layer).

    Returns (bodies, contacts, StepInfo).
    """
    dyn = ~table.is_static  # numpy [B]

    # -- control wakes (before the step, as the env calls happen pre-Step) --
    awake = bodies.awake | wake
    sleep_time = jnp.where(wake & ~bodies.awake, 0.0, bodies.sleep_time)

    # -- contact update (b2ContactManager::Collide): skipped for pairs whose
    # dynamic endpoints are all asleep; their manifolds stay frozen ---------
    with jax.named_scope("narrowphase"):
        man_new = collide_all(table, bodies)
    awake_eff = awake | jnp.asarray(table.is_static)
    upd = awake_eff[table.pair_body_a] | awake_eff[table.pair_body_b]

    man = _tree_select(upd, man_new, contacts.man)
    touching = jnp.where(upd, man_new.count > 0, contacts.touching)
    begin = upd & touching & ~contacts.touching
    end = upd & ~touching & contacts.touching

    matched_n, matched_t = jax.vmap(nph.match_impulses)(
        man_new.ids, contacts.man.ids, contacts.normal_impulse, contacts.tangent_impulse
    )
    matched_n = jnp.where(upd[:, None], matched_n, contacts.normal_impulse)
    matched_t = jnp.where(upd[:, None], matched_t, contacts.tangent_impulse)

    # -- islands + wake propagation ----------------------------------------
    with jax.named_scope("islands"):
        labels = slv.compute_islands(table, touching)
        awake, sleep_time = slv.propagate_wake(table, labels, awake, sleep_time)
        active = awake & jnp.asarray(dyn)

    # -- integrate velocities + damping (awake bodies only) ----------------
    vel_i = bodies.vel + dt * table.inv_mass[:, None] * force
    omega_i = bodies.omega + dt * table.inv_inertia * torque
    # box2d-py 2.3.5 vendors the pre-2.3.2 damping: v *= clamp(1 - dt*d, 0, 1)
    # (first-order Taylor of exp(-d*dt)), verified against the oracle.
    lin_k = np.clip(1.0 - dt * table.linear_damping, 0.0, 1.0).astype(np.float32)
    ang_k = np.clip(1.0 - dt * table.angular_damping, 0.0, 1.0).astype(np.float32)
    vel = jnp.where(active[:, None], vel_i * lin_k[:, None], bodies.vel)
    omega = jnp.where(active, omega_i * ang_k, bodies.omega)

    # -- contact solve ----------------------------------------------------
    with jax.named_scope("velocity_solve"):
        vc = slv.init_velocity_constraints(
            table, man, bodies.pos, bodies.angle, vel, omega, matched_n, matched_t, active
        )
        vel, omega = slv.warm_start(table, vc, vel, omega, solver_unroll)
        vel, omega, vc = slv.solve_velocity_constraints(
            table, vc, vel, omega, velocity_iters, solver_unroll
        )

    with jax.named_scope("position_solve"):
        pos, angle, vel, omega = slv.integrate_positions(
            bodies.pos, bodies.angle, vel, omega, dt, active
        )
        pos, angle, pos_solved = slv.solve_position_constraints(
            table, man, pos, angle, position_iters, vc.solve, labels, solver_unroll
        )

    # -- sleep bookkeeping (zeroes velocities of islands at rest) ----------
    with jax.named_scope("sleep"):
        awake, sleep_time, vel, omega = slv.update_sleep(
            table, labels, awake, sleep_time, vel, omega, dt, pos_solved
        )

    # -- store impulses for next-tick warm start (b2ContactSolver::
    # StoreImpulses; degraded second points keep their matched value, as
    # Box2D leaves the manifold's stored impulse untouched there) ----------
    slot = jnp.arange(2)[None, :]
    live = vc.solve[:, None] & (slot < vc.count[:, None])
    stored_n = jnp.where(live, vc.normal_impulse, matched_n)
    stored_t = jnp.where(live, vc.tangent_impulse, matched_t)

    new_contacts = Contacts(
        man=man,
        normal_impulse=stored_n,
        tangent_impulse=stored_t,
        touching=touching,
    )
    new_bodies = Bodies(
        pos=pos, angle=angle, vel=vel, omega=omega, awake=awake, sleep_time=sleep_time
    )
    return new_bodies, new_contacts, StepInfo(touching=touching, begin=begin, end=end)


def step_batched(
    table: ShapeTable,
    bodies: Bodies,
    contacts: Contacts,
    force,
    torque,
    wake,
    dt: float,
    velocity_iters: int,
    position_iters: int,
):
    """Batched engine tick with the Pallas contact-solve kernel.

    All pytree leaves carry the env batch on the LAST axis (lane-major).
    The narrow phase / islands / sleep logic run as vmapped straight-line
    XLA (cheap, one HBM pass); the sequential solver -- the HBM-bound part
    in pure XLA -- runs inside one VMEM-resident kernel
    (engine/solver_pallas.py).  Semantics identical to :func:`step`.
    """
    from gym_puzzles_tpu.engine import solver_pallas as slp

    dyn = ~table.is_static
    vm = lambda f, *a: jax.vmap(f, in_axes=-1, out_axes=-1)(*a)

    awake = bodies.awake | wake
    sleep_time = jnp.where(wake & ~bodies.awake, 0.0, bodies.sleep_time)

    man_new = jax.vmap(lambda b: collide_all(table, b), in_axes=-1, out_axes=-1)(bodies)
    awake_eff = awake | jnp.asarray(table.is_static)[:, None]
    upd = awake_eff[table.pair_body_a] | awake_eff[table.pair_body_b]  # [P, E]

    def _sel_b(x, y):  # leaves [P, ..., E]; mask [P, E]
        m = upd.reshape((upd.shape[0],) + (1,) * (x.ndim - 2) + (upd.shape[1],))
        return jnp.where(m, x, y)

    man = jax.tree_util.tree_map(_sel_b, man_new, contacts.man)
    touching = jnp.where(upd, man_new.count > 0, contacts.touching)
    begin = upd & touching & ~contacts.touching
    end = upd & ~touching & contacts.touching

    match2 = jax.vmap(jax.vmap(nph.match_impulses), in_axes=-1, out_axes=-1)
    matched_n, matched_t = match2(
        man_new.ids, contacts.man.ids, contacts.normal_impulse, contacts.tangent_impulse
    )
    matched_n = jnp.where(upd[:, None], matched_n, contacts.normal_impulse)
    matched_t = jnp.where(upd[:, None], matched_t, contacts.tangent_impulse)

    labels = jax.vmap(lambda t: slv.compute_islands(table, t), in_axes=-1, out_axes=-1)(
        touching
    )
    awake, sleep_time = jax.vmap(
        lambda l, a, s: slv.propagate_wake(table, l, a, s), in_axes=-1, out_axes=-1
    )(labels, awake, sleep_time)
    active = awake & jnp.asarray(dyn)[:, None]

    vel_i = bodies.vel + dt * table.inv_mass[:, None, None] * force
    omega_i = bodies.omega + dt * table.inv_inertia[:, None] * torque
    lin_k = np.clip(1.0 - dt * table.linear_damping, 0.0, 1.0).astype(np.float32)
    ang_k = np.clip(1.0 - dt * table.angular_damping, 0.0, 1.0).astype(np.float32)
    vel = jnp.where(active[:, None], vel_i * lin_k[:, None, None], bodies.vel)
    omega = jnp.where(active, omega_i * ang_k[:, None], bodies.omega)

    vc = jax.vmap(
        lambda m, p, a, v, o, mn, mt, act: slv.init_velocity_constraints(
            table, m, p, a, v, o, mn, mt, act
        ),
        in_axes=-1,
        out_axes=-1,
    )(man, bodies.pos, bodies.angle, vel, omega, matched_n, matched_t, active)

    both_dyn = (dyn[table.pair_body_a] & dyn[table.pair_body_b])  # numpy [P]
    link = touching & jnp.asarray(both_dyn)[:, None]

    vel, omega, pos, angle, n_imp, t_imp, pos_solved = slp.solve_contacts(
        table, vc, man, bodies.pos, bodies.angle, vel, omega, active, link,
        float(dt), int(velocity_iters), int(position_iters),
    )

    awake, sleep_time, vel, omega = jax.vmap(
        lambda l, a, s, v, o, ps: slv.update_sleep(table, l, a, s, v, o, dt, ps),
        in_axes=-1,
        out_axes=-1,
    )(labels, awake, sleep_time, vel, omega, pos_solved)

    slot = jnp.arange(2)[None, :, None]
    live = vc.solve[:, None, :] & (slot < vc.count[:, None, :])
    stored_n = jnp.where(live, n_imp, matched_n)
    stored_t = jnp.where(live, t_imp, matched_t)

    new_contacts = Contacts(
        man=man, normal_impulse=stored_n, tangent_impulse=stored_t, touching=touching
    )
    new_bodies = Bodies(
        pos=pos, angle=angle, vel=vel, omega=omega, awake=awake, sleep_time=sleep_time
    )
    del vm
    return new_bodies, new_contacts, StepInfo(touching=touching, begin=begin, end=end)
