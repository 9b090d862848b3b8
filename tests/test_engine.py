"""Engine step vs the box2d-py oracle.

Free-body motion (damping + integration, no contact) must match to f32
round-off.  Contact-rich trajectories are compared with tolerances: the
engine reproduces b2ContactSolver's algorithms but iterates contacts in
static pair order and skips TOI (see engine/world.py docstring)."""

import numpy as np
import pytest

import tests.oracle as orc
from gym_puzzles_tpu.engine import shapes as shp
from gym_puzzles_tpu.engine import world as eng
from gym_puzzles_tpu.engine.types import BodySpec, FixtureSpec, build_shape_table

import jax
import jax.numpy as jnp

DT = 1.0 / 50.0
VEL_ITERS = 180
POS_ITERS = 60

T_BOXES = [(0.5, 0.5, 0.0, -0.5), (1.5, 0.5, 0.0, 0.5)]


def t_block_spec(density=5.0, friction=0.999, damping=5.0):
    return BodySpec(
        fixtures=[
            FixtureSpec(
                vertices=shp.box_vertices(hx, hy, (cx, cy)),
                density=density,
                friction=friction,
            )
            for hx, hy, cx, cy in T_BOXES
        ],
        linear_damping=damping,
        angular_damping=damping,
    )


def run_engine(table, origin_pos, angles, vels, omegas, n_steps, forces=None):
    bodies = eng.init_bodies(table, np.array(origin_pos), np.array(angles))
    bodies = bodies.replace(
        vel=jnp.asarray(vels, jnp.float32), omega=jnp.asarray(omegas, jnp.float32)
    )
    contacts = eng.init_contacts(table)
    B = table.num_bodies
    # numpy (not device) closures: device-array constants stall lowering here
    zero_f = np.zeros((B, 2), np.float32)
    zero_t = np.zeros((B,), np.float32)
    # ApplyForce(wake=True) semantics when driving with forces; plain drift
    # never wakes anything (matches the oracle loops below).
    wake = np.full((B,), forces is not None)

    @jax.jit
    def stepfn(bodies, contacts, f):
        return eng.step(table, bodies, contacts, f, zero_t, wake, DT, VEL_ITERS, POS_ITERS)

    traj = []
    for i in range(n_steps):
        f = zero_f if forces is None else jnp.asarray(forces[i], jnp.float32)
        bodies, contacts, _ = stepfn(bodies, contacts, f)
        traj.append(
            np.concatenate(
                [
                    np.asarray(bodies.pos),
                    np.asarray(bodies.angle)[:, None],
                    np.asarray(bodies.vel),
                    np.asarray(bodies.omega)[:, None],
                ],
                axis=1,
            )
        )
    return np.stack(traj)  # [T, B, 6]


def test_free_body_damped_drift():
    """Single block, initial velocity, damping -- no contacts."""
    world = orc.make_world()
    body = orc.add_box_body(
        world, (5.0, 5.0), 0.3, T_BOXES, density=5.0, friction=0.999,
        linear_damping=5.0, angular_damping=5.0,
    )
    body.linearVelocity = (1.0, -0.5)
    body.angularVelocity = 2.0

    table = build_shape_table([t_block_spec()])
    traj = run_engine(table, [(5.0, 5.0)], [0.3], [(1.0, -0.5)], [2.0], 50)

    ref = []
    for _ in range(50):
        world.Step(DT, VEL_ITERS, POS_ITERS)
        ref.append(orc.body_state(body))
    ref = np.stack(ref)

    np.testing.assert_allclose(traj[:, 0, :], ref, rtol=0, atol=2e-5)


def test_free_body_forces():
    """Force application each step (the soft-force path)."""
    world = orc.make_world()
    body = orc.add_box_body(
        world, (3.0, 4.0), 1.2, T_BOXES, density=5.0, friction=0.999,
        linear_damping=5.0, angular_damping=5.0,
    )
    table = build_shape_table([t_block_spec()])

    rng = np.random.RandomState(0)
    forces = rng.uniform(-2, 2, size=(40, 1, 2))

    ref = []
    for i in range(40):
        body.ApplyForce((float(forces[i, 0, 0]), float(forces[i, 0, 1])), body.worldCenter, True)
        world.Step(DT, VEL_ITERS, POS_ITERS)
        ref.append(orc.body_state(body))
    ref = np.stack(ref)

    traj = run_engine(table, [(3.0, 4.0)], [1.2], [(0.0, 0.0)], [0.0], 40, forces=forces)
    np.testing.assert_allclose(traj[:, 0, :], ref, rtol=0, atol=2e-5)


def _two_body_world(x_gap, vx):
    """Octagon agent rams a T-block: the v0 contact scenario."""
    agent_poly = [
        (-0.25, -0.75), (0.25, -0.75), (0.75, -0.25), (0.75, 0.25),
        (0.25, 0.75), (-0.25, 0.75), (-0.75, 0.25), (-0.75, -0.25),
    ]
    world = orc.make_world()
    block = orc.add_box_body(
        world, (5.0, 5.0), 0.0, T_BOXES, density=5.0, friction=0.999,
        linear_damping=5.0, angular_damping=5.0,
    )
    agent = world.CreateDynamicBody(position=(5.0 - x_gap, 5.0))
    agent.CreatePolygonFixture(
        vertices=[(float(a), float(b)) for a, b in agent_poly]
    )
    agent.linearDamping = 5.0
    agent.angularDamping = 5.0
    agent.linearVelocity = (vx, 0.0)

    specs = [
        t_block_spec(),
        BodySpec(
            fixtures=[FixtureSpec(vertices=np.array(agent_poly), density=0.0, from_hull=True)],
            linear_damping=5.0,
            angular_damping=5.0,
        ),
    ]
    table = build_shape_table(specs)
    return world, block, agent, table


def test_contact_agent_pushes_block():
    """Velocity-set agent drives into the block; compare 80-step trajectory."""
    world, block, agent, table = _two_body_world(x_gap=2.4, vx=0.0)

    ref = []
    for _ in range(80):
        # holonomic control: velocity set each step (00.py:419-420)
        agent.linearVelocity = (4.0 / 3.0, 0.0)
        agent.angularVelocity = 0.0
        world.Step(DT, VEL_ITERS, POS_ITERS)
        ref.append(orc.world_state([block, agent]))
    ref = np.stack(ref)  # [T, 2, 6]

    bodies = eng.init_bodies(table, np.array([(5.0, 5.0), (2.6, 5.0)]), np.zeros(2))
    contacts = eng.init_contacts(table)
    zero_f = np.zeros((2, 2), np.float32)
    zero_t = np.zeros((2,), np.float32)

    wake = np.array([False, True])  # SetLinearVelocity(nonzero) wakes the agent

    @jax.jit
    def stepfn(bodies, contacts):
        bodies = bodies.replace(
            vel=bodies.vel.at[1].set(jnp.array([4.0 / 3.0, 0.0])),
            omega=bodies.omega.at[1].set(0.0),
        )
        return eng.step(table, bodies, contacts, zero_f, zero_t, wake, DT, VEL_ITERS, POS_ITERS)

    traj = []
    touched = False
    for _ in range(80):
        bodies, contacts, info = stepfn(bodies, contacts)
        touched = touched or bool(np.asarray(info.touching).any())
        traj.append(
            np.concatenate(
                [np.asarray(bodies.pos), np.asarray(bodies.angle)[:, None],
                 np.asarray(bodies.vel), np.asarray(bodies.omega)[:, None]], axis=1)
        )
    traj = np.stack(traj)

    assert touched, "engine never detected contact"
    # positions within a millimeter over the whole push
    np.testing.assert_allclose(traj[:, :, :2], ref[:, :, :2], atol=2e-3)
    # angles close
    np.testing.assert_allclose(traj[:, :, 2], ref[:, :, 2], atol=5e-3)


def test_touch_events_match_oracle():
    """Touch begin timing matches Box2D's manifold appearance."""
    world, block, agent, table = _two_body_world(x_gap=2.4, vx=0.0)

    ref_touch = []
    for _ in range(60):
        agent.linearVelocity = (4.0 / 3.0, 0.0)
        world.Step(DT, VEL_ITERS, POS_ITERS)
        touching = any(
            c.contact.touching for c in agent.contacts
        )
        ref_touch.append(touching)

    bodies = eng.init_bodies(table, np.array([(5.0, 5.0), (2.6, 5.0)]), np.zeros(2))
    contacts = eng.init_contacts(table)
    zero_f = np.zeros((2, 2), np.float32)
    zero_t = np.zeros((2,), np.float32)

    wake = np.array([False, True])

    @jax.jit
    def stepfn(bodies, contacts):
        bodies = bodies.replace(vel=bodies.vel.at[1].set(jnp.array([4.0 / 3.0, 0.0])))
        return eng.step(table, bodies, contacts, zero_f, zero_t, wake, DT, VEL_ITERS, POS_ITERS)

    ours_touch = []
    for _ in range(60):
        bodies, contacts, info = stepfn(bodies, contacts)
        ours_touch.append(bool(np.asarray(info.touching).any()))

    # NOTE: Box2D reports touching from the *start-of-step* narrow phase, as
    # do we; allow +-1 step skew from f32 ordering differences.
    first_ref = ref_touch.index(True)
    first_ours = ours_touch.index(True)
    assert abs(first_ref - first_ours) <= 1


def test_sleep_sawtooth_matches_oracle():
    """box2d-py 2.3.5 sleeps slow bodies even with doSleep=False; a block
    under a small per-step force (the soft-assist pattern, 00.py:421-424)
    shows a velocity sawtooth: sleep zeroes v, ApplyForce re-wakes it."""
    world = orc.make_world()
    body = orc.add_box_body(
        world, (5.0, 5.0), 0.0, T_BOXES, density=5.0, friction=0.999,
        linear_damping=5.0, angular_damping=5.0,
    )
    table = build_shape_table([t_block_spec()])
    bodies = eng.init_bodies(table, np.array([(5.0, 5.0)]), np.zeros(1))
    contacts = eng.init_contacts(table)
    zero_t = np.zeros((1,), np.float32)
    wake = np.array([True])  # ApplyForce(wake=True) every step
    f = np.array([[0.8, 0.0]], np.float32)

    @jax.jit
    def stepfn(bodies, contacts):
        return eng.step(table, bodies, contacts, f, zero_t, wake, DT, VEL_ITERS, POS_ITERS)

    ref_v, our_v = [], []
    for _ in range(80):
        body.ApplyForce((0.8, 0.0), body.worldCenter, True)
        world.Step(DT, VEL_ITERS, POS_ITERS)
        ref_v.append(body.linearVelocity[0])
        bodies, contacts, _ = stepfn(bodies, contacts)
        our_v.append(float(bodies.vel[0, 0]))

    ref_v = np.array(ref_v)
    our_v = np.array(our_v)
    assert (ref_v == 0.0).any(), "oracle never slept -- test premise broken"
    np.testing.assert_allclose(our_v, ref_v, atol=1e-6)
    # the sleep steps line up exactly
    np.testing.assert_array_equal(our_v == 0.0, ref_v == 0.0)
