"""L/I block shapes vs the box2d-py oracle.

The reference's Block entity supports T/L/I (blocks.py:15,80-109) and v0
carries the same L/I fixture recipes in its multi-block scaffolding
(00.py:320-351); only T is ever instantiated by a registered env
(core.py:224, 00.py:168).  These tests pin the rebuild's L/I capability to
the oracle: fixture geometry, dedup'd obs vertex order, mass properties,
and contact dynamics.
"""

import warnings

import numpy as np
import pytest
from Box2D import b2World

import jax
import jax.numpy as jnp

import tests.oracle as orc
from gym_puzzles_tpu.engine import shapes as shp
from gym_puzzles_tpu.engine import world as eng
from gym_puzzles_tpu.engine.types import BodySpec, FixtureSpec, build_shape_table
from gym_puzzles_tpu.envs import layout as lay

DT = 1.0 / 50.0
VEL_ITERS = 180
POS_ITERS = 60

# (hx, hy, cx, cy) per fixture at scale=1 (blocks.py:92-109)
L_BOXES = [(1.0, 1.0, 1.0, 0.5), (1.0, 2.0, -1.0, -0.5)]
I_BOXES = [(1.0, 2.0, 0.0, 0.0)]


def _oracle_block(shape: str, scale: float, density: float = 5.0):
    """Build the reference Block's body in box2d-py (blocks.py:70-109)."""
    world = b2World(gravity=(0, 0), doSleep=False)
    body = world.CreateDynamicBody(position=(0, 0), linearDamping=5.0, angularDamping=5.0)
    boxes = {"l": L_BOXES, "i": I_BOXES}[shape]
    for hx, hy, cx, cy in boxes:
        body.CreatePolygonFixture(
            box=(hx * scale, hy * scale, (cx * scale, cy * scale), 0.0),
            density=density, friction=2.5, restitution=0.0,
        )
    return world, body


@pytest.mark.parametrize("shape,scale", [("l", 1.0), ("l", 0.5), ("i", 1.0), ("i", 0.5)])
def test_block_mass_properties(shape, scale):
    world, body = _oracle_block(shape, scale)  # keep world alive: GC frees the body
    fixtures, _ = lay.block_fixture_vertices(shape, scale)
    spec = BodySpec(fixtures=[FixtureSpec(vertices=f, density=5.0, friction=2.5)
                              for f in fixtures])
    table = build_shape_table([spec])
    assert table.mass[0] == pytest.approx(body.mass, rel=1e-6)
    np.testing.assert_allclose(table.local_center[0], np.array(body.localCenter), atol=1e-6)
    # b2Body.inertia is about the origin: I_com + m*|localCenter|^2
    ours_origin = table.inertia_com[0] + table.mass[0] * (table.local_center[0] ** 2).sum()
    assert ours_origin == pytest.approx(body.inertia, rel=1e-5)


@pytest.mark.parametrize("shape,n_expected", [("l", 7), ("i", 4)])
def test_block_dedup_vertex_order(shape, n_expected):
    """The obs vertex list mirrors blocks.py:107-109: fixtures in creation
    order, skipping already-seen vertices (L shares one corner -> 7)."""
    world, body = _oracle_block(shape, 1.0)
    ref_merged = []
    for fix in body.fixtures:
        ref_merged += [v for v in fix.shape.vertices if v not in ref_merged]
    _, ours = lay.block_fixture_vertices(shape, 1.0)
    assert len(ours) == n_expected == len(ref_merged)
    np.testing.assert_allclose(ours, np.array(ref_merged), atol=1e-6)


@pytest.mark.parametrize("shape", ["l", "i"])
def test_agent_pushes_block_parity(shape):
    """v0-style velocity-set agent rams the L/I block; 80-step trajectory
    parity vs box2d (same tolerances as the T-block test)."""
    agent_poly = [
        (-0.25, -0.75), (0.25, -0.75), (0.75, -0.25), (0.75, 0.25),
        (0.25, 0.75), (-0.25, 0.75), (-0.75, 0.25), (-0.75, -0.25),
    ]
    boxes = {"l": L_BOXES, "i": I_BOXES}[shape]
    world = orc.make_world()
    block = orc.add_box_body(
        world, (5.0, 5.0), 0.0, [(hx * 0.5, hy * 0.5, cx * 0.5, cy * 0.5)
                                 for hx, hy, cx, cy in boxes],
        density=5.0, friction=0.999, linear_damping=5.0, angular_damping=5.0,
    )
    agent = world.CreateDynamicBody(position=(2.6, 5.0))
    agent.CreatePolygonFixture(vertices=[(float(a), float(b)) for a, b in agent_poly])
    agent.linearDamping = 5.0
    agent.angularDamping = 5.0

    fixtures, _ = lay.block_fixture_vertices(shape, 0.5)
    specs = [
        BodySpec(fixtures=[FixtureSpec(vertices=f, density=5.0, friction=0.999)
                           for f in fixtures],
                 linear_damping=5.0, angular_damping=5.0),
        BodySpec(fixtures=[FixtureSpec(vertices=np.array(agent_poly), density=0.0,
                                       from_hull=True)],
                 linear_damping=5.0, angular_damping=5.0),
    ]
    table = build_shape_table(specs)

    ref = []
    for _ in range(80):
        agent.linearVelocity = (4.0 / 3.0, 0.0)
        agent.angularVelocity = 0.0
        world.Step(DT, VEL_ITERS, POS_ITERS)
        ref.append(orc.world_state([block, agent]))
    ref = np.stack(ref)

    bodies = eng.init_bodies(table, np.array([(5.0, 5.0), (2.6, 5.0)]), np.zeros(2))
    contacts = eng.init_contacts(table)
    zero_f = np.zeros((2, 2), np.float32)
    zero_t = np.zeros((2,), np.float32)
    wake = np.array([False, True])

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
        traj.append(np.concatenate(
            [np.asarray(bodies.pos), np.asarray(bodies.angle)[:, None],
             np.asarray(bodies.vel), np.asarray(bodies.omega)[:, None]], axis=1))
    traj = np.stack(traj)

    assert touched, "engine never detected contact"
    np.testing.assert_allclose(traj[:, :, :2], ref[:, :, :2], atol=2e-3)
    np.testing.assert_allclose(traj[:, :, 2], ref[:, :, 2], atol=5e-3)


@pytest.mark.parametrize(
    "env_id,shape,expect_obs",
    [
        ("MultiRobotPuzzle-v0", "l", 26), ("MultiRobotPuzzle-v0", "i", 20),
        ("MultiRobotPuzzle-v3", "l", 25), ("MultiRobotPuzzle-v3", "i", 19),
        ("MultiRobotPuzzleHeavy-v0", "l", 38),
    ],
)
def test_env_block_shape_rollout(env_id, shape, expect_obs):
    from gym_puzzles_tpu.api.registry import make

    env = make(env_id, num_envs=4, block_shape=shape)
    assert env.cfg.obs_dim == expect_obs
    vstate, obs = env.reset(jax.random.key(0))
    assert obs.shape == (4, expect_obs)
    a = np.random.RandomState(0).uniform(-1, 1, (4, env.cfg.act_dim)).astype(np.float32)
    for _ in range(5):
        vstate, obs, r, d, _ = env.step(vstate, a)
    assert np.isfinite(np.asarray(obs)).all() and np.isfinite(np.asarray(r)).all()


def test_invalid_shape_warns_and_randomizes():
    """blocks.py:41-45: unsupported shape name warns + random.choice."""
    from gym_puzzles_tpu.api.registry import _normalize_block_shape

    assert _normalize_block_shape("T") == "t"
    assert _normalize_block_shape("L") == "l"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = _normalize_block_shape("hexagon")
    assert got in ("t", "l", "i")
    assert any("not supported" in str(x.message) for x in w)


def test_v2_rejects_block_shape():
    from gym_puzzles_tpu.api.registry import make

    with pytest.raises(ValueError):
        make("MultiRobotPuzzle-v2", num_envs=2, block_shape="l")
