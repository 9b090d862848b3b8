"""Build-time geometry vs the box2d-py oracle: hull order, mass, inertia,
local centers -- the anchors from SURVEY.md §2.2."""

import numpy as np
import pytest
from Box2D import b2World
from Box2D.b2 import fixtureDef, polygonShape

from gym_puzzles_tpu.engine import shapes as shp
from gym_puzzles_tpu.engine.types import BodySpec, FixtureSpec, build_shape_table

# v0 agent octagon, S=2 (multi_robot_puzzle_00.py:62-67)
AGENT_POLY_V0 = [
    (-0.25, -0.75), (0.25, -0.75), (0.75, -0.25), (0.75, 0.25),
    (0.25, 0.75), (-0.25, 0.75), (-0.75, 0.25), (-0.75, -0.25),
]
# v2/v3 octagon (multi_robot_puzzle_02.py:64-67, robot.py:7-10)
AGENT_POLY_V2 = [
    (-0.039, -0.095), (0.039, -0.095), (0.095, -0.039), (0.095, 0.039),
    (0.039, 0.095), (-0.039, 0.095), (-0.095, 0.039), (-0.095, -0.039),
]


def oracle_polygon(vertices):
    return polygonShape(vertices=[(float(x), float(y)) for x, y in vertices])


def test_hull_order_matches_box2d_octagon():
    ours = shp.convex_hull(np.array(AGENT_POLY_V0))
    theirs = np.array(oracle_polygon(AGENT_POLY_V0).vertices)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
    # SURVEY anchor: reordered list starts at (0.75, -0.25)
    np.testing.assert_allclose(ours[0], [0.75, -0.25])


def test_hull_order_matches_box2d_small_octagon():
    ours = shp.convex_hull(np.array(AGENT_POLY_V2))
    theirs = np.array(oracle_polygon(AGENT_POLY_V2).vertices)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_box_vertices_match_setasbox():
    s = polygonShape(box=(1.5, 0.5, (0.0, 0.5), 0.0))
    ours = shp.box_vertices(1.5, 0.5, (0.0, 0.5))
    np.testing.assert_allclose(ours, np.array(s.vertices), atol=1e-6)


def _oracle_mass(boxes=None, vertices=None, density=5.0):
    world = b2World(gravity=(0, 0), doSleep=False)
    body = world.CreateDynamicBody(position=(0, 0))
    if boxes:
        for hx, hy, cx, cy in boxes:
            body.CreatePolygonFixture(box=(hx, hy, (cx, cy), 0.0), density=density)
    if vertices is not None:
        body.CreatePolygonFixture(
            vertices=[(float(x), float(y)) for x, y in vertices], density=density
        )
    return body.mass, np.array(body.localCenter), body.inertia


@pytest.mark.parametrize(
    "boxes,density,expect_mass",
    [
        # v0 light T-block (00.py:322-332, scaled=2): mass 20, I 18.3333 about COM
        ([(0.5, 0.5, 0.0, -0.5), (1.5, 0.5, 0.0, 0.5)], 5.0, 20.0),
        # Heavy-v0 T-block (scaled=1, density 10): mass 160
        ([(1.0, 1.0, 0.0, -1.0), (3.0, 1.0, 0.0, 1.0)], 10.0, 160.0),
        # v2 block (02.py:331-341): 0.2496
        ([(0.1, 0.1, 0.0, -0.1), (0.3, 0.1, 0.0, 0.1)], 1.56, 0.2496),
    ],
)
def test_t_block_mass(boxes, density, expect_mass):
    m_o, c_o, i_o = _oracle_mass(boxes=boxes, density=density)
    spec = BodySpec(
        fixtures=[
            FixtureSpec(vertices=shp.box_vertices(hx, hy, (cx, cy)), density=density)
            for hx, hy, cx, cy in boxes
        ]
    )
    table = build_shape_table([spec])
    assert table.mass[0] == pytest.approx(m_o, rel=1e-6) == pytest.approx(expect_mass, rel=1e-4)
    np.testing.assert_allclose(table.local_center[0], c_o, atol=1e-6)
    # body.inertia is about worldCenter == COM inertia + m*|c|^2 about origin...
    # b2Body::GetInertia returns m_I + m * dot(localCenter, localCenter)
    ours_origin = table.inertia_com[0] + table.mass[0] * (table.local_center[0] ** 2).sum()
    assert ours_origin == pytest.approx(i_o, rel=1e-5)


def test_v0_agent_zero_density_fallback():
    # v0 agents: no density -> Box2D fallback mass=1, I=0 (00.py:368-376)
    world = b2World(gravity=(0, 0), doSleep=False)
    body = world.CreateDynamicBody(
        position=(0, 0),
        fixtures=fixtureDef(shape=oracle_polygon(AGENT_POLY_V0)),
    )
    assert body.mass == 1.0 and body.inertia == 0.0
    spec = BodySpec(fixtures=[FixtureSpec(vertices=np.array(AGENT_POLY_V0), density=0.0, from_hull=True)])
    table = build_shape_table([spec])
    assert table.mass[0] == 1.0
    assert table.inertia_com[0] == 0.0
    assert table.inv_inertia[0] == 0.0


@pytest.mark.parametrize(
    "poly,density,scale,expect_mass,expect_i",
    [
        (AGENT_POLY_V2, 17.3, 1.0, 0.516024, 0.002455),  # v2 agent (02.py:363-389)
        (AGENT_POLY_V2, 5.0, 8.0, 9.54496, 2.906626),  # v3 agent (core.py:228-243, robot.py:34-44)
    ],
)
def test_agent_mass(poly, density, scale, expect_mass, expect_i):
    verts = np.array(poly) * scale
    m_o, c_o, i_o = _oracle_mass(vertices=verts, density=density)
    spec = BodySpec(fixtures=[FixtureSpec(vertices=verts, density=density, from_hull=True)])
    table = build_shape_table([spec])
    assert table.mass[0] == pytest.approx(m_o, rel=1e-6) == pytest.approx(expect_mass, rel=1e-3)
    assert table.inertia_com[0] == pytest.approx(i_o, rel=1e-5) == pytest.approx(expect_i, rel=2e-3)
    np.testing.assert_allclose(table.local_center[0], c_o, atol=1e-6)


def test_saved_t_block_vertex_order():
    # The obs vertex order (00.py:356-361): fixture1 then fixture2, dedup.
    f1 = shp.box_vertices(0.5, 0.5, (0.0, -0.5))
    f2 = shp.box_vertices(1.5, 0.5, (0.0, 0.5))
    merged = list(map(tuple, f1))
    merged += [tuple(v) for v in f2 if tuple(v) not in merged]
    expect = [(-0.5, -1), (0.5, -1), (0.5, 0), (-0.5, 0), (-1.5, 0), (1.5, 0), (1.5, 1), (-1.5, 1)]
    assert merged == [(float(a), float(b)) for a, b in expect]
