"""Box2D oracle helpers for parity tests.

Builds b2 worlds directly through box2d-py (the same binding the reference
depends on, setup.py:10) mirroring the reference env constructions, so engine
tests compare against ground truth without importing the legacy-gym reference
code.
"""

from __future__ import annotations

import numpy as np
from Box2D import b2World
from Box2D.b2 import fixtureDef, polygonShape


def make_world():
    return b2World(gravity=(0, 0), doSleep=False)


def add_static_box(world, position, half_extents, friction=0.2, restitution=0.0):
    return world.CreateStaticBody(
        position=position,
        fixtures=fixtureDef(
            shape=polygonShape(box=tuple(half_extents)),
            friction=friction,
            restitution=restitution,
        ),
        userData="wall",
    )


def add_polygon_body(
    world,
    position,
    angle,
    vertices,
    density,
    friction,
    restitution=0.0,
    linear_damping=0.0,
    angular_damping=0.0,
):
    body = world.CreateDynamicBody(
        position=position,
        angle=angle,
        linearDamping=linear_damping,
        angularDamping=angular_damping,
    )
    body.CreatePolygonFixture(
        vertices=[(float(x), float(y)) for x, y in vertices],
        density=density,
        friction=friction,
        restitution=restitution,
    )
    return body


def add_box_body(
    world,
    position,
    angle,
    boxes,  # list of (hx, hy, cx, cy)
    density,
    friction,
    restitution=0.0,
    linear_damping=0.0,
    angular_damping=0.0,
):
    body = world.CreateDynamicBody(
        position=position,
        angle=angle,
        linearDamping=linear_damping,
        angularDamping=angular_damping,
    )
    for hx, hy, cx, cy in boxes:
        body.CreatePolygonFixture(
            box=(hx, hy, (cx, cy), 0.0),
            density=density,
            friction=friction,
            restitution=restitution,
        )
    return body


def body_state(body):
    c = body.worldCenter
    v = body.linearVelocity
    return np.array([c[0], c[1], body.angle, v[0], v[1], body.angularVelocity])


def world_state(bodies):
    return np.stack([body_state(b) for b in bodies])
