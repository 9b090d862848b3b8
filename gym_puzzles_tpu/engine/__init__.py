"""Batched TPU-native 2D rigid body engine (JAX): the jit-compiled
replacement for the reference's Box2D dependency (setup.py:10)."""

from gym_puzzles_tpu.engine.types import (
    Bodies,
    BodySpec,
    Contacts,
    FixtureSpec,
    ShapeTable,
    build_shape_table,
)
from gym_puzzles_tpu.engine.world import (
    StepInfo,
    body_origins,
    collide_all,
    init_bodies,
    init_contacts,
    step,
)

__all__ = [
    "Bodies",
    "BodySpec",
    "Contacts",
    "FixtureSpec",
    "ShapeTable",
    "StepInfo",
    "build_shape_table",
    "body_origins",
    "collide_all",
    "init_bodies",
    "init_contacts",
    "step",
]
