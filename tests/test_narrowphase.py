"""Narrow-phase manifolds vs the box2d-py oracle, compared in *local*
manifold space (reference face, local points, packed contact ids) using a
zero-iteration world step so the oracle's solver can't move anything."""

import numpy as np
import pytest
from Box2D import b2World

import jax
import jax.numpy as jnp

from gym_puzzles_tpu.engine import math2d as m2
from gym_puzzles_tpu.engine import narrowphase as nph
from gym_puzzles_tpu.engine import shapes as shp


def _oracle_manifold(vertsA, posA, angA, vertsB, posB, angB):
    """Returns a plain-python snapshot (the SWIG manifold dies with the
    world, so copy everything out before returning)."""
    w = b2World(gravity=(0, 0), doSleep=False)
    a = w.CreateDynamicBody(position=tuple(map(float, posA)), angle=float(angA))
    a.CreatePolygonFixture(vertices=[(float(x), float(y)) for x, y in vertsA], density=1.0)
    b = w.CreateDynamicBody(position=tuple(map(float, posB)), angle=float(angB))
    b.CreatePolygonFixture(vertices=[(float(x), float(y)) for x, y in vertsB], density=1.0)
    w.Step(1e-9, 0, 0)  # collide only; solver disabled
    for contact in w.contacts:
        m = contact.manifold
        return {
            "count": m.pointCount,
            "type": m.type_,
            "local_normal": (m.localNormal.x, m.localNormal.y),
            "local_point": (m.localPoint.x, m.localPoint.y),
            "points": [((p.localPoint.x, p.localPoint.y), p.id.key)
                       for p in m.points[: m.pointCount]],
        }
    return None


def _ours(vertsA, posA, angA, vertsB, posB, angB):
    nA = shp.edge_normals(vertsA).astype(np.float32)
    nB = shp.edge_normals(vertsB).astype(np.float32)
    pad = lambda v: np.concatenate(
        [v, np.repeat(v[-1:], 8 - len(v), axis=0)]
    ).astype(np.float32)
    return jax.jit(nph.collide_polygons)(
        pad(np.asarray(vertsA)), pad(nA), len(vertsA),
        jnp.asarray(posA, jnp.float32), m2.rot(jnp.asarray(angA, jnp.float32)),
        pad(np.asarray(vertsB)), pad(nB), len(vertsB),
        jnp.asarray(posB, jnp.float32), m2.rot(jnp.asarray(angB, jnp.float32)),
    )


OCT = shp.convex_hull(
    np.array([
        (-0.25, -0.75), (0.25, -0.75), (0.75, -0.25), (0.75, 0.25),
        (0.25, 0.75), (-0.25, 0.75), (-0.75, 0.25), (-0.75, -0.25),
    ])
)

CASES = [
    # face-face overlap (stacked boxes)
    (shp.box_vertices(1.0, 0.5), (0.0, 0.0), 0.0, shp.box_vertices(1.0, 0.5), (0.5, 0.97), 0.0),
    # corner poke with rotation
    (shp.box_vertices(1.0, 0.5), (0.0, 0.0), 0.0, shp.box_vertices(1.0, 0.5), (1.85, 0.6), 0.6),
    # deep overlap
    (shp.box_vertices(1.0, 1.0), (0.0, 0.0), 0.0, shp.box_vertices(1.0, 1.0), (1.2, 0.3), 0.2),
    # octagon agent vs block face (the v0 contact)
    (OCT, (0.0, 0.0), 0.1, shp.box_vertices(1.5, 0.5, (0.0, 0.5)), (1.2, 0.35), 0.0),
    # separated
    (shp.box_vertices(1.0, 0.5), (0.0, 0.0), 0.0, shp.box_vertices(1.0, 0.5), (4.0, 0.0), 0.0),
    # barely touching (within polygon radius)
    (shp.box_vertices(1.0, 0.5), (0.0, 0.0), 0.0, shp.box_vertices(1.0, 0.5), (0.0, 1.015), 0.0),
]


@pytest.mark.parametrize("vertsA,posA,angA,vertsB,posB,angB", CASES)
def test_local_manifold_matches_box2d(vertsA, posA, angA, vertsB, posB, angB):
    # polygonShape(vertices=...) hull-reorders its input; run both sides
    # through the same hull so edge indices (and thus contact ids) align
    vertsA = shp.convex_hull(vertsA)
    vertsB = shp.convex_hull(vertsB)
    ref = _oracle_manifold(vertsA, posA, angA, vertsB, posB, angB)
    man = _ours(vertsA, posA, angA, vertsB, posB, angB)

    ref_count = ref["count"] if ref is not None else 0
    assert int(man.count) == ref_count
    if ref_count == 0:
        return

    # type: 1=faceA (flip False), 2=faceB (flip True)
    assert (2 if bool(man.flip) else 1) == ref["type"]
    np.testing.assert_allclose(np.asarray(man.local_normal), ref["local_normal"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(man.local_point), ref["local_point"], atol=1e-6)
    for j, (pt, key) in enumerate(ref["points"]):
        np.testing.assert_allclose(np.asarray(man.points[j]), pt, atol=1e-5)
        assert int(np.asarray(man.ids[j])) == key, f"id mismatch at point {j}"


def test_contact_ids_stable_under_small_motion():
    """Ids persist while the touching feature persists -> warm-start carries."""
    vertsA = shp.box_vertices(1.0, 0.5)
    vertsB = shp.box_vertices(1.0, 0.5)
    man1 = _ours(vertsA, (0.0, 0.0), 0.0, vertsB, (0.3, 0.97), 0.0)
    man2 = _ours(vertsA, (0.0, 0.0), 0.0, vertsB, (0.31, 0.968), 0.0)
    assert int(man1.count) == 2 and int(man2.count) == 2
    np.testing.assert_array_equal(np.asarray(man1.ids), np.asarray(man2.ids))

    matched_n, matched_t = nph.match_impulses(
        man2.ids, man1.ids, jnp.asarray([1.5, 2.5]), jnp.asarray([0.1, -0.2])
    )
    np.testing.assert_allclose(np.asarray(matched_n), [1.5, 2.5])
    np.testing.assert_allclose(np.asarray(matched_t), [0.1, -0.2])


def test_id_mismatch_zeroes_impulses():
    vertsA = shp.box_vertices(1.0, 0.5)
    vertsB = shp.box_vertices(1.0, 0.5)
    man = _ours(vertsA, (0.0, 0.0), 0.0, vertsB, (0.3, 0.97), 0.0)
    matched_n, _ = nph.match_impulses(
        man.ids, jnp.asarray([12345, 67890], jnp.int32),
        jnp.asarray([9.0, 9.0]), jnp.asarray([9.0, 9.0])
    )
    np.testing.assert_allclose(np.asarray(matched_n), [0.0, 0.0])
