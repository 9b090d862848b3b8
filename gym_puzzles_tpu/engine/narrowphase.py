"""Convex polygon narrow phase: SAT + incident-edge clipping -> 2-point
manifolds with Box2D-compatible contact feature ids.

Single-pair, fixed-shape, fully maskable (no data-dependent control flow), so
it vmaps over the static pair list and again over the env batch.  Reproduces
``b2CollidePolygons`` semantics -- reference-edge selection with the
0.1*linearSlop bias, incident-edge argmin, two side-plane clips that fail the
whole manifold when fewer than 2 points survive, and the final
separation <= totalRadius filter with slot compaction -- because the
reference's contact dynamics (and its goal_contact observation bit,
multi_robot_puzzle_00.py:92-111,453) depend on exactly these rules.

Padded vertices (repeating the last vertex) are masked out of every argmin /
argmax / min reduction.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from gym_puzzles_tpu.engine import math2d as m2
from gym_puzzles_tpu.engine.shapes import LINEAR_SLOP, MAX_POLYGON_VERTICES, POLYGON_RADIUS

TOTAL_RADIUS = 2.0 * POLYGON_RADIUS
CLIP_TOL = 0.1 * LINEAR_SLOP
F32 = jnp.float32

# b2Vec2::Normalize multiplies by a reciprocal (invLength = 1/len;
# x *= invLength) where a straight division rounds differently in f32.
# The flag selects the Box2D operation order for the reference-edge
# tangent -- the one continuous-path rounding difference in this file vs
# b2CollidePolygons (measured A/B: docs/PARITY.md, round 5).  Env var so
# the A/B harness can flip it without a code edit.
import os as _os

B2_RECIP_NORMALIZE = _os.environ.get("GPT_B2_CLIP_ORDER", "0") == "1"

# b2ContactFeature types
_VERTEX = 0
_FACE = 1


def make_id(index_a, index_b, type_a, type_b):
    """Pack a b2ContactID: indexA | indexB<<8 | typeA<<16 | typeB<<24."""
    return (
        index_a.astype(jnp.int32)
        | (index_b.astype(jnp.int32) << 8)
        | (jnp.int32(type_a) << 16)
        | (jnp.int32(type_b) << 24)
    )


def flip_id(cid):
    """Swap the A/B halves of a packed contact id (b2ContactID swap)."""
    index_a = cid & 0xFF
    index_b = (cid >> 8) & 0xFF
    type_a = (cid >> 16) & 0xFF
    type_b = (cid >> 24) & 0xFF
    return index_b | (index_a << 8) | (type_b << 16) | (type_a << 24)


@struct.dataclass
class Manifold:
    """Fixed-shape contact manifold for one fixture pair.

    ``flip`` False => reference face on fixture A (b2Manifold::e_faceA);
    True => reference on B.  ``local_normal`` / ``local_point`` live in the
    reference body frame, ``points`` in the incident body frame, exactly as
    b2Manifold stores them.
    """

    flip: object  # bool []
    local_normal: object  # [2]
    local_point: object  # [2]
    points: object  # [2, 2] incident-local clip points
    ids: object  # [2] int32 (flipped when flip)
    count: object  # int32 in {0, 1, 2}


def _vert_mask(count):
    return jnp.arange(MAX_POLYGON_VERTICES) < count


def _take(rows, idx):
    """rows[idx] for a traced scalar idx WITHOUT a gather op: one-hot masked
    sum over the (tiny, static) leading axis.  XLA gathers serialize per env
    under the batch vmap on TPU and dominated the narrow phase (measured
    ~1-2.4 ms per gather site at 4096 envs)."""
    mask = jnp.arange(rows.shape[0]) == idx
    return (rows * mask[(...,) + (None,) * (rows.ndim - 1)]).sum(axis=0)


def _max_separation(verts1, normals1, count1, p1, q1, verts2, count2, p2, q2):
    """b2FindMaxSeparation: best separating edge of poly1 against poly2.

    Returns (separation, edge_index).  First strict max wins ties, matching
    the C++ scan order.
    """
    q = m2.rot_mul_t(q2, q1)  # poly1 frame -> poly2 frame rotation
    p = m2.rot_vec_t(q2, p1 - p2)

    n = m2.rot_vec(q, normals1)  # [V, 2] poly1 normals in poly2 frame
    v1 = m2.rot_vec(q, verts1) + p  # [V, 2] poly1 verts in poly2 frame

    # s_i = min_j dot(n_i, verts2_j - v1_i).  Written as explicit
    # elementwise broadcasting, NOT a matmul: under the env-batch vmap a
    # [V,V] dot becomes millions of tiny batched MXU matmuls, which
    # dominated the whole step (measured ~16 ms at 4096 envs on v5e).
    d = (
        n[:, 0][:, None] * verts2[:, 0][None, :]
        + n[:, 1][:, None] * verts2[:, 1][None, :]
    )  # [V, V]: dot(n_i, verts2_j)
    d = jnp.where(_vert_mask(count2)[None, :], d, jnp.inf)
    s = d.min(axis=1) - m2.dot(n, v1)
    s = jnp.where(_vert_mask(count1), s, -jnp.inf)
    best = jnp.argmax(s)
    return jnp.max(s), best.astype(jnp.int32)


def _incident_edge(normals1, edge1, q1, verts2, normals2, count2, p2, q2):
    """b2FindIncidentEdge: endpoints (world) and indices of poly2's edge most
    anti-parallel to poly1's reference edge."""
    normal1 = m2.rot_vec_t(q2, m2.rot_vec(q1, _take(normals1, edge1)))  # in poly2 frame
    dots = normals2[:, 0] * normal1[0] + normals2[:, 1] * normal1[1]
    dots = jnp.where(_vert_mask(count2), dots, jnp.inf)
    i1 = jnp.argmin(dots).astype(jnp.int32)
    i2 = jnp.where(i1 + 1 < count2, i1 + 1, 0).astype(jnp.int32)
    w1 = m2.xf_vec(p2, q2, _take(verts2, i1))
    w2 = m2.xf_vec(p2, q2, _take(verts2, i2))
    return w1, w2, i1, i2


def _clip_segment(v, ids, normal, offset, vertex_index_a):
    """b2ClipSegmentToLine on a fixed 2-point segment.

    Returns (v_out [2,2], ids_out [2], two_points bool).  ``two_points`` is
    False whenever fewer than 2 points survive, which kills the manifold
    (b2CollidePolygons returns early on np < 2).
    """
    d0 = m2.dot(normal, v[0]) - offset
    d1 = m2.dot(normal, v[1]) - offset
    keep0 = d0 <= 0.0
    keep1 = d1 <= 0.0

    t = d0 / (d0 - d1)
    vi = v[0] + t[..., None] * (v[1] - v[0])
    id_i = make_id(
        jnp.asarray(vertex_index_a), (ids[0] >> 8) & 0xFF, _VERTEX, _FACE
    )

    out0 = jnp.where(keep0, v[0], v[1])
    ido0 = jnp.where(keep0, ids[0], ids[1])
    both = keep0 & keep1
    out1 = jnp.where(both, v[1], vi)
    ido1 = jnp.where(both, ids[1], id_i)

    two_points = both | (d0 * d1 < 0.0)
    return jnp.stack([out0, out1]), jnp.stack([ido0, ido1]), two_points


def collide_polygons(
    verts_a,
    normals_a,
    count_a,
    pos_a,
    q_a,
    verts_b,
    normals_b,
    count_b,
    pos_b,
    q_b,
):
    """b2CollidePolygons for one fixture pair.  Positions are body *origins*
    (fixture frames), rotations are (cos, sin).  Returns a Manifold."""
    sep_a, edge_a = _max_separation(
        verts_a, normals_a, count_a, pos_a, q_a, verts_b, count_b, pos_b, q_b
    )
    sep_b, edge_b = _max_separation(
        verts_b, normals_b, count_b, pos_b, q_b, verts_a, count_a, pos_a, q_a
    )
    separated = (sep_a > TOTAL_RADIUS) | (sep_b > TOTAL_RADIUS)

    flip = sep_b > sep_a + CLIP_TOL

    # Select reference (1) / incident (2) polygons.
    def sel(a, b):
        return jnp.where(flip, b, a)

    verts1 = jnp.where(flip, verts_b, verts_a)
    normals1 = jnp.where(flip, normals_b, normals_a)
    count1 = sel(count_a, count_b)
    p1 = jnp.where(flip, pos_b, pos_a)
    q1 = jnp.where(flip, q_b, q_a)
    verts2 = jnp.where(flip, verts_a, verts_b)
    count2 = sel(count_b, count_a)
    p2 = jnp.where(flip, pos_a, pos_b)
    q2 = jnp.where(flip, q_a, q_b)
    normals2 = jnp.where(flip, normals_a, normals_b)
    edge1 = sel(edge_a, edge_b)

    iw1, iw2, i1, i2 = _incident_edge(normals1, edge1, q1, verts2, normals2, count2, p2, q2)
    incident = jnp.stack([iw1, iw2])
    inc_ids = jnp.stack(
        [
            make_id(edge1, i1, _FACE, _VERTEX),
            make_id(edge1, i2, _FACE, _VERTEX),
        ]
    )

    iv1 = edge1
    iv2 = jnp.where(edge1 + 1 < count1, edge1 + 1, 0)
    v11 = _take(verts1, iv1)
    v12 = _take(verts1, iv2)
    local_tangent = v12 - v11
    if B2_RECIP_NORMALIZE:
        local_tangent = local_tangent * (1.0 / jnp.linalg.norm(local_tangent))
    else:
        local_tangent = local_tangent / jnp.linalg.norm(local_tangent)
    local_normal = jnp.stack([local_tangent[1], -local_tangent[0]])  # cross(t, 1)
    plane_point = 0.5 * (v11 + v12)

    tangent = m2.rot_vec(q1, local_tangent)
    normal = jnp.stack([tangent[1], -tangent[0]])
    w11 = m2.xf_vec(p1, q1, v11)
    w12 = m2.xf_vec(p1, q1, v12)

    front_offset = m2.dot(normal, w11)
    side_offset1 = -m2.dot(tangent, w11) + TOTAL_RADIUS
    side_offset2 = m2.dot(tangent, w12) + TOTAL_RADIUS

    clip1, ids1, ok1 = _clip_segment(incident, inc_ids, -tangent, side_offset1, iv1)
    clip2, ids2, ok2 = _clip_segment(clip1, ids1, tangent, side_offset2, iv2)

    # Final separation filter with slot compaction (pointCount++ per pass).
    seps = clip2[:, 0] * normal[0] + clip2[:, 1] * normal[1] - front_offset
    keep = seps <= TOTAL_RADIUS
    local_points = m2.xf_vec_t(p2, q2, clip2)  # incident-body local frame
    out_ids = jnp.where(flip, flip_id(ids2), ids2)

    count = keep.sum().astype(jnp.int32)
    # compaction: slot 0 takes the first kept point
    pt0 = jnp.where(keep[0], local_points[0], local_points[1])
    id0 = jnp.where(keep[0], out_ids[0], out_ids[1])
    points = jnp.stack([pt0, local_points[1]])
    ids = jnp.stack([id0, out_ids[1]])

    dead = separated | ~ok1 | ~ok2
    count = jnp.where(dead, 0, count)
    ids = jnp.where((jnp.arange(2) < count), ids, -1)

    return Manifold(
        flip=flip,
        local_normal=local_normal,
        local_point=plane_point,
        points=points,
        ids=ids,
        count=count,
    )


def world_manifold(man: Manifold, pos_a, q_a, pos_b, q_b):
    """b2WorldManifold::Initialize.  Positions are body origins.

    Returns (normal [2] pointing A->B, points [2,2], separations [2]).
    """
    # Reference/incident transforms depend on flip.
    p_ref = jnp.where(man.flip, pos_b, pos_a)
    q_ref = jnp.where(man.flip, q_b, q_a)
    p_inc = jnp.where(man.flip, pos_a, pos_b)
    q_inc = jnp.where(man.flip, q_a, q_b)

    normal = m2.rot_vec(q_ref, man.local_normal)
    plane_point = m2.xf_vec(p_ref, q_ref, man.local_point)
    clip_points = m2.xf_vec(p_inc, q_inc, man.points)  # [2, 2]

    d = m2.dot(clip_points - plane_point, normal)  # [2]
    c_ref = clip_points + (POLYGON_RADIUS - d)[:, None] * normal
    c_inc = clip_points - POLYGON_RADIUS * normal
    points = 0.5 * (c_ref + c_inc)
    separations = m2.dot(c_inc - c_ref, normal)

    # Ensure normal points A -> B.
    normal = jnp.where(man.flip, -normal, normal)
    return normal, points, separations


def position_solver_manifold(man: Manifold, pos_a, q_a, pos_b, q_b, index):
    """b2PositionSolverManifold for manifold point ``index`` at the *current*
    transforms (positions are body origins).  Returns (normal A->B, point,
    separation)."""
    p_ref = jnp.where(man.flip, pos_b, pos_a)
    q_ref = jnp.where(man.flip, q_b, q_a)
    p_inc = jnp.where(man.flip, pos_a, pos_b)
    q_inc = jnp.where(man.flip, q_a, q_b)

    normal = m2.rot_vec(q_ref, man.local_normal)
    plane_point = m2.xf_vec(p_ref, q_ref, man.local_point)
    clip_point = m2.xf_vec(p_inc, q_inc, man.points[index])
    separation = m2.dot(clip_point - plane_point, normal) - TOTAL_RADIUS
    normal = jnp.where(man.flip, -normal, normal)
    return normal, clip_point, separation


def match_impulses(new_ids, old_ids, old_normal, old_tangent):
    """b2Contact::Update impulse matching: carry accumulated impulses across
    steps for manifold points whose contact id persists; zero otherwise."""
    eq = new_ids[:, None] == old_ids[None, :]  # [2_new, 2_old]
    valid = (new_ids[:, None] >= 0) & (old_ids[None, :] >= 0)
    hit = eq & valid
    # first matching old slot, gather-free (2 slots, explicit select)
    first = hit[:, 0]
    second = hit[:, 1] & ~hit[:, 0]
    normal = jnp.where(first, old_normal[0], jnp.where(second, old_normal[1], 0.0))
    tangent = jnp.where(first, old_tangent[0], jnp.where(second, old_tangent[1], 0.0))
    return normal, tangent
