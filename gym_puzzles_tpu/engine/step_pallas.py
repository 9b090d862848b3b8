"""Fused whole-step Pallas TPU kernel: narrow phase -> impulse matching ->
islands/wake -> constraint setup -> contact solve -> sleep, in ONE kernel.

Why: with the solve already VMEM-resident (engine/solver_pallas.py), the
remaining ~0.4 ms/step at 4096 envs is *everything around it* -- SAT+clip
manifolds, contact-id impulse matching, island labeling, velocity-constraint
setup and sleep bookkeeping -- executed as dozens of small XLA fusions that
each stream [P,E]/[B,E] planes through HBM (measured by ablation:
docs/BENCHMARKS.md).  Per env the whole step touches a few hundred floats,
so the fused kernel keeps the entire engine tick VMEM-resident.

Design notes (all mirroring world.step_batched, which remains the oracle):

* Fixture geometry (hull vertices, normals, counts) is static per variant,
  so the narrow-phase loops unroll with *Python-float coefficients*; the
  reference/incident selection after the SAT flip uses per-vertex selects
  between the two static tables, exactly like the padded/masked formulation
  in engine/narrowphase.py (same math, same tie-breaking scan order).
* Contact ids stay in Box2D's packed int32 form; matching needs only
  equality, packing needs int32 shifts/ors (Mosaic handles int32 tiles).
* The solve phase reuses the exact generator functions of
  engine/solver_pallas.py (_warm_start/_run_vel_phase/_integrate/
  _run_pos_phase) in value-carry mode -- one implementation, two kernels.
* No input/output aliasing: the fused kernel reads state planes and writes
  fresh output planes (the aliased form is miscompiled on multi-cell grids,
  see solver_pallas.py).

Reference semantics citations: b2CollidePolygons (narrowphase.py docstring),
b2ContactSolver setup (solver.py:130-219), b2World island/sleep logic
(solver.py:80-128, 513-541); the Python/Box2D behavior being reproduced is
the reference's `world.Step(dt, 180, 60)` (multi_robot_puzzle_00.py:428).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_puzzles_tpu.engine import narrowphase as nph
from gym_puzzles_tpu.engine import solver_pallas as slp
from gym_puzzles_tpu.engine.shapes import LINEAR_SLOP, POLYGON_RADIUS
from gym_puzzles_tpu.engine.solver import (
    ANGULAR_SLEEP_TOL_SQ,
    LINEAR_SLEEP_TOL_SQ,
    MAX_CONDITION_NUMBER,
    TIME_TO_SLEEP,
    VELOCITY_THRESHOLD,
)
from gym_puzzles_tpu.engine.types import Bodies, Contacts, ShapeTable
from gym_puzzles_tpu.engine.world import StepInfo

LANES = 128
TOTAL_RADIUS = nph.TOTAL_RADIUS
CLIP_TOL = nph.CLIP_TOL
BIG = 1e30

# Flip to True (before first use) to run the kernel interpreted (CPU tests).
INTERPRET = False

# Test hook: emit the solve phases as straight-line code instead of
# fori_loops.  At the CPU equivalence tests' reduced iteration counts this
# sidesteps XLA:CPU's quadratic live-range analysis of the ~400-wide rolled
# loop carry (the reason the fused kernel used to be interpret-uncompilable);
# production TPU keeps the rolled loops (smaller program, same speed).
UNROLL = False

# Test hook: ref-state solve phases (value_carry=False), mirroring
# solver_pallas._build_kernel's CPU-testable mode -- solver state lives in
# the OUTPUT planes (+ a DN scratch) instead of the fori_loop carry, so the
# loop carry is empty and XLA:CPU's live-range passes stay linear.  This is
# what makes the fused kernel's NUMERICS runnable (interpret mode) in the
# CI suite; production TPU keeps the value-carry form.
REF_STATE = False

# body f32 input planes (indices into bf_in, stride B)
_B_IN = ("velx", "vely", "om", "posx", "posy", "ang",
         "awake", "sleep", "wake", "fx", "fy", "tq")
B_IN = {n: i for i, n in enumerate(_B_IN)}
# body f32 output planes
_B_OUT = ("velx", "vely", "om", "posx", "posy", "ang", "awake", "sleep")
B_OUT = {n: i for i, n in enumerate(_B_OUT)}
# pair f32 input planes (stride P)
_P_IN = ("flip", "lnx", "lny", "lpx", "lpy",
         "mpx0", "mpy0", "mpx1", "mpy1", "mcnt", "touch",
         "ni0", "ni1", "ti0", "ti1")
P_IN = {n: i for i, n in enumerate(_P_IN)}
# pair f32 output planes
_P_OUT = _P_IN + ("begin", "end")
P_OUT = {n: i for i, n in enumerate(_P_OUT)}
# pair int32 planes: packed contact ids, 2 per pair (p*2 + j)


def _rotq(c, s, x, y):
    """Apply rotation (c, s) to (x, y)."""
    return c * x - s * y, s * x + c * y


def _rotq_t(c, s, x, y):
    """Apply inverse rotation."""
    return c * x + s * y, -s * x + c * y


def _argmax_fold(vals):
    """First-strict-max argmax over a static list of tiles (b2 scan order:
    jnp.argmax keeps the first maximum; a strict > fold does the same)."""
    best = vals[0]
    besti = jnp.zeros_like(vals[0], jnp.int32)
    for i, v in enumerate(vals[1:], 1):
        take = v > best
        best = jnp.where(take, v, best)
        besti = jnp.where(take, jnp.int32(i), besti)
    return best, besti


def _argmin_fold(vals, valid=None):
    """First-strict-min argmin; ``valid[i]`` (static bool) drops entries."""
    idxs = [i for i in range(len(vals)) if valid is None or valid[i]]
    i0 = idxs[0]
    best = vals[i0]
    besti = jnp.full_like(vals[i0], i0, jnp.int32)
    for i in idxs[1:]:
        take = vals[i] < best
        best = jnp.where(take, vals[i], best)
        besti = jnp.where(take, jnp.int32(i), besti)
    return best, besti


def _take_const(rows, idx, count_mask=None):
    """rows[idx] where rows is a static python list and idx an int tile:
    one-hot select between constants (gather-free)."""
    out = None
    for i, r in enumerate(rows):
        m = (idx == i)
        term = jnp.where(m, r, 0.0) if not isinstance(r, (int, float)) else \
            jnp.where(m, float(r), 0.0)
        out = term if out is None else out + term
    return out


def _take_pair(rows_xy, idx):
    """[(x_i, y_i)] static floats, idx tile -> (x, y) tiles."""
    x = _take_const([float(r[0]) for r in rows_xy], idx)
    y = _take_const([float(r[1]) for r in rows_xy], idx)
    return x, y


def _max_separation(verts1, normals1, pos1, q1, verts2, pos2, q2):
    """b2FindMaxSeparation with STATIC polygons (python float vertex lists)
    and tile poses.  pos/q are (x, y) / (c, s) tiles of the body ORIGIN
    transform.  Returns (separation tile, edge-index int tile)."""
    c1, s1 = q1
    c2, s2 = q2
    # q = R2^T R1 (rot_mul_t(q2, q1))
    qc = c1 * c2 + s1 * s2
    qs = s1 * c2 - c1 * s2
    dxw = pos1[0] - pos2[0]
    dyw = pos1[1] - pos2[1]
    px, py = _rotq_t(c2, s2, dxw, dyw)

    seps = []
    for (nx_c, ny_c), (vx_c, vy_c) in zip(normals1, verts1):
        nx, ny = _rotq(qc, qs, float(nx_c), float(ny_c))
        v1x, v1y = _rotq(qc, qs, float(vx_c), float(vy_c))
        v1x = v1x + px
        v1y = v1y + py
        d = None
        for wx, wy in verts2:
            dij = nx * float(wx) + ny * float(wy)
            d = dij if d is None else jnp.minimum(d, dij)
        seps.append(d - (nx * v1x + ny * v1y))
    return _argmax_fold(seps)


def _collide_pair(spec, pa, qa, pb, qb):
    """b2CollidePolygons for one pair with static fixture tables.

    ``spec``: dict with va/na (list of (x,y) floats, len Va), vb/nb (len Vb).
    ``pa``/``qa``: origin (x, y) and rot (c, s) tiles of body A; same for B.
    Returns a dict of manifold tiles: flip (f32 0/1), lnx, lny, lpx, lpy,
    mp[2] points (incident-local), id0, id1 (int32), cnt (int32).
    """
    f32 = jnp.float32
    va, na = spec["va"], spec["na"]
    vb, nb = spec["vb"], spec["nb"]
    Va, Vb = len(va), len(vb)
    V = max(Va, Vb)

    sep_a, edge_a = _max_separation(va, na, pa, qa, vb, pb, qb)
    sep_b, edge_b = _max_separation(vb, nb, pb, qb, va, pa, qa)
    separated = (sep_a > TOTAL_RADIUS) | (sep_b > TOTAL_RADIUS)
    flip = sep_b > sep_a + CLIP_TOL
    flip_f = flip.astype(f32)

    # --- reference(1)/incident(2) tables: per-vertex selects between the two
    # static tables, padded to V with the last vertex (matches the padded
    # formulation in narrowphase.py; padded slots are masked below).
    def pad(lst, n):
        return lst + [lst[-1]] * (n - len(lst))

    va_p, na_p = pad(va, V), pad(na, V)
    vb_p, nb_p = pad(vb, V), pad(nb, V)

    count1 = jnp.where(flip, jnp.int32(Vb), jnp.int32(Va))
    count2 = jnp.where(flip, jnp.int32(Va), jnp.int32(Vb))
    p1 = (jnp.where(flip, pb[0], pa[0]), jnp.where(flip, pb[1], pa[1]))
    q1 = (jnp.where(flip, qb[0], qa[0]), jnp.where(flip, qb[1], qa[1]))
    p2 = (jnp.where(flip, pa[0], pb[0]), jnp.where(flip, pa[1], pb[1]))
    q2 = (jnp.where(flip, qa[0], qb[0]), jnp.where(flip, qa[1], qb[1]))
    edge1 = jnp.where(flip, edge_b, edge_a)

    # --- incident edge (b2FindIncidentEdge) ---------------------------------
    # reference edge's local normal, selected from the two static tables
    ln1x_a = _take_const([float(n[0]) for n in na_p], edge1)
    ln1y_a = _take_const([float(n[1]) for n in na_p], edge1)
    ln1x_b = _take_const([float(n[0]) for n in nb_p], edge1)
    ln1y_b = _take_const([float(n[1]) for n in nb_p], edge1)
    ln1x = jnp.where(flip, ln1x_b, ln1x_a)
    ln1y = jnp.where(flip, ln1y_b, ln1y_a)
    w1x, w1y = _rotq(q1[0], q1[1], ln1x, ln1y)      # world
    n1x, n1y = _rotq_t(q2[0], q2[1], w1x, w1y)      # poly2 frame

    # normals2: incident polygon's normals = select(flip, A-table, B-table)
    dots = []
    for v in range(V):
        n2x = jnp.where(flip, float(na_p[v][0]), float(nb_p[v][0]))
        n2y = jnp.where(flip, float(na_p[v][1]), float(nb_p[v][1]))
        d = n2x * n1x + n2y * n1y
        # mask padded slots of the incident polygon
        d = jnp.where(jnp.int32(v) < count2, d, BIG)
        dots.append(d)
    _, i1 = _argmin_fold(dots)
    i2 = jnp.where(i1 + 1 < count2, i1 + 1, 0).astype(jnp.int32)

    def vert2(idx):
        vx = jnp.where(flip,
                       _take_const([float(v[0]) for v in va_p], idx),
                       _take_const([float(v[0]) for v in vb_p], idx))
        vy = jnp.where(flip,
                       _take_const([float(v[1]) for v in va_p], idx),
                       _take_const([float(v[1]) for v in vb_p], idx))
        return vx, vy

    i1vx, i1vy = vert2(i1)
    i2vx, i2vy = vert2(i2)
    iw1x, iw1y = _rotq(q2[0], q2[1], i1vx, i1vy)
    iw1x, iw1y = iw1x + p2[0], iw1y + p2[1]
    iw2x, iw2y = _rotq(q2[0], q2[1], i2vx, i2vy)
    iw2x, iw2y = iw2x + p2[0], iw2y + p2[1]

    # incident clip ids: make_id(edge1, i, FACE, VERTEX)
    def mkid(ia_t, ib_t, ta, tb):
        return (ia_t.astype(jnp.int32)
                | (ib_t.astype(jnp.int32) << 8)
                | (jnp.int32(ta) << 16)
                | (jnp.int32(tb) << 24))

    id_inc1 = mkid(edge1, i1, nph._FACE, nph._VERTEX)
    id_inc2 = mkid(edge1, i2, nph._FACE, nph._VERTEX)

    # --- reference edge geometry -------------------------------------------
    iv1 = edge1
    iv2 = jnp.where(edge1 + 1 < count1, edge1 + 1, 0).astype(jnp.int32)

    def vert1(idx):
        vx = jnp.where(flip,
                       _take_const([float(v[0]) for v in vb_p], idx),
                       _take_const([float(v[0]) for v in va_p], idx))
        vy = jnp.where(flip,
                       _take_const([float(v[1]) for v in vb_p], idx),
                       _take_const([float(v[1]) for v in va_p], idx))
        return vx, vy

    v11x, v11y = vert1(iv1)
    v12x, v12y = vert1(iv2)
    ltx = v12x - v11x
    lty = v12y - v11y
    norm = jnp.sqrt(ltx * ltx + lty * lty)
    ltx = ltx / norm
    lty = lty / norm
    lnx = lty
    lny = -ltx
    lpx = 0.5 * (v11x + v12x)
    lpy = 0.5 * (v11y + v12y)

    tx, ty = _rotq(q1[0], q1[1], ltx, lty)          # world tangent
    nx, ny = ty, -tx                                # world normal
    w11x, w11y = _rotq(q1[0], q1[1], v11x, v11y)
    w11x, w11y = w11x + p1[0], w11y + p1[1]
    w12x, w12y = _rotq(q1[0], q1[1], v12x, v12y)
    w12x, w12y = w12x + p1[0], w12y + p1[1]

    front_offset = nx * w11x + ny * w11y
    side_offset1 = -(tx * w11x + ty * w11y) + TOTAL_RADIUS
    side_offset2 = (tx * w12x + ty * w12y) + TOTAL_RADIUS

    # --- two clip passes (b2ClipSegmentToLine) ------------------------------
    def clip(v0x, v0y, v1x, v1y, id0, id1, cnx, cny, off, vertex_index_a):
        d0 = cnx * v0x + cny * v0y - off
        d1 = cnx * v1x + cny * v1y - off
        keep0 = d0 <= 0.0
        keep1 = d1 <= 0.0
        t = d0 / (d0 - d1)
        vix = v0x + t * (v1x - v0x)
        viy = v0y + t * (v1y - v0y)
        id_i = mkid(vertex_index_a, (id0 >> 8) & 0xFF, nph._VERTEX, nph._FACE)
        o0x = jnp.where(keep0, v0x, v1x)
        o0y = jnp.where(keep0, v0y, v1y)
        oid0 = jnp.where(keep0, id0, id1)
        both = keep0 & keep1
        o1x = jnp.where(both, v1x, vix)
        o1y = jnp.where(both, v1y, viy)
        oid1 = jnp.where(both, id1, id_i)
        two = both | (d0 * d1 < 0.0)
        return o0x, o0y, o1x, o1y, oid0, oid1, two

    c0x, c0y, c1x, c1y, cid0, cid1, ok1 = clip(
        iw1x, iw1y, iw2x, iw2y, id_inc1, id_inc2, -tx, -ty, side_offset1, iv1)
    c0x, c0y, c1x, c1y, cid0, cid1, ok2 = clip(
        c0x, c0y, c1x, c1y, cid0, cid1, tx, ty, side_offset2, iv2)

    # --- final separation filter + slot compaction --------------------------
    sep0 = c0x * nx + c0y * ny - front_offset
    sep1 = c1x * nx + c1y * ny - front_offset
    keep0 = sep0 <= TOTAL_RADIUS
    keep1 = sep1 <= TOTAL_RADIUS
    # incident-body local frame points
    l0x, l0y = _rotq_t(q2[0], q2[1], c0x - p2[0], c0y - p2[1])
    l1x, l1y = _rotq_t(q2[0], q2[1], c1x - p2[0], c1y - p2[1])

    def flipid(cid):
        index_a = cid & 0xFF
        index_b = (cid >> 8) & 0xFF
        type_a = (cid >> 16) & 0xFF
        type_b = (cid >> 24) & 0xFF
        return index_b | (index_a << 8) | (type_b << 16) | (type_a << 24)

    oid0 = jnp.where(flip, flipid(cid0), cid0)
    oid1 = jnp.where(flip, flipid(cid1), cid1)

    count = keep0.astype(jnp.int32) + keep1.astype(jnp.int32)
    pt0x = jnp.where(keep0, l0x, l1x)
    pt0y = jnp.where(keep0, l0y, l1y)
    id0 = jnp.where(keep0, oid0, oid1)
    pt1x, pt1y, id1 = l1x, l1y, oid1

    dead = separated | ~ok1 | ~ok2
    count = jnp.where(dead, 0, count)
    id0 = jnp.where(count > 0, id0, -1)
    id1 = jnp.where(count > 1, id1, -1)
    # sanitize dead/padded slots (collide_all does the same)
    alive0 = (count > 0).astype(f32)
    alive1 = (count > 1).astype(f32)
    return dict(
        flip=flip_f,
        lnx=lnx, lny=lny, lpx=lpx, lpy=lpy,
        mpx=[pt0x * alive0, pt1x * alive1],
        mpy=[pt0y * alive0, pt1y * alive1],
        ids=[id0, id1],
        cnt=count,
    )

def _pair_specs(table: ShapeTable):
    """Static per-pair fixture geometry as python float lists."""
    specs = []
    for p in range(table.num_pairs):
        fa = int(table.pair_fix_a[p])
        fb = int(table.pair_fix_b[p])
        ca = int(table.fix_count[fa])
        cb = int(table.fix_count[fb])
        specs.append(dict(
            va=[(float(x), float(y)) for x, y in table.fix_verts[fa][:ca]],
            na=[(float(x), float(y)) for x, y in table.fix_normals[fa][:ca]],
            vb=[(float(x), float(y)) for x, y in table.fix_verts[fb][:cb]],
            nb=[(float(x), float(y)) for x, y in table.fix_normals[fb][:cb]],
        ))
    return specs


def _setup_pair(ctx, p, man, pose, com, vel, active_f):
    """b2ContactSolver::InitializeVelocityConstraints +
    b2WorldManifold::Initialize for one pair, on manifold/pose tiles.

    ``man``: dict from the manifold select (flip f32, lnx.., mpx[2].., cnt
    int32).  ``pose``: per-body (ox, oy, qc, qs) origin transforms.
    ``com``: per-body world COM (px, py).  ``vel``: per-body (vx, vy, om)
    for dynamic bodies.  ``active_f``: per-body f32 awake-dynamic flags.

    Returns a pair-constants dict with the same keys `_mk_pair_consts`
    produces, so the shared solve generators consume it directly.
    """
    f32 = jnp.float32
    ia, ib = ctx.ia_l[p], ctx.ib_l[p]
    dyn = ctx.dyn
    flip = man["flip"]

    oxa, oya, qca, qsa = pose[ia]
    oxb, oyb, qcb, qsb = pose[ib]
    # reference / incident transforms by flip
    prx = flip * oxb + (1.0 - flip) * oxa
    pry = flip * oyb + (1.0 - flip) * oya
    qrc = flip * qcb + (1.0 - flip) * qca
    qrs = flip * qsb + (1.0 - flip) * qsa
    pix = flip * oxa + (1.0 - flip) * oxb
    piy = flip * oya + (1.0 - flip) * oyb
    qic = flip * qca + (1.0 - flip) * qcb
    qis = flip * qsa + (1.0 - flip) * qsb

    # world normal from the reference frame
    nrx, nry = _rotq(qrc, qrs, man["lnx"], man["lny"])
    ppx, ppy = _rotq(qrc, qrs, man["lpx"], man["lpy"])
    ppx, ppy = ppx + prx, ppy + pry

    # world manifold points + A->B normal
    nx = jnp.where(flip > 0.5, -nrx, nrx)
    ny = jnp.where(flip > 0.5, -nry, nry)
    tx, ty = ny, -nx

    cax, cay = com[ia]
    cbx, cby = com[ib]
    m_sum = ctx.inv_m[ia] + ctx.inv_m[ib]
    rest = ctx.rest[p]

    rax, ray, rbx, rby = [], [], [], []
    nmass, tmass, bias = [], [], []
    kns = []
    rnas, rnbs = [], []
    for j in range(2):
        cpx, cpy = _rotq(qic, qis, man["mpx"][j], man["mpy"][j])
        cpx, cpy = cpx + pix, cpy + piy
        d = (cpx - ppx) * nrx + (cpy - ppy) * nry
        crx = cpx + (POLYGON_RADIUS - d) * nrx
        cry = cpy + (POLYGON_RADIUS - d) * nry
        cix = cpx - POLYGON_RADIUS * nrx
        ciy = cpy - POLYGON_RADIUS * nry
        wx = 0.5 * (crx + cix)
        wy = 0.5 * (cry + ciy)

        r_ax = wx - cax
        r_ay = wy - cay
        r_bx = wx - cbx
        r_by = wy - cby
        rax.append(r_ax)
        ray.append(r_ay)
        rbx.append(r_bx)
        rby.append(r_by)

        rn_a = r_ax * ny - r_ay * nx
        rn_b = r_bx * ny - r_by * nx
        rnas.append(rn_a)
        rnbs.append(rn_b)
        k_n = m_sum + ctx.inv_i[ia] * rn_a * rn_a + ctx.inv_i[ib] * rn_b * rn_b
        kns.append(k_n)
        nmass.append(jnp.where(k_n > 0.0, 1.0 / k_n, 0.0))

        rt_a = r_ax * ty - r_ay * tx
        rt_b = r_bx * ty - r_by * tx
        k_t = m_sum + ctx.inv_i[ia] * rt_a * rt_a + ctx.inv_i[ib] * rt_b * rt_b
        tmass.append(jnp.where(k_t > 0.0, 1.0 / k_t, 0.0))

        # relative normal velocity for restitution bias (static side = 0)
        dvx, dvy = 0.0, 0.0
        if dyn[ib]:
            dvx = vel["vx"][ib] - vel["om"][ib] * r_by
            dvy = vel["vy"][ib] + vel["om"][ib] * r_bx
        if dyn[ia]:
            dvx = dvx - vel["vx"][ia] + vel["om"][ia] * r_ay
            dvy = dvy - vel["vy"][ia] - vel["om"][ia] * r_ax
        v_rel = dvx * nx + dvy * ny
        bias.append(jnp.where(v_rel < -VELOCITY_THRESHOLD, -rest * v_rel, 0.0))

    k11, k22 = kns[0], kns[1]
    k12 = m_sum + ctx.inv_i[ia] * rnas[0] * rnas[1] + ctx.inv_i[ib] * rnbs[0] * rnbs[1]
    det = k11 * k22 - k12 * k12
    cond_ok = k11 * k11 < MAX_CONDITION_NUMBER * det
    mcnt = man["cnt"]
    vcount = jnp.where((mcnt == 2) & ~cond_ok, jnp.int32(1), mcnt)
    inv_det = jnp.where(det != 0.0, 1.0 / det, 0.0)

    act_a = active_f[ia] if dyn[ia] else 0.0
    act_b = active_f[ib] if dyn[ib] else 0.0
    solve = ((mcnt > 0).astype(f32)
             * jnp.minimum(act_a + act_b, 1.0))
    cnt = vcount.astype(f32) * solve

    return dict(
        nx=nx, ny=ny, tx=tx, ty=ty, solve=solve, cnt=cnt,
        act=[(cnt > 0).astype(f32), (cnt > 1).astype(f32)],
        use_blk=(cnt == 2).astype(f32), one_act=(cnt == 1).astype(f32),
        k11=k11, k12=k12, k22=k22,
        im11=inv_det * k22, im12=-inv_det * k12, im22=inv_det * k11,
        flip=flip, sign=1.0 - 2.0 * flip,
        lnx=man["lnx"], lny=man["lny"],
        lpx=man["lpx"], lpy=man["lpy"],
        link=None,  # filled by the kernel for dynamic-dynamic pairs
        mcnt=mcnt.astype(f32),
        bias=bias,
        nmass=nmass,
        tmass=tmass,
        rax=rax, ray=ray, rbx=rbx, rby=rby,
        mpx=man["mpx"], mpy=man["mpy"],
    )


class _ImpRow:
    """Ref view mapping the solver's impulse index ``p*2+j`` onto the
    per-point output planes (ni0/ni1 or ti0/ti1)."""

    def __init__(self, ref, plane0, plane1, P):
        self.ref, self.p0, self.p1, self.P = ref, plane0, plane1, P

    def __getitem__(self, i):
        p, j = divmod(i, 2)
        return self.ref[(self.p1 if j else self.p0) * self.P + p]

    def __setitem__(self, i, v):
        p, j = divmod(i, 2)
        self.ref[(self.p1 if j else self.p0) * self.P + p] = v


class _DynSlots:
    """Ref view over a [n_dyn, ...] scratch, indexed by raw body id."""

    def __init__(self, ref, dyn_bodies):
        self.ref = ref
        self.slot = {b: i for i, b in enumerate(dyn_bodies)}

    def __getitem__(self, b):
        return self.ref[self.slot[b]]

    def __setitem__(self, b, v):
        self.ref[self.slot[b]] = v


def _build_fused_kernel(table: ShapeTable, dt: float, vel_iters: int,
                        pos_iters: int, value_carry: bool = True):
    """Whole-tick kernel.  ``value_carry=True`` is the TPU throughput form
    (solver state in the fori_loop carry); ``value_carry=False`` keeps the
    solver state in the output planes + a DN scratch ref, which is what the
    CPU interpret equivalence tests compile (see REF_STATE)."""
    ctx = slp._Ctx(table)
    P, B = ctx.P, ctx.B
    dyn = ctx.dyn
    dyn_bodies = ctx.dyn_bodies
    specs = _pair_specs(table)
    lcx, lcy = ctx.lcx, ctx.lcy
    lin_k = [float(np.clip(1.0 - dt * d, 0.0, 1.0)) for d in table.linear_damping]
    ang_k = [float(np.clip(1.0 - dt * d, 0.0, 1.0)) for d in table.angular_damping]
    both_dyn = [dyn[ctx.ia_l[p]] and dyn[ctx.ib_l[p]] for p in range(P)]

    def kernel(bf_ref, pf_ref, pi_ref, bfo_ref, pfo_ref, pio_ref, *scratch):
        dn_ref = scratch[0] if scratch else None
        f32 = jnp.float32

        def bi(name, b):
            return bf_ref[B_IN[name] * B + b]

        def pin(name, p):
            return pf_ref[P_IN[name] * P + p]

        # ---- read state --------------------------------------------------
        px = {b: bi("posx", b) for b in range(B)}
        py = {b: bi("posy", b) for b in range(B)}
        an = {b: bi("ang", b) for b in range(B)}
        vx0 = {b: bi("velx", b) for b in dyn_bodies}
        vy0 = {b: bi("vely", b) for b in dyn_bodies}
        om0 = {b: bi("om", b) for b in dyn_bodies}
        awake0 = {b: bi("awake", b) for b in dyn_bodies}
        sleep0 = {b: bi("sleep", b) for b in dyn_bodies}
        wake = {b: bi("wake", b) for b in dyn_bodies}
        fx = {b: bi("fx", b) for b in dyn_bodies}
        fy = {b: bi("fy", b) for b in dyn_bodies}
        tq = {b: bi("tq", b) for b in dyn_bodies}

        # ---- control wake (awake |= wake; woken timers reset) ------------
        awake1 = {b: jnp.maximum(awake0[b], wake[b]) for b in dyn_bodies}
        sleep1 = {
            b: jnp.where((wake[b] > 0.5) & (awake0[b] < 0.5), 0.0, sleep0[b])
            for b in dyn_bodies
        }

        # ---- body transforms (origins) -----------------------------------
        pose = {}
        com = {}
        for b in range(B):
            qc, qs = jnp.cos(an[b]), jnp.sin(an[b])
            if lcx[b] == 0.0 and lcy[b] == 0.0:
                ox, oy = px[b], py[b]
            else:
                ox = px[b] - (qc * lcx[b] - qs * lcy[b])
                oy = py[b] - (qs * lcx[b] + qc * lcy[b])
            pose[b] = (ox, oy, qc, qs)
            com[b] = (px[b], py[b])

        # ---- narrow phase + manifold select -------------------------------
        man = []
        touching = []
        begin = []
        end = []
        for p in range(P):
            ia, ib = ctx.ia_l[p], ctx.ib_l[p]
            new = _collide_pair(
                specs[p],
                pose[ia][:2], pose[ia][2:],
                pose[ib][:2], pose[ib][2:],
            )
            # contacts update when either endpoint is awake; static bodies
            # count as awake_eff (world.step_batched:265-266)
            if not dyn[ia] or not dyn[ib]:
                upd = None  # statically always updated
                updf = 1.0
            else:
                upd = (awake1[ia] > 0.5) | (awake1[ib] > 0.5)
                updf = upd.astype(f32)

            def sel(nv, ov):
                return nv if upd is None else jnp.where(upd, nv, ov)

            old_touch = pin("touch", p)
            m = dict(
                flip=sel(new["flip"], pin("flip", p)),
                lnx=sel(new["lnx"], pin("lnx", p)),
                lny=sel(new["lny"], pin("lny", p)),
                lpx=sel(new["lpx"], pin("lpx", p)),
                lpy=sel(new["lpy"], pin("lpy", p)),
                mpx=[sel(new["mpx"][0], pin("mpx0", p)),
                     sel(new["mpx"][1], pin("mpx1", p))],
                mpy=[sel(new["mpy"][0], pin("mpy0", p)),
                     sel(new["mpy"][1], pin("mpy1", p))],
                ids=[sel(new["ids"][0], pi_ref[p * 2 + 0]),
                     sel(new["ids"][1], pi_ref[p * 2 + 1])],
                cnt=sel(new["cnt"], pin("mcnt", p).astype(jnp.int32)),
                new_ids=new["ids"],
            )
            tch = sel((new["cnt"] > 0).astype(f32), old_touch)
            man.append(m)
            touching.append(tch)
            begin.append(updf * tch * (1.0 - old_touch))
            end.append(updf * (1.0 - tch) * old_touch)

        # ---- impulse matching (b2Contact::Update) -------------------------
        N0 = [None] * (P * 2)
        T0 = [None] * (P * 2)
        for p in range(P):
            ia, ib = ctx.ia_l[p], ctx.ib_l[p]
            old_ids = [pi_ref[p * 2 + 0], pi_ref[p * 2 + 1]]
            old_n = [pin("ni0", p), pin("ni1", p)]
            old_t = [pin("ti0", p), pin("ti1", p)]
            if not dyn[ia] or not dyn[ib]:
                updf = None
            else:
                updf = ((awake1[ia] > 0.5) | (awake1[ib] > 0.5))
            for j in range(2):
                nid = man[p]["new_ids"][j]
                hit0 = (nid == old_ids[0]) & (nid >= 0) & (old_ids[0] >= 0)
                hit1 = (nid == old_ids[1]) & (nid >= 0) & (old_ids[1] >= 0)
                mn = jnp.where(hit0, old_n[0], jnp.where(hit1 & ~hit0, old_n[1], 0.0))
                mt = jnp.where(hit0, old_t[0], jnp.where(hit1 & ~hit0, old_t[1], 0.0))
                if updf is not None:
                    mn = jnp.where(updf, mn, old_n[j])
                    mt = jnp.where(updf, mt, old_t[j])
                N0[p * 2 + j] = mn
                T0[p * 2 + j] = mt

        # ---- islands: min-label propagation over touching dd links --------
        labels = {b: jnp.full_like(man[0]["cnt"], b) for b in dyn_bodies}
        for _ in range(max(1, ctx.n_dyn)):
            for p in ctx.dd_pairs:
                ia, ib = ctx.ia_l[p], ctx.ib_l[p]
                lnk = touching[p] > 0.5
                m = jnp.minimum(labels[ia], labels[ib])
                labels[ia] = jnp.where(lnk, m, labels[ia])
                labels[ib] = jnp.where(lnk, m, labels[ib])

        # ---- wake propagation (whole island wakes, timers reset) ----------
        awake2 = {}
        sleep2 = {}
        for b in dyn_bodies:
            any_awake = None
            for b2 in dyn_bodies:
                t = (labels[b2] == labels[b]) & (awake1[b2] > 0.5)
                any_awake = t if any_awake is None else (any_awake | t)
            aw = any_awake.astype(f32)
            woke = (aw > 0.5) & (awake1[b] < 0.5)
            awake2[b] = aw
            sleep2[b] = jnp.where(woke, 0.0, sleep1[b])
        active_f = {b: awake2[b] for b in dyn_bodies}

        # ---- velocity integration + damping (awake dynamic only) ----------
        vel = dict(vx={}, vy={}, om={})
        for b in dyn_bodies:
            act = active_f[b] > 0.5
            vi_x = (vx0[b] + dt * ctx.inv_m[b] * fx[b]) * lin_k[b]
            vi_y = (vy0[b] + dt * ctx.inv_m[b] * fy[b]) * lin_k[b]
            wi = (om0[b] + dt * ctx.inv_i[b] * tq[b]) * ang_k[b]
            vel["vx"][b] = jnp.where(act, vi_x, vx0[b])
            vel["vy"][b] = jnp.where(act, vi_y, vy0[b])
            vel["om"][b] = jnp.where(act, wi, om0[b])

        # ---- constraint setup ---------------------------------------------
        C = []
        for p in range(P):
            c = _setup_pair(ctx, p, man[p], pose, com, vel, active_f)
            if both_dyn[p]:
                c["link"] = touching[p]
            C.append(c)

        # ---- solve (shared generators) --------------------------------------
        if value_carry:
            V = vel
            N = list(N0)
            T = list(T0)
        else:
            # ref-state: velocities live in the vel output planes, impulses
            # in the ni/ti output planes -- empty loop carries (see REF_STATE)
            V = dict(vx=slp._Row(bfo_ref, B_OUT["velx"] * B),
                     vy=slp._Row(bfo_ref, B_OUT["vely"] * B),
                     om=slp._Row(bfo_ref, B_OUT["om"] * B))
            for b in dyn_bodies:
                V["vx"][b] = vel["vx"][b]
                V["vy"][b] = vel["vy"][b]
                V["om"][b] = vel["om"][b]
            N = _ImpRow(pfo_ref, P_OUT["ni0"], P_OUT["ni1"], P)
            T = _ImpRow(pfo_ref, P_OUT["ti0"], P_OUT["ti1"], P)
            for p in range(P):
                for j in range(2):
                    N[p * 2 + j] = N0[p * 2 + j]
                    T[p * 2 + j] = T0[p * 2 + j]
        slp._warm_start(ctx, C, V, N, T)
        V, N, T = slp._run_vel_phase(ctx, C, lambda: C, V, N, T, vel_iters,
                                     value_carry, unroll=UNROLL)

        # ---- integrate positions -------------------------------------------
        if value_carry:
            PX, PY, AN = {}, {}, {}
            vfin = dict(vx={}, vy={}, om={})

            def store_vel(b, vx_, vy_, w_):
                vfin["vx"][b] = vx_
                vfin["vy"][b] = vy_
                vfin["om"][b] = w_
        else:
            PX = slp._Row(bfo_ref, B_OUT["posx"] * B)
            PY = slp._Row(bfo_ref, B_OUT["posy"] * B)
            AN = slp._Row(bfo_ref, B_OUT["ang"] * B)
            vfin = V

            def store_vel(b, vx_, vy_, w_):
                V["vx"][b] = vx_
                V["vy"][b] = vy_
                V["om"][b] = w_

        def pos_get(b):
            return px[b], py[b], an[b]

        slp._integrate(ctx, V, PX, PY, AN, lambda b: active_f[b], pos_get,
                       store_vel, dt)

        # ---- position iterations --------------------------------------------
        ST = slp._static_transforms(ctx, pos_get)
        zero = lambda: jnp.zeros_like(px[0])
        if value_carry:
            DN0 = None
        else:
            DN0 = _DynSlots(dn_ref, dyn_bodies)
            for b in dyn_bodies:
                DN0[b] = zero()
        PX, PY, AN, DN = slp._run_pos_phase(
            ctx, C, lambda: C, ST, PX, PY, AN, DN0, pos_iters, value_carry,
            zero, unroll=UNROLL,
        )

        # ---- sleep bookkeeping (b2Island::Solve tail) -----------------------
        awake3 = {}
        sleep3 = {}
        for b in dyn_bodies:
            act = active_f[b] > 0.5
            v2 = vfin["vx"][b] ** 2 + vfin["vy"][b] ** 2
            fast = (v2 > LINEAR_SLEEP_TOL_SQ) | (vfin["om"][b] ** 2 > ANGULAR_SLEEP_TOL_SQ)
            sleep3[b] = jnp.where(act, jnp.where(fast, 0.0, sleep2[b] + dt), sleep2[b])
        for b in dyn_bodies:
            act = active_f[b] > 0.5
            bim = None
            for b2 in dyn_bodies:
                v = jnp.where(
                    (labels[b2] == labels[b]) & (active_f[b2] > 0.5),
                    sleep3[b2], BIG,
                )
                bim = v if bim is None else jnp.minimum(bim, v)
            psv = None
            for b2 in dyn_bodies:
                t = jnp.where(labels[b] == b2, DN[b2], 0.0)
                psv = t if psv is None else psv + t
            gts = (bim >= TIME_TO_SLEEP) & (psv > 0.5) & act
            awake3[b] = jnp.where(gts, 0.0, awake2[b])
            vfin["vx"][b] = jnp.where(gts, 0.0, vfin["vx"][b])
            vfin["vy"][b] = jnp.where(gts, 0.0, vfin["vy"][b])
            vfin["om"][b] = jnp.where(gts, 0.0, vfin["om"][b])
            sleep3[b] = jnp.where(gts, 0.0, sleep3[b])

        # ---- write outputs ---------------------------------------------------
        for b in range(B):
            if dyn[b]:
                bfo_ref[B_OUT["velx"] * B + b] = vfin["vx"][b]
                bfo_ref[B_OUT["vely"] * B + b] = vfin["vy"][b]
                bfo_ref[B_OUT["om"] * B + b] = vfin["om"][b]
                bfo_ref[B_OUT["posx"] * B + b] = PX[b]
                bfo_ref[B_OUT["posy"] * B + b] = PY[b]
                bfo_ref[B_OUT["ang"] * B + b] = AN[b]
                bfo_ref[B_OUT["awake"] * B + b] = awake3[b]
                bfo_ref[B_OUT["sleep"] * B + b] = sleep3[b]
            else:
                bfo_ref[B_OUT["velx"] * B + b] = bi("velx", b)
                bfo_ref[B_OUT["vely"] * B + b] = bi("vely", b)
                bfo_ref[B_OUT["om"] * B + b] = bi("om", b)
                bfo_ref[B_OUT["posx"] * B + b] = px[b]
                bfo_ref[B_OUT["posy"] * B + b] = py[b]
                bfo_ref[B_OUT["ang"] * B + b] = an[b]
                # islands never include statics: propagate_wake returns
                # new_awake & ~is_static (solver.py:124)
                bfo_ref[B_OUT["awake"] * B + b] = jnp.zeros_like(px[b])
                bfo_ref[B_OUT["sleep"] * B + b] = bi("sleep", b)

        for p in range(P):
            c = C[p]
            m = man[p]
            pfo_ref[P_OUT["flip"] * P + p] = m["flip"]
            pfo_ref[P_OUT["lnx"] * P + p] = m["lnx"]
            pfo_ref[P_OUT["lny"] * P + p] = m["lny"]
            pfo_ref[P_OUT["lpx"] * P + p] = m["lpx"]
            pfo_ref[P_OUT["lpy"] * P + p] = m["lpy"]
            pfo_ref[P_OUT["mpx0"] * P + p] = m["mpx"][0]
            pfo_ref[P_OUT["mpy0"] * P + p] = m["mpy"][0]
            pfo_ref[P_OUT["mpx1"] * P + p] = m["mpx"][1]
            pfo_ref[P_OUT["mpy1"] * P + p] = m["mpy"][1]
            pfo_ref[P_OUT["mcnt"] * P + p] = m["cnt"].astype(f32)
            pfo_ref[P_OUT["touch"] * P + p] = touching[p]
            pfo_ref[P_OUT["begin"] * P + p] = begin[p]
            pfo_ref[P_OUT["end"] * P + p] = end[p]
            pio_ref[p * 2 + 0] = m["ids"][0]
            pio_ref[p * 2 + 1] = m["ids"][1]
            # store impulses for live solved slots, carry matched otherwise
            # (world.step_batched:318-321)
            for j, (ni_name, ti_name) in enumerate((("ni0", "ti0"), ("ni1", "ti1"))):
                live = c["act"][j]  # solve * (j < vc.count) as f32
                pfo_ref[P_OUT[ni_name] * P + p] = (
                    live * N[p * 2 + j] + (1.0 - live) * N0[p * 2 + j])
                pfo_ref[P_OUT[ti_name] * P + p] = (
                    live * T[p * 2 + j] + (1.0 - live) * T0[p * 2 + j])

    return kernel

def _tile(x, S):
    return x.reshape(x.shape[:-1] + (S, LANES))


def _untile(x):
    return x.reshape(x.shape[:-2] + (x.shape[-2] * LANES,))


@functools.partial(
    jax.jit, static_argnames=("table", "dt", "vel_iters", "pos_iters")
)
def step_fused(table: ShapeTable, bodies: Bodies, contacts: Contacts,
               force, torque, wake, dt, vel_iters, pos_iters):
    """Batched engine tick, entire pipeline in one Pallas kernel.

    Same contract as world.step_batched: all leaves carry the env batch on
    the LAST axis; returns (Bodies, Contacts, StepInfo).
    """
    P = table.num_pairs
    B = table.num_bodies
    E = bodies.omega.shape[-1]
    assert E % LANES == 0, f"env batch {E} must be a multiple of {LANES}"
    S = E // LANES
    f32 = lambda x: x.astype(jnp.float32)

    man = contacts.man
    bf = jnp.concatenate([
        bodies.vel[:, 0], bodies.vel[:, 1], bodies.omega,
        bodies.pos[:, 0], bodies.pos[:, 1], bodies.angle,
        f32(bodies.awake), bodies.sleep_time, f32(wake),
        force[:, 0], force[:, 1], torque,
    ])  # [12B, E]
    pf = jnp.concatenate([
        f32(man.flip), man.local_normal[:, 0], man.local_normal[:, 1],
        man.local_point[:, 0], man.local_point[:, 1],
        man.points[:, 0, 0], man.points[:, 0, 1],
        man.points[:, 1, 0], man.points[:, 1, 1],
        f32(man.count), f32(contacts.touching),
        contacts.normal_impulse[:, 0], contacts.normal_impulse[:, 1],
        contacts.tangent_impulse[:, 0], contacts.tangent_impulse[:, 1],
    ])  # [15P, E]
    pi = man.ids.reshape(P * 2, E).astype(jnp.int32)  # [2P, E]

    value_carry = not REF_STATE
    kernel = _build_fused_kernel(table, float(dt), int(vel_iters),
                                 int(pos_iters), value_carry=value_carry)

    # per-cell plane budget (in+out f32 planes dominate the block working set)
    planes = 12 * B + 15 * P + 8 * B + 17 * P + 4 * P
    S_BLK = S
    while S_BLK > 1 and planes * S_BLK * LANES * 4 > 24 * 2**20:
        S_BLK //= 2
    if slp.MAX_S_BLK is not None:
        S_BLK = min(S_BLK, slp.MAX_S_BLK)
    grid = (S // S_BLK,)

    def im(i):
        return (0, i, 0)

    bfo, pfo, pio = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((8 * B, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((17 * P, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((2 * P, S, LANES), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((12 * B, S_BLK, LANES), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((15 * P, S_BLK, LANES), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * P, S_BLK, LANES), im, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8 * B, S_BLK, LANES), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((17 * P, S_BLK, LANES), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * P, S_BLK, LANES), im, memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=INTERPRET,
        scratch_shapes=(
            [] if value_carry else
            [pltpu.VMEM((sum(1 for s in table.is_static if not s),
                         S_BLK, LANES), jnp.float32)]
        ),
    )(_tile(bf, S), _tile(pf, S), _tile(pi, S))

    bfo = _untile(bfo)  # [8B, E]
    pfo = _untile(pfo)  # [17P, E]
    pio = _untile(pio)  # [2P, E]

    def bo(name):
        i = B_OUT[name]
        return bfo[i * B:(i + 1) * B]

    def po(name):
        i = P_OUT[name]
        return pfo[i * P:(i + 1) * P]

    new_bodies = Bodies(
        pos=jnp.stack([bo("posx"), bo("posy")], axis=1),
        angle=bo("ang"),
        vel=jnp.stack([bo("velx"), bo("vely")], axis=1),
        omega=bo("om"),
        awake=bo("awake") > 0.5,
        sleep_time=bo("sleep"),
    )
    new_man = nph.Manifold(
        flip=po("flip") > 0.5,
        local_normal=jnp.stack([po("lnx"), po("lny")], axis=1),
        local_point=jnp.stack([po("lpx"), po("lpy")], axis=1),
        points=jnp.stack([
            jnp.stack([po("mpx0"), po("mpy0")], axis=1),
            jnp.stack([po("mpx1"), po("mpy1")], axis=1),
        ], axis=1),
        ids=pio.reshape(P, 2, E),
        count=po("mcnt").astype(jnp.int32),
    )
    new_contacts = Contacts(
        man=new_man,
        normal_impulse=jnp.stack([po("ni0"), po("ni1")], axis=1),
        tangent_impulse=jnp.stack([po("ti0"), po("ti1")], axis=1),
        touching=po("touch") > 0.5,
    )
    info = StepInfo(
        touching=po("touch") > 0.5,
        begin=po("begin") > 0.5,
        end=po("end") > 0.5,
    )
    return new_bodies, new_contacts, info
