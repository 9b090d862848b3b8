"""Pallas TPU kernel for the contact solve: warm start, velocity iterations,
position integration and position iterations in ONE VMEM-resident kernel.

Why: the XLA formulation is HBM-bound -- each of the ~5000 sequential
Gauss-Seidel micro-ops round-trips [B,2,E]-sized arrays through HBM
(~1.3us/op measured on v5e => ~290 ms per step at the reference's 180/60
iterations).  Per env the whole working set is a few hundred floats, so the
kernel keeps every body/constraint plane in VMEM for the entire solve and
the loop runs at vector-unit speed.

Layout: the env batch is the *vector* axis.  Every per-env scalar becomes a
[S, 128] tile (S*128 envs per grid cell); per-body and per-pair quantities
are stacked planes indexed by static python ints, so the generated code is
straight-line vector ops with zero gathers.

The math is a line-for-line translation of engine/solver.py (same Box2D
semantics: friction-then-block-normal order, per-island early exit via
min-separation propagation over contact links).  Equivalence is asserted in
tests/test_pallas.py (interpret mode on CPU vs the XLA solver, bitwise-level
tolerances).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_puzzles_tpu.engine import narrowphase as nph
from gym_puzzles_tpu.engine.shapes import LINEAR_SLOP
from gym_puzzles_tpu.engine.solver import (
    BAUMGARTE,
    MAX_LINEAR_CORRECTION,
    MAX_ROTATION,
    MAX_TRANSLATION,
    VelocityConstraints,
)
from gym_puzzles_tpu.engine.types import ShapeTable

LANES = 128

# Flip to True (before first use) to run the kernel in the Pallas
# interpreter -- used by the CPU equivalence tests.
INTERPRET = False

# Test hook: cap the per-cell sublane tile to force a multi-cell grid at
# small env counts (exercises the non-aliased copy-in path).
MAX_S_BLK = None

# Position-phase transcendental elimination: compute exact cos/sin once per
# dynamic body per SWEEP, then advance the cached rotation through each
# intra-sweep angle update with a 5th-order small-angle rotation (see
# rot_step below; truncation ~dA^6/720).  Typical per-update angle deltas
# are Baumgarte-limited (~1e-2 rad); the worst observed case is v2's
# deep-overlap spawn resolution driving |dA| to ~0.14 rad on the
# low-inertia wheel bodies, where the earlier 3rd-order form's dA^4/24
# truncation became measurable (1.7e-5 rad after 12 contact steps --
# docs/BENCHMARKS.md).  Equivalence vs the exact-trig form is pinned in
# tests/test_fused_numerics.py (test_pos_trig_incremental_matches_exact).
# The exact form recomputes cos/sin per pair VISIT (b2 semantics
# verbatim): ~4x more transcendentals across the 60 position iterations
# (the largest single cost in the step per the docs/BENCHMARKS.md
# ablation).  Default ON after on-chip measurement (docs/BENCHMARKS.md):
# 4.40-4.42M vs 3.90M steps/s at 4096 envs.  Bitwise scope: v0's end
# state is BITWISE identical to the exact form over the 12-step contact
# drive of docs/benchmarks/validate_fused.py on v5e; v2's residual is
# ulp accumulation in the cached-rotation products (3.3e-6 rad / 4.8e-7 m
# after 12 chaotic steps), two orders below the engine's ~5e-3 measured
# parity floor vs Box2D (docs/PARITY.md).
POS_TRIG_INCREMENTAL = True

# body_ref plane indices
VELX, VELY, OM, POSX, POSY, ANG = range(6)
# pairA plane names (per pair)
PA = ("nx", "ny", "k11", "k12", "k22", "im11", "im12", "im22",
      "cnt", "solve", "flip", "lnx", "lny", "lpx", "lpy", "link", "mcnt")
PA_IDX = {n: i for i, n in enumerate(PA)}
# pairB plane names (per pair-point)
PB = ("bias", "nmass", "tmass", "rax", "ray", "rbx", "rby", "mpx", "mpy")
PB_IDX = {n: i for i, n in enumerate(PB)}

TOTAL_RADIUS = nph.TOTAL_RADIUS


def _mk_pair_consts(A, Bp, p, dd_pairs):
    """Per-pair constraint coefficients, read from the VMEM planes.

    Shared by both kernel modes: the value-carry mode calls this once and
    keeps the results live across the solver loops; the ref mode calls it
    inside each loop body (re-reading VMEM instead of carrying values)."""
    f32 = jnp.float32
    nx, ny = A("nx", p), A("ny", p)
    solve = A("solve", p)
    cnt = A("cnt", p) * solve  # solve=0 -> cnt 0
    return dict(
        nx=nx, ny=ny, tx=ny, ty=-nx, solve=solve, cnt=cnt,
        act=[(cnt > 0).astype(f32), (cnt > 1).astype(f32)],
        use_blk=(cnt == 2).astype(f32), one_act=(cnt == 1).astype(f32),
        k11=A("k11", p), k12=A("k12", p), k22=A("k22", p),
        im11=A("im11", p), im12=A("im12", p), im22=A("im22", p),
        flip=A("flip", p), sign=1.0 - 2.0 * A("flip", p),
        lnx=A("lnx", p), lny=A("lny", p),
        lpx=A("lpx", p), lpy=A("lpy", p),
        link=(A("link", p) if p in dd_pairs else None),
        mcnt=A("mcnt", p),
        bias=[Bp("bias", p, 0), Bp("bias", p, 1)],
        nmass=[Bp("nmass", p, 0), Bp("nmass", p, 1)],
        tmass=[Bp("tmass", p, 0), Bp("tmass", p, 1)],
        rax=[Bp("rax", p, 0), Bp("rax", p, 1)],
        ray=[Bp("ray", p, 0), Bp("ray", p, 1)],
        rbx=[Bp("rbx", p, 0), Bp("rbx", p, 1)],
        rby=[Bp("rby", p, 0), Bp("rby", p, 1)],
        mpx=[Bp("mpx", p, 0), Bp("mpx", p, 1)],
        mpy=[Bp("mpy", p, 0), Bp("mpy", p, 1)],
    )


class _Plane:
    """Ref-backed view: ``obj[b]`` reads/writes ``ref[plane, b]``.

    Lets the ref-state kernel mode share the exact math code with the
    value-carry mode (which uses plain dicts/lists of values)."""

    def __init__(self, ref, plane):
        self.ref, self.plane = ref, plane

    def __getitem__(self, b):
        return self.ref[self.plane, b]

    def __setitem__(self, b, v):
        self.ref[self.plane, b] = v


class _Row:
    """Ref-backed view over a 1-D-indexed ref: ``obj[i] <-> ref[off + i]``."""

    def __init__(self, ref, off=0):
        self.ref, self.off = ref, off

    def __getitem__(self, i):
        return self.ref[self.off + i]

    def __setitem__(self, i, v):
        self.ref[self.off + i] = v


class _Ctx:
    """Static world description shared by the kernel generators."""

    def __init__(self, table: ShapeTable):
        self.P = table.num_pairs
        self.B = table.num_bodies
        self.ia_l = [int(x) for x in table.pair_body_a]
        self.ib_l = [int(x) for x in table.pair_body_b]
        self.inv_m = [float(x) for x in table.inv_mass]
        self.inv_i = [float(x) for x in table.inv_inertia]
        self.fric = [float(x) for x in table.pair_friction]
        self.rest = [float(x) for x in table.pair_restitution]
        self.lcx = [float(x) for x in table.local_center[:, 0]]
        self.lcy = [float(x) for x in table.local_center[:, 1]]
        self.dyn = [not bool(s) for s in table.is_static]
        # done-gate representative: the pair's first dynamic endpoint
        self.rep = [self.ia_l[p] if self.dyn[self.ia_l[p]] else self.ib_l[p]
                    for p in range(self.P)]
        self.dyn_bodies = [b for b in range(self.B) if self.dyn[b]]
        self.n_dyn = len(self.dyn_bodies)
        # dynamic-dynamic pairs: the only links island min-propagation needs
        self.dd_pairs = [p for p in range(self.P)
                         if self.dyn[self.ia_l[p]] and self.dyn[self.ib_l[p]]]


# --------------------------------------------------------------------------
# Solve-phase generators.  Each emits the math for one sweep against
# abstract state containers (plain dicts/lists of values in the value-carry
# mode, _Plane/_Row ref views in the ref mode), so the standalone solve
# kernel and the fused whole-step kernel share one implementation.
# --------------------------------------------------------------------------

def _rel_vel(ctx, Cl, Vv, p, j):
    ia, ib = ctx.ia_l[p], ctx.ib_l[p]
    dyn = ctx.dyn
    c = Cl[p]
    rax, ray = c["rax"][j], c["ray"][j]
    rbx, rby = c["rbx"][j], c["rby"][j]
    if dyn[ia] and dyn[ib]:
        dvx = Vv["vx"][ib] - Vv["om"][ib] * rby \
            - Vv["vx"][ia] + Vv["om"][ia] * ray
        dvy = Vv["vy"][ib] + Vv["om"][ib] * rbx \
            - Vv["vy"][ia] - Vv["om"][ia] * rax
    elif dyn[ib]:
        dvx = Vv["vx"][ib] - Vv["om"][ib] * rby
        dvy = Vv["vy"][ib] + Vv["om"][ib] * rbx
    else:  # dyn[ia] only (a pair never has two static endpoints)
        dvx = Vv["om"][ia] * ray - Vv["vx"][ia]
        dvy = -Vv["vy"][ia] - Vv["om"][ia] * rax
    return dvx, dvy


def _apply_impulse(ctx, Cl, Vv, p, j, px, py):
    ia, ib = ctx.ia_l[p], ctx.ib_l[p]
    inv_m, inv_i = ctx.inv_m, ctx.inv_i
    c = Cl[p]
    if ctx.dyn[ia]:
        Vv["vx"][ia] = Vv["vx"][ia] - inv_m[ia] * px
        Vv["vy"][ia] = Vv["vy"][ia] - inv_m[ia] * py
        Vv["om"][ia] = Vv["om"][ia] - inv_i[ia] * (
            c["rax"][j] * py - c["ray"][j] * px)
    if ctx.dyn[ib]:
        Vv["vx"][ib] = Vv["vx"][ib] + inv_m[ib] * px
        Vv["vy"][ib] = Vv["vy"][ib] + inv_m[ib] * py
        Vv["om"][ib] = Vv["om"][ib] + inv_i[ib] * (
            c["rbx"][j] * py - c["rby"][j] * px)


def _warm_start(ctx, Cw, V, N, T):
    for p in range(ctx.P):
        c = Cw[p]
        for j in range(2):
            mask = c["act"][j]
            ni = N[p * 2 + j] * mask
            ti = T[p * 2 + j] * mask
            _apply_impulse(ctx, Cw, V, p, j, ni * c["nx"] + ti * c["tx"],
                           ni * c["ny"] + ti * c["ty"])


def _vel_sweep(ctx, Cl, Vv, Nv, Tv):
    f32 = jnp.float32
    for p in range(ctx.P):
        c = Cl[p]
        nx, ny, tx, ty = c["nx"], c["ny"], c["tx"], c["ty"]

        # friction per point
        for j in range(2):
            dvx, dvy = _rel_vel(ctx, Cl, Vv, p, j)
            vt = dvx * tx + dvy * ty
            lam = c["tmass"][j] * (-vt)
            ni = Nv[p * 2 + j]
            ti = Tv[p * 2 + j]
            max_f = ctx.fric[p] * ni
            new_t = jnp.clip(ti + lam, -max_f, max_f)
            lam = (new_t - ti) * c["act"][j]
            Tv[p * 2 + j] = ti + lam
            _apply_impulse(ctx, Cl, Vv, p, j, lam * tx, lam * ty)

        # normal: single-point candidate
        dv0x, dv0y = _rel_vel(ctx, Cl, Vv, p, 0)
        vn0 = dv0x * nx + dv0y * ny
        n0 = Nv[p * 2 + 0]
        n1 = Nv[p * 2 + 1]
        lam0 = -c["nmass"][0] * (vn0 - c["bias"][0])
        d_single = jnp.maximum(n0 + lam0, 0.0) - n0

        # normal: 2x2 block solver
        dv2x, dv2y = _rel_vel(ctx, Cl, Vv, p, 1)
        vn2 = dv2x * nx + dv2y * ny
        b1 = vn0 - c["bias"][0] - (c["k11"] * n0 + c["k12"] * n1)
        b2 = vn2 - c["bias"][1] - (c["k12"] * n0 + c["k22"] * n1)
        x1_1 = -(c["im11"] * b1 + c["im12"] * b2)
        x2_1 = -(c["im12"] * b1 + c["im22"] * b2)
        ok1 = (x1_1 >= 0.0) & (x2_1 >= 0.0)
        x1_2 = -c["nmass"][0] * b1
        ok2 = (x1_2 >= 0.0) & (c["k12"] * x1_2 + b2 >= 0.0)
        x2_3 = -c["nmass"][1] * b2
        ok3 = (x2_3 >= 0.0) & (c["k12"] * x2_3 + b1 >= 0.0)
        ok4 = (b1 >= 0.0) & (b2 >= 0.0)
        x1 = jnp.where(ok1, x1_1, jnp.where(ok2, x1_2, 0.0))
        x2 = jnp.where(ok1, x2_1, jnp.where(ok3, x2_3, 0.0))
        applied = (ok1 | ok2 | ok3 | ok4).astype(f32)
        d1_blk = applied * (x1 - n0)
        d2_blk = applied * (x2 - n1)

        d1 = c["use_blk"] * d1_blk + c["one_act"] * d_single
        d2 = c["use_blk"] * d2_blk

        Nv[p * 2 + 0] = n0 + d1
        Nv[p * 2 + 1] = n1 + d2
        _apply_impulse(ctx, Cl, Vv, p, 0, d1 * nx, d1 * ny)
        _apply_impulse(ctx, Cl, Vv, p, 1, d2 * nx, d2 * ny)


def _integrate(ctx, V, PX, PY, AN, act_get, pos_get, store_vel, dt):
    """Clamped position integration for awake dynamic bodies.  Reads final
    velocities from V (clamping them in place via store_vel) and writes new
    positions into the PX/PY/AN containers."""
    for b in ctx.dyn_bodies:
        vx, vy, w = V["vx"][b], V["vy"][b], V["om"][b]
        t2 = (dt * dt) * (vx * vx + vy * vy)
        scale = jnp.where(
            t2 > MAX_TRANSLATION**2,
            MAX_TRANSLATION / jnp.sqrt(jnp.maximum(t2, 1e-30)),
            1.0,
        )
        vx = vx * scale
        vy = vy * scale
        rot = dt * w
        rscale = jnp.where(
            rot * rot > float(MAX_ROTATION) ** 2,
            float(MAX_ROTATION) / jnp.abs(rot), 1.0,
        )
        w = w * rscale
        act = act_get(b)
        store_vel(b, vx, vy, w)
        px0, py0, an0 = pos_get(b)
        PX[b] = px0 + act * (dt * vx)
        PY[b] = py0 + act * (dt * vy)
        AN[b] = an0 + act * (dt * w)


def _static_transforms(ctx, pos_get):
    """(cos, sin, origin, COM) of every static body: constant through the
    position solve, so computed once outside the iteration loops."""
    ST = {}
    for b in range(ctx.B):
        if ctx.dyn[b]:
            continue
        px0, py0, an0 = pos_get(b)
        cs, ss = jnp.cos(an0), jnp.sin(an0)
        if ctx.lcx[b] == 0.0 and ctx.lcy[b] == 0.0:
            ox, oy = px0, py0
        else:
            ox = px0 - (cs * ctx.lcx[b] - ss * ctx.lcy[b])
            oy = py0 - (ss * ctx.lcx[b] + cs * ctx.lcy[b])
        ST[b] = (cs, ss, ox, oy, px0, py0)
    return ST


def _pos_sweep(ctx, Cl, ST, PXv, PYv, ANv, DNv, zero):
    f32 = jnp.float32
    ia_l, ib_l, dyn = ctx.ia_l, ctx.ib_l, ctx.dyn
    inv_m, inv_i, lcx, lcy = ctx.inv_m, ctx.inv_i, ctx.lcx, ctx.lcy
    # per-body min separation accumulators, private to the iteration
    ms = {b: zero() for b in ctx.dyn_bodies}
    # incremental-trig cache: exact once per sweep, advanced per update
    CS = ({b: (jnp.cos(ANv[b]), jnp.sin(ANv[b])) for b in ctx.dyn_bodies}
          if POS_TRIG_INCREMENTAL else None)

    def rot_step(b, dA):
        """Advance the cached (cos, sin) of body b by the small angle dA.

        5th-order small-angle advance: truncation ~dA^6/720 stays below
        f32 ulp even at the largest observed per-update deltas (deep-
        overlap spawn resolution drives |dA| to ~0.14 rad on v2's
        low-inertia wheel bodies, where the earlier 3rd-order form's
        dA^4/24 ~ 1.6e-5 became measurable -- docs/BENCHMARKS.md)."""
        dA2 = dA * dA
        c2 = 1.0 - dA2 * (0.5 - dA2 * (1.0 / 24.0))
        s2 = dA * (1.0 - dA2 * ((1.0 / 6.0) - dA2 * (1.0 / 120.0)))
        cb0, sb0 = CS[b]
        CS[b] = (cb0 * c2 - sb0 * s2, sb0 * c2 + cb0 * s2)

    for p in range(ctx.P):
        ia, ib = ia_l[p], ib_l[p]
        c = Cl[p]
        solve = c["solve"]
        cnt = c["mcnt"]  # manifold count (not the degraded one)
        pair_done = jnp.maximum(DNv[ctx.rep[p]], 1.0 - solve)

        # transforms once per contact (b2 semantics); static sides
        # come from the hoisted constants
        if dyn[ia]:
            if POS_TRIG_INCREMENTAL:
                ca, sa = CS[ia]
            else:
                ca, sa = jnp.cos(ANv[ia]), jnp.sin(ANv[ia])
            orgax = PXv[ia] - (ca * lcx[ia] - sa * lcy[ia])
            orgay = PYv[ia] - (sa * lcx[ia] + ca * lcy[ia])
            pax, pay = PXv[ia], PYv[ia]
        else:
            ca, sa, orgax, orgay, pax, pay = ST[ia]
        if dyn[ib]:
            if POS_TRIG_INCREMENTAL:
                cb, sb = CS[ib]
            else:
                cb, sb = jnp.cos(ANv[ib]), jnp.sin(ANv[ib])
            orgbx = PXv[ib] - (cb * lcx[ib] - sb * lcy[ib])
            orgby = PYv[ib] - (sb * lcx[ib] + cb * lcy[ib])
            pbx, pby = PXv[ib], PYv[ib]
        else:
            cb, sb, orgbx, orgby, pbx, pby = ST[ib]

        flip = c["flip"]
        cr = flip * cb + (1.0 - flip) * ca
        sr = flip * sb + (1.0 - flip) * sa
        orx = flip * orgbx + (1.0 - flip) * orgax
        ory = flip * orgby + (1.0 - flip) * orgay
        ci = flip * ca + (1.0 - flip) * cb
        si = flip * sa + (1.0 - flip) * sb
        oix = flip * orgax + (1.0 - flip) * orgbx
        oiy = flip * orgay + (1.0 - flip) * orgby

        nwx = cr * c["lnx"] - sr * c["lny"]
        nwy = sr * c["lnx"] + cr * c["lny"]
        ppx = orx + cr * c["lpx"] - sr * c["lpy"]
        ppy = ory + sr * c["lpx"] + cr * c["lpy"]
        sign = c["sign"]  # ensure normal points A -> B

        for j in range(2):
            track = solve * (cnt > j).astype(f32)
            active = track * (1.0 - pair_done)
            mpx, mpy = c["mpx"][j], c["mpy"][j]
            cpx = oix + ci * mpx - si * mpy
            cpy = oiy + si * mpx + ci * mpy
            sep = (cpx - ppx) * nwx + (cpy - ppy) * nwy - TOTAL_RADIUS
            nabx, naby = sign * nwx, sign * nwy

            if dyn[ia]:
                ms[ia] = jnp.minimum(ms[ia], jnp.where(track > 0, sep, 0.0))
            if dyn[ib]:
                ms[ib] = jnp.minimum(ms[ib], jnp.where(track > 0, sep, 0.0))

            cc = jnp.clip(
                BAUMGARTE * (sep + LINEAR_SLOP), -MAX_LINEAR_CORRECTION, 0.0
            )
            # k only collects dynamic endpoints (inv terms of the
            # static side are exactly zero)
            k = inv_m[ia] + inv_m[ib]
            if dyn[ia]:
                rax = cpx - pax
                ray = cpy - pay
                rna = rax * naby - ray * nabx
                k = k + inv_i[ia] * rna * rna
            if dyn[ib]:
                rbx = cpx - pbx
                rby = cpy - pby
                rnb = rbx * naby - rby * nabx
                k = k + inv_i[ib] * rnb * rnb
            imp = jnp.where(k > 0.0, -cc / jnp.maximum(k, 1e-20), 0.0) * active
            px, py = imp * nabx, imp * naby
            if dyn[ia]:
                PXv[ia] = PXv[ia] - inv_m[ia] * px
                PYv[ia] = PYv[ia] - inv_m[ia] * py
                dAa = -inv_i[ia] * (rax * py - ray * px)
                ANv[ia] = ANv[ia] + dAa
                pax, pay = PXv[ia], PYv[ia]
                if POS_TRIG_INCREMENTAL:
                    rot_step(ia, dAa)
            if dyn[ib]:
                PXv[ib] = PXv[ib] + inv_m[ib] * px
                PYv[ib] = PYv[ib] + inv_m[ib] * py
                dAb = inv_i[ib] * (rby * px - rbx * py) * (-1.0)
                ANv[ib] = ANv[ib] + dAb
                pbx, pby = PXv[ib], PYv[ib]
                if POS_TRIG_INCREMENTAL:
                    rot_step(ib, dAb)

    # island-wide minimum via min-propagation over touching links;
    # diameter of the dynamic contact graph is < n_dyn
    for _round in range(max(1, ctx.n_dyn - 1)):
        for p in ctx.dd_pairs:
            ia, ib = ia_l[p], ib_l[p]
            link = Cl[p]["link"]
            m = jnp.minimum(ms[ia], ms[ib])
            ms[ia] = link * m + (1.0 - link) * ms[ia]
            ms[ib] = link * m + (1.0 - link) * ms[ib]
    for b in ctx.dyn_bodies:
        DNv[b] = jnp.maximum(
            DNv[b], (ms[b] >= -3.0 * LINEAR_SLOP).astype(f32)
        )


def _run_vel_phase(ctx, C, mkC, V, N, T, vel_iters, value_carry,
                   unroll=False):
    """Drive vel_iters velocity sweeps.  Returns the final (V, N, T): new
    value containers in value mode, the same ref views in ref mode.

    ``unroll`` (value mode only) emits the sweeps as straight-line code
    instead of a fori_loop: at reduced iteration counts this is what lets
    XLA:CPU compile the *fused* kernel in interpret mode (the ~400-wide
    rolled loop carry sends its live-range analysis quadratic)."""
    if value_carry and unroll:
        Vv, Nv, Tv = V, list(N), list(T)
        for _ in range(vel_iters):
            _vel_sweep(ctx, C, Vv, Nv, Tv)
        return Vv, Nv, Tv
    if value_carry:
        dyn_bodies = ctx.dyn_bodies

        def vel_pack(Vv, Nv, Tv):
            return (tuple(Vv["vx"][b] for b in dyn_bodies),
                    tuple(Vv["vy"][b] for b in dyn_bodies),
                    tuple(Vv["om"][b] for b in dyn_bodies),
                    tuple(Nv), tuple(Tv))

        def vel_unpack(carry):
            vxs, vys, oms, ns, ts = carry
            Vv = dict(vx={b: vxs[i] for i, b in enumerate(dyn_bodies)},
                      vy={b: vys[i] for i, b in enumerate(dyn_bodies)},
                      om={b: oms[i] for i, b in enumerate(dyn_bodies)})
            return Vv, list(ns), list(ts)

        def vel_iter(_, carry):
            Vv, Nv, Tv = vel_unpack(carry)
            _vel_sweep(ctx, C, Vv, Nv, Tv)
            return vel_pack(Vv, Nv, Tv)

        return vel_unpack(
            jax.lax.fori_loop(0, vel_iters, vel_iter, vel_pack(V, N, T))
        )

    def vel_iter(_, carry):
        _vel_sweep(ctx, mkC(), V, N, T)
        return carry

    jax.lax.fori_loop(0, vel_iters, vel_iter, 0)
    return V, N, T


def _run_pos_phase(ctx, C, mkC, ST, PX, PY, AN, DN0, pos_iters, value_carry,
                   zero, unroll=False):
    """Drive pos_iters position sweeps.  Returns (PX, PY, AN, DN).
    ``unroll`` as in :func:`_run_vel_phase`."""
    if value_carry and unroll:
        DN = {b: zero() for b in ctx.dyn_bodies}
        for _ in range(pos_iters):
            _pos_sweep(ctx, C, ST, PX, PY, AN, DN, zero)
        return PX, PY, AN, DN
    if value_carry:
        dyn_bodies = ctx.dyn_bodies

        def pos_pack(PXv, PYv, ANv, DNv):
            return (tuple(PXv[b] for b in dyn_bodies),
                    tuple(PYv[b] for b in dyn_bodies),
                    tuple(ANv[b] for b in dyn_bodies),
                    tuple(DNv[b] for b in dyn_bodies))

        def pos_unpack(carry):
            pxs, pys, ans, dns = carry
            return ({b: pxs[i] for i, b in enumerate(dyn_bodies)},
                    {b: pys[i] for i, b in enumerate(dyn_bodies)},
                    {b: ans[i] for i, b in enumerate(dyn_bodies)},
                    {b: dns[i] for i, b in enumerate(dyn_bodies)})

        def pos_iter(_, carry):
            PXv, PYv, ANv, DNv = pos_unpack(carry)
            _pos_sweep(ctx, C, ST, PXv, PYv, ANv, DNv, zero)
            return pos_pack(PXv, PYv, ANv, DNv)

        return pos_unpack(
            jax.lax.fori_loop(
                0, pos_iters, pos_iter,
                pos_pack(PX, PY, AN, {b: zero() for b in dyn_bodies}),
            )
        )

    def pos_iter(_, carry):
        _pos_sweep(ctx, mkC(), ST, PX, PY, AN, DN0, zero)
        return carry

    jax.lax.fori_loop(0, pos_iters, pos_iter, 0)
    return PX, PY, AN, DN0


def _build_kernel(table: ShapeTable, dt: float, vel_iters: int, pos_iters: int,
                  value_carry: bool = True, aliased: bool = True):
    """Generate the solve kernel for one static world description.

    The generated code is specialized at trace time around two facts the
    ShapeTable proves:

    * **Static bodies never move and have zero velocity** (b2Body ignores
      SetLinearVelocity on static bodies; the integrator never touches
      them).  Every term involving a static endpoint's velocity is dropped,
      its impulse/position updates are skipped (inv_mass = inv_I = 0 makes
      them exact no-ops), and its position-solver transform (cos/sin +
      origin) is hoisted out of the iteration loops and computed once.
      With the reference worlds' 4 walls this removes roughly a third of
      the velocity-iteration ops and the bulk of the per-iteration
      transcendentals.

    * **The pair list is static**, so all per-pair coefficient planes are
      loop-invariant: with ``value_carry=True`` they are read from VMEM once
      and carried as values; body velocities/positions and accumulated
      impulses live in the fori_loop carry instead of round-tripping through
      refs on every Gauss-Seidel micro-op.

    ``value_carry=False`` keeps all solver state in the refs (the pre-carry
    formulation): slightly slower on TPU, but the XLA:CPU compile of the
    *interpreted* kernel is minutes-faster (the giant loop carry sends the
    CPU backend's live-range/copy passes quadratic), so the CPU equivalence
    tests use this mode.  Both modes run the identical math through the
    shared sweep generators above; the modes themselves are asserted
    equivalent on real TPU (docs/BENCHMARKS.md methodology).
    """
    ctx = _Ctx(table)
    P, B = ctx.P, ctx.B
    dyn_bodies = ctx.dyn_bodies

    def kernel(pairA_ref, pairB_ref, active_ref, body_in, imp_in,
               body_ref, imp_ref, done_ref):
        if aliased:
            # body_in/imp_in alias body_ref/imp_ref (input_output_aliases).
            # Only legal on a single-cell grid: Mosaic miswindows aliased
            # inputs when the grid has >1 cell (verified empirically -- a
            # minimal aliased blocked-grid kernel returns wrong planes for
            # every cell), so multi-cell launches copy instead.
            del body_in, imp_in
        else:
            body_ref[...] = body_in[...]
            imp_ref[...] = imp_in[...]

        def A(name, p):
            return pairA_ref[PA_IDX[name] * P + p]

        def Bp(name, p, j):
            return pairB_ref[(PB_IDX[name] * P + p) * 2 + j]

        # ---- per-pair constants -----------------------------------------
        # value mode: read once, live across the loops (hoisted).
        # ref mode: rebuilt inside each loop body so no value crosses a
        # loop boundary (VMEM rereads are cheap; XLA:CPU compile stays sane).
        def mkC():
            return [_mk_pair_consts(A, Bp, p, ctx.dd_pairs) for p in range(P)]

        C = mkC() if value_carry else None

        # ---- velocity-phase state ----------------------------------------
        # V maps dynamic body -> velocity components; static bodies are
        # compile-time zero.  N/T are accumulated impulses per pair-point.
        # value mode: plain values (ride the fori carry).  ref mode: views
        # reading/writing the refs in place.
        if value_carry:
            V = dict(
                vx={b: body_ref[VELX, b] for b in dyn_bodies},
                vy={b: body_ref[VELY, b] for b in dyn_bodies},
                om={b: body_ref[OM, b] for b in dyn_bodies},
            )
            N = [imp_ref[(0 * P + p) * 2 + j] for p in range(P) for j in range(2)]
            T = [imp_ref[(1 * P + p) * 2 + j] for p in range(P) for j in range(2)]
        else:
            V = dict(vx=_Plane(body_ref, VELX), vy=_Plane(body_ref, VELY),
                     om=_Plane(body_ref, OM))
            N = _Row(imp_ref, 0)
            T = _Row(imp_ref, 2 * P)

        # ---- warm start + velocity iterations ---------------------------
        _warm_start(ctx, C if value_carry else mkC(), V, N, T)
        V, N, T = _run_vel_phase(ctx, C, mkC, V, N, T, vel_iters, value_carry)

        if value_carry:
            # store impulses (b2ContactSolver::StoreImpulses)
            for p in range(P):
                for j in range(2):
                    imp_ref[(0 * P + p) * 2 + j] = N[p * 2 + j]
                    imp_ref[(1 * P + p) * 2 + j] = T[p * 2 + j]

        # ---- integrate positions (clamped; awake bodies only) -----------
        if value_carry:
            PX, PY, AN = {}, {}, {}
        else:
            PX = _Plane(body_ref, POSX)
            PY = _Plane(body_ref, POSY)
            AN = _Plane(body_ref, ANG)

        def store_vel(b, vx, vy, w):
            body_ref[VELX, b] = vx
            body_ref[VELY, b] = vy
            body_ref[OM, b] = w

        def pos_get(b):
            return body_ref[POSX, b], body_ref[POSY, b], body_ref[ANG, b]

        _integrate(ctx, V, PX, PY, AN, lambda b: active_ref[b], pos_get,
                   store_vel, dt)

        # ---- static transforms + position iterations --------------------
        ST = _static_transforms(ctx, pos_get)
        for b in range(B):
            done_ref[b] = jnp.zeros_like(done_ref[b])

        zero = lambda: jnp.zeros_like(done_ref[0])
        DN0 = None if value_carry else _Row(done_ref)
        PX, PY, AN, DN = _run_pos_phase(
            ctx, C, mkC, ST, PX, PY, AN, DN0, pos_iters, value_carry, zero
        )
        if value_carry:
            for b in dyn_bodies:
                body_ref[POSX, b] = PX[b]
                body_ref[POSY, b] = PY[b]
                body_ref[ANG, b] = AN[b]
                done_ref[b] = DN[b]

    return kernel



def _tile(x, S):
    """[..., E] -> [..., S, 128] (E = S*128)."""
    return x.reshape(x.shape[:-1] + (S, LANES))


def _untile(x):
    return x.reshape(x.shape[:-2] + (x.shape[-2] * LANES,))


@functools.partial(
    jax.jit,
    static_argnames=("table", "dt", "vel_iters", "pos_iters"),
)
def solve_contacts(table: ShapeTable, vc: VelocityConstraints, man, bodies_pos,
                   bodies_angle, vel, omega, active, link, dt, vel_iters, pos_iters):
    """Batched contact solve on the Pallas kernel.

    All array args carry the env batch on the LAST axis (E % 128 == 0).
    Returns (vel, omega, pos, angle, normal_impulse, tangent_impulse,
    position_solved[B, E] bool).
    """
    E = vel.shape[-1]
    assert E % LANES == 0, f"env batch {E} must be a multiple of {LANES}"
    S = E // LANES
    P = table.num_pairs
    B = table.num_bodies
    f32 = lambda x: x.astype(jnp.float32)

    # pack pairA planes [16*P, S, 128]
    pairA = jnp.concatenate(
        [
            vc.normal[:, 0], vc.normal[:, 1],
            vc.k11, vc.k12, vc.k22, vc.im11, vc.im12, vc.im22,
            f32(vc.count), f32(vc.solve),
            f32(man.flip),
            man.local_normal[:, 0], man.local_normal[:, 1],
            man.local_point[:, 0], man.local_point[:, 1],
            f32(link),
            f32(man.count),
        ]
    )  # [17*P, E]
    # pack pairB planes [9*P*2, S, 128]; order: plane-major, then pair, then point
    def pts(x):  # [P, 2, E] -> [P*2, E]
        return x.reshape(P * 2, E)

    pairB = jnp.concatenate(
        [
            pts(vc.bias), pts(vc.normal_mass), pts(vc.tangent_mass),
            pts(vc.r_a[:, :, 0]), pts(vc.r_a[:, :, 1]),
            pts(vc.r_b[:, :, 0]), pts(vc.r_b[:, :, 1]),
            pts(man.points[:, :, 0]), pts(man.points[:, :, 1]),
        ]
    )
    body = jnp.stack(
        [vel[:, 0], vel[:, 1], omega, bodies_pos[:, 0], bodies_pos[:, 1], bodies_angle]
    )  # [6, B, E]
    imp = jnp.concatenate([pts(vc.normal_impulse), pts(vc.tangent_impulse)])  # [2*P*2, E]

    # Interpreted runs (CPU tests) use the ref-state formulation: identical
    # math, but XLA:CPU compiles it in seconds where the value-carry HLO
    # takes minutes (pathological live-range analysis on the ~400-wide loop
    # carry).  TPU always gets the value-carry kernel (~20% faster step).
    # grid over env tiles: keep per-cell plane buffers within ~24 MB.  The
    # kernel additionally carries the whole velocity/position state plus the
    # hoisted per-pair constants as *values* (fori_loop carries), which lands
    # on the Mosaic scoped-vmem stack at ~2.5x the plane working set — well
    # over the 16 MB default scoped limit, so the pallas_call below raises
    # vmem_limit_bytes (v5e has 128 MB of VMEM).
    S_BLK = S
    while S_BLK > 1 and (17 * P + 9 * P * 2 + 2 * P * 2 + 6 * B + 2 * B) * S_BLK * LANES * 4 > 24 * 2**20:
        S_BLK //= 2
    if MAX_S_BLK is not None:
        S_BLK = min(S_BLK, MAX_S_BLK)
    grid = (S // S_BLK,)
    # in-place aliasing of the body/impulse buffers is ONLY correct on a
    # single-cell grid: Mosaic miswindows aliased inputs across grid cells
    # (verified empirically; a minimal aliased 2-cell kernel reads the wrong
    # plane data in every cell).  Multi-cell launches pass the state as a
    # plain input and the kernel copies it into the outputs first.
    aliased = grid[0] == 1

    kernel = _build_kernel(table, float(dt), int(vel_iters), int(pos_iters),
                           value_carry=not INTERPRET, aliased=aliased)

    def im2(i):  # [K, S, 128] arrays
        return (0, i, 0)

    def im3(i):  # [6, B, S, 128]
        return (0, 0, i, 0)

    out_body, out_imp, out_done = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((6, B, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((2 * P * 2, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((17 * P, S_BLK, LANES), im2, memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * P * 2, S_BLK, LANES), im2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S_BLK, LANES), im2, memory_space=pltpu.VMEM),
            pl.BlockSpec((6, B, S_BLK, LANES), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * P * 2, S_BLK, LANES), im2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((6, B, S_BLK, LANES), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * P * 2, S_BLK, LANES), im2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S_BLK, LANES), im2, memory_space=pltpu.VMEM),
        ),
        input_output_aliases={3: 0, 4: 1} if aliased else {},
        # the value-carried live set exceeds the 16 MB default scoped-vmem
        # budget; raise the per-kernel limit (v5e VMEM is 128 MB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=INTERPRET,
    )(
        _tile(pairA.reshape(17 * P, E), S),
        _tile(pairB, S),
        _tile(f32(active), S),
        _tile(body, S),
        _tile(imp, S),
    )

    body_f = _untile(out_body)  # [6, B, E]
    imp_f = _untile(out_imp)  # [2*P*2, E]
    done_f = _untile(out_done)  # [B, E]

    vel_o = jnp.stack([body_f[VELX], body_f[VELY]], axis=1)  # [B, 2, E]
    pos_o = jnp.stack([body_f[POSX], body_f[POSY]], axis=1)
    n_imp = imp_f[: P * 2].reshape(P, 2, E)
    t_imp = imp_f[P * 2:].reshape(P, 2, E)
    return (
        vel_o, body_f[OM], pos_o, body_f[ANG], n_imp, t_imp, done_f > 0.5
    )
