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


def _build_kernel(table: ShapeTable, dt: float, vel_iters: int, pos_iters: int):
    P = table.num_pairs
    B = table.num_bodies
    ia_l = [int(x) for x in table.pair_body_a]
    ib_l = [int(x) for x in table.pair_body_b]
    inv_m = [float(x) for x in table.inv_mass]
    inv_i = [float(x) for x in table.inv_inertia]
    fric = [float(x) for x in table.pair_friction]
    lcx = [float(x) for x in table.local_center[:, 0]]
    lcy = [float(x) for x in table.local_center[:, 1]]
    dyn = [not bool(s) for s in table.is_static]
    # done-gate representative: the pair's first dynamic endpoint
    rep = [ia_l[p] if dyn[ia_l[p]] else ib_l[p] for p in range(P)]

    def kernel(pairA_ref, pairB_ref, active_ref, body_in, imp_in,
               body_ref, imp_ref, done_ref):
        # body_in/imp_in alias body_ref/imp_ref (input_output_aliases): all
        # reads and writes go through the output refs.
        del body_in, imp_in
        # ---- helpers ----------------------------------------------------
        def A(name, p):
            return pairA_ref[PA_IDX[name] * P + p]

        def Bp(name, p, j):
            return pairB_ref[(PB_IDX[name] * P + p) * 2 + j]

        def rel_vel(p, j):
            ia, ib = ia_l[p], ib_l[p]
            rax, ray = Bp("rax", p, j), Bp("ray", p, j)
            rbx, rby = Bp("rbx", p, j), Bp("rby", p, j)
            dvx = body_ref[VELX, ib] - body_ref[OM, ib] * rby \
                - body_ref[VELX, ia] + body_ref[OM, ia] * ray
            dvy = body_ref[VELY, ib] + body_ref[OM, ib] * rbx \
                - body_ref[VELY, ia] - body_ref[OM, ia] * rax
            return dvx, dvy

        def apply_impulse(p, j, px, py):
            ia, ib = ia_l[p], ib_l[p]
            rax, ray = Bp("rax", p, j), Bp("ray", p, j)
            rbx, rby = Bp("rbx", p, j), Bp("rby", p, j)
            body_ref[VELX, ia] = body_ref[VELX, ia] - inv_m[ia] * px
            body_ref[VELY, ia] = body_ref[VELY, ia] - inv_m[ia] * py
            body_ref[OM, ia] = body_ref[OM, ia] - inv_i[ia] * (rax * py - ray * px)
            body_ref[VELX, ib] = body_ref[VELX, ib] + inv_m[ib] * px
            body_ref[VELY, ib] = body_ref[VELY, ib] + inv_m[ib] * py
            body_ref[OM, ib] = body_ref[OM, ib] + inv_i[ib] * (rbx * py - rby * px)

        # ---- warm start -------------------------------------------------
        for p in range(P):
            nx, ny = A("nx", p), A("ny", p)
            tx, ty = ny, -nx
            cnt = A("cnt", p)
            solve = A("solve", p)
            for j in range(2):
                mask = solve * (cnt > j).astype(jnp.float32)
                ni = imp_ref[(0 * P + p) * 2 + j] * mask
                ti = imp_ref[(1 * P + p) * 2 + j] * mask
                apply_impulse(p, j, ni * nx + ti * tx, ni * ny + ti * ty)

        # ---- velocity iterations ---------------------------------------
        def vel_iter(_, carry):
            for p in range(P):
                nx, ny = A("nx", p), A("ny", p)
                tx, ty = ny, -nx
                solve = A("solve", p)
                cnt = A("cnt", p) * solve  # solve=0 -> cnt 0

                # friction per point
                for j in range(2):
                    active = (cnt > j).astype(jnp.float32)
                    dvx, dvy = rel_vel(p, j)
                    vt = dvx * tx + dvy * ty
                    lam = Bp("tmass", p, j) * (-vt)
                    ni = imp_ref[(0 * P + p) * 2 + j]
                    ti = imp_ref[(1 * P + p) * 2 + j]
                    max_f = fric[p] * ni
                    new_t = jnp.clip(ti + lam, -max_f, max_f)
                    lam = (new_t - ti) * active
                    imp_ref[(1 * P + p) * 2 + j] = ti + lam
                    apply_impulse(p, j, lam * tx, lam * ty)

                # normal: single-point candidate
                dv0x, dv0y = rel_vel(p, 0)
                vn0 = dv0x * nx + dv0y * ny
                n0 = imp_ref[(0 * P + p) * 2 + 0]
                n1 = imp_ref[(0 * P + p) * 2 + 1]
                lam0 = -Bp("nmass", p, 0) * (vn0 - Bp("bias", p, 0))
                d_single = jnp.maximum(n0 + lam0, 0.0) - n0

                # normal: 2x2 block solver
                dv1x, dv1y = dv0x, dv0y
                dv2x, dv2y = rel_vel(p, 1)
                vn1 = vn0
                vn2 = dv2x * nx + dv2y * ny
                k11, k12, k22 = A("k11", p), A("k12", p), A("k22", p)
                b1 = vn1 - Bp("bias", p, 0) - (k11 * n0 + k12 * n1)
                b2 = vn2 - Bp("bias", p, 1) - (k12 * n0 + k22 * n1)
                x1_1 = -(A("im11", p) * b1 + A("im12", p) * b2)
                x2_1 = -(A("im12", p) * b1 + A("im22", p) * b2)
                ok1 = (x1_1 >= 0.0) & (x2_1 >= 0.0)
                x1_2 = -Bp("nmass", p, 0) * b1
                ok2 = (x1_2 >= 0.0) & (k12 * x1_2 + b2 >= 0.0)
                x2_3 = -Bp("nmass", p, 1) * b2
                ok3 = (x2_3 >= 0.0) & (k12 * x2_3 + b1 >= 0.0)
                ok4 = (b1 >= 0.0) & (b2 >= 0.0)
                x1 = jnp.where(ok1, x1_1, jnp.where(ok2, x1_2, 0.0))
                x2 = jnp.where(ok1, x2_1, jnp.where(ok3, x2_3, 0.0))
                applied = (ok1 | ok2 | ok3 | ok4).astype(jnp.float32)
                d1_blk = applied * (x1 - n0)
                d2_blk = applied * (x2 - n1)

                use_blk = (cnt == 2).astype(jnp.float32)
                one_act = (cnt == 1).astype(jnp.float32)
                d1 = use_blk * d1_blk + one_act * d_single
                d2 = use_blk * d2_blk

                imp_ref[(0 * P + p) * 2 + 0] = n0 + d1
                imp_ref[(0 * P + p) * 2 + 1] = n1 + d2
                apply_impulse(p, 0, d1 * nx, d1 * ny)
                apply_impulse(p, 1, d2 * nx, d2 * ny)
            return carry

        jax.lax.fori_loop(0, vel_iters, vel_iter, 0)

        # ---- integrate positions (clamped; awake bodies only) -----------
        for b in range(B):
            if not dyn[b]:
                continue
            vx, vy, w = body_ref[VELX, b], body_ref[VELY, b], body_ref[OM, b]
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
            act = active_ref[b]
            body_ref[VELX, b] = vx
            body_ref[VELY, b] = vy
            body_ref[OM, b] = w
            body_ref[POSX, b] = body_ref[POSX, b] + act * (dt * vx)
            body_ref[POSY, b] = body_ref[POSY, b] + act * (dt * vy)
            body_ref[ANG, b] = body_ref[ANG, b] + act * (dt * w)

        # ---- position iterations with per-island early exit -------------
        for b in range(B):
            done_ref[b] = jnp.zeros_like(done_ref[b])

        def pos_iter(_, carry):
            # per-body min separation accumulators, private to the iteration
            ms = [jnp.zeros_like(done_ref[0]) for _ in range(B)]
            for p in range(P):
                ia, ib = ia_l[p], ib_l[p]
                solve = A("solve", p)
                cnt = A("mcnt", p)  # manifold count (not the degraded one)
                pair_done = jnp.maximum(done_ref[rep[p]], 1.0 - solve)

                # transforms once per contact (b2 semantics)
                ca, sa = jnp.cos(body_ref[ANG, ia]), jnp.sin(body_ref[ANG, ia])
                cb, sb = jnp.cos(body_ref[ANG, ib]), jnp.sin(body_ref[ANG, ib])
                orgax = body_ref[POSX, ia] - (ca * lcx[ia] - sa * lcy[ia])
                orgay = body_ref[POSY, ia] - (sa * lcx[ia] + ca * lcy[ia])
                orgbx = body_ref[POSX, ib] - (cb * lcx[ib] - sb * lcy[ib])
                orgby = body_ref[POSY, ib] - (sb * lcx[ib] + cb * lcy[ib])

                flip = A("flip", p)
                cr = flip * cb + (1.0 - flip) * ca
                sr = flip * sb + (1.0 - flip) * sa
                orx = flip * orgbx + (1.0 - flip) * orgax
                ory = flip * orgby + (1.0 - flip) * orgay
                ci = flip * ca + (1.0 - flip) * cb
                si = flip * sa + (1.0 - flip) * sb
                oix = flip * orgax + (1.0 - flip) * orgbx
                oiy = flip * orgay + (1.0 - flip) * orgby

                lnx, lny = A("lnx", p), A("lny", p)
                lpx, lpy = A("lpx", p), A("lpy", p)
                nwx = cr * lnx - sr * lny
                nwy = sr * lnx + cr * lny
                ppx = orx + cr * lpx - sr * lpy
                ppy = ory + sr * lpx + cr * lpy
                sign = 1.0 - 2.0 * flip  # ensure normal points A -> B

                for j in range(2):
                    track = solve * (cnt > j).astype(jnp.float32)
                    active = track * (1.0 - pair_done)
                    mpx, mpy = Bp("mpx", p, j), Bp("mpy", p, j)
                    cpx = oix + ci * mpx - si * mpy
                    cpy = oiy + si * mpx + ci * mpy
                    sep = (cpx - ppx) * nwx + (cpy - ppy) * nwy - TOTAL_RADIUS
                    nabx, naby = sign * nwx, sign * nwy

                    if dyn[ia]:
                        ms[ia] = jnp.minimum(ms[ia], jnp.where(track > 0, sep, 0.0))
                    if dyn[ib]:
                        ms[ib] = jnp.minimum(ms[ib], jnp.where(track > 0, sep, 0.0))

                    rax = cpx - body_ref[POSX, ia]
                    ray = cpy - body_ref[POSY, ia]
                    rbx = cpx - body_ref[POSX, ib]
                    rby = cpy - body_ref[POSY, ib]
                    c = jnp.clip(
                        BAUMGARTE * (sep + LINEAR_SLOP), -MAX_LINEAR_CORRECTION, 0.0
                    )
                    rna = rax * naby - ray * nabx
                    rnb = rbx * naby - rby * nabx
                    k = inv_m[ia] + inv_m[ib] + inv_i[ia] * rna * rna + inv_i[ib] * rnb * rnb
                    imp = jnp.where(k > 0.0, -c / jnp.maximum(k, 1e-20), 0.0) * active
                    px, py = imp * nabx, imp * naby
                    body_ref[POSX, ia] = body_ref[POSX, ia] - inv_m[ia] * px
                    body_ref[POSY, ia] = body_ref[POSY, ia] - inv_m[ia] * py
                    body_ref[ANG, ia] = body_ref[ANG, ia] - inv_i[ia] * (rax * py - ray * px)
                    body_ref[POSX, ib] = body_ref[POSX, ib] + inv_m[ib] * px
                    body_ref[POSY, ib] = body_ref[POSY, ib] + inv_m[ib] * py
                    body_ref[ANG, ib] = body_ref[ANG, ib] + inv_i[ib] * (rby * px - rbx * py) * (-1.0)

            # island-wide minimum via min-propagation over touching links
            for _round in range(B - 1):
                changed = False
                for p in range(P):
                    ia, ib = ia_l[p], ib_l[p]
                    if not (dyn[ia] and dyn[ib]):
                        continue
                    link = A("link", p)
                    m = jnp.minimum(ms[ia], ms[ib])
                    ms[ia] = link * m + (1.0 - link) * ms[ia]
                    ms[ib] = link * m + (1.0 - link) * ms[ib]
                    changed = True
                if not changed:
                    break
            for b in range(B):
                if dyn[b]:
                    done_ref[b] = jnp.maximum(
                        done_ref[b], (ms[b] >= -3.0 * LINEAR_SLOP).astype(jnp.float32)
                    )
            return carry

        jax.lax.fori_loop(0, pos_iters, pos_iter, 0)

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

    kernel = _build_kernel(table, float(dt), int(vel_iters), int(pos_iters))

    # grid over env tiles: keep per-cell VMEM within ~8 MB (fewer grid cells
    # amortize loop overheads; the planes make up the whole working set)
    S_BLK = S
    while S_BLK > 1 and (17 * P + 9 * P * 2 + 2 * P * 2 + 6 * B + 2 * B) * S_BLK * LANES * 4 > 8 * 2**20:
        S_BLK //= 2
    grid = (S // S_BLK,)

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
        input_output_aliases={3: 0, 4: 1},  # body, imp updated in place
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
