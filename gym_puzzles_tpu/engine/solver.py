"""Sequential-impulse contact solver (b2ContactSolver + b2Island semantics).

Single-env functions over tiny [B]/[P] arrays; the env batch is vmapped on
top.  The constraint loop is Python-unrolled over the *static* pair list, so
every body index is a compile-time constant and XLA sees straight-line vector
code over the batch -- the TPU-native replacement for Box2D's pointer-chasing
contact graph.

Fidelity notes (all verified against the box2d-py oracle in tests):
* velocity solve order: per contact, friction per point first, then normal
  (2x2 block solver with Box2D's four-case LCP enumeration when the manifold
  has 2 well-conditioned points, else per-point clamped accumulation);
* warm starting with dtRatio=1 (fixed dt, reference uses constant 1/50 s:
  multi_robot_puzzle_00.py:428);
* Baumgarte position correction (0.2) with slop 0.005, max correction 0.2,
  and the per-island early exit once minSeparation >= -3*slop -- reproduced
  with per-island done masks so extra iterations are exact no-ops;
* island masking: contacts whose dynamic endpoints are asleep are not
  solved (Box2D only builds islands from awake bodies);
* integrate-position clamps (maxTranslation 2.0, maxRotation pi/2) write the
  clamped velocities back, as b2Island does.

The solver iterates pairs in static pair-list order.  Box2D iterates each
island's contacts in traversal order; with the handful of simultaneous
contacts these envs produce the difference is below the parity tolerances
(documented divergence, see tests/test_engine.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax

from gym_puzzles_tpu.engine import math2d as m2
from gym_puzzles_tpu.engine import narrowphase as nph
from gym_puzzles_tpu.engine.shapes import LINEAR_SLOP
from gym_puzzles_tpu.engine.types import ShapeTable

BAUMGARTE = 0.2
MAX_LINEAR_CORRECTION = 0.2
MAX_TRANSLATION = 2.0
MAX_ROTATION = 0.5 * jnp.pi
VELOCITY_THRESHOLD = 1.0
MAX_CONDITION_NUMBER = 1000.0

# Sleep constants (b2Settings): sleeping is ACTIVE in box2d-py 2.3.5 -- the
# binding's doSleep=False flag is ignored by the vendored C++ (verified
# empirically: a slow body sleeps at exactly b2_timeToSleep), so the
# reference envs run with sleeping on and the rebuild reproduces it.
LINEAR_SLEEP_TOL_SQ = 0.01**2
ANGULAR_SLEEP_TOL_SQ = (2.0 / 180.0 * 3.14159265358979) ** 2
TIME_TO_SLEEP = 0.5


@struct.dataclass
class VelocityConstraints:
    """Stacked per-pair constraint data ([P, ...])."""

    normal: object  # [P, 2]
    r_a: object  # [P, 2(points), 2]
    r_b: object  # [P, 2, 2]
    normal_mass: object  # [P, 2] per-point 1/k_ii
    tangent_mass: object  # [P, 2]
    bias: object  # [P, 2]
    k11: object  # [P]
    k12: object  # [P]
    k22: object  # [P]
    im11: object  # [P] block inverse
    im12: object  # [P]
    im22: object  # [P]
    count: object  # [P] effective point count (post conditioning degrade)
    solve: object  # [P] bool: pair is in an awake island
    normal_impulse: object  # [P, 2] accumulated
    tangent_impulse: object  # [P, 2]


def compute_islands(table: ShapeTable, touching):
    """Connected components over *dynamic* bodies linked by touching
    contacts (static walls do not merge islands, mirroring b2World::Solve's
    island traversal that never expands through static bodies).

    Returns integer labels [B]: min body index in the component; static
    bodies keep their own index.

    Implemented as statically-unrolled min-propagation over the pair list
    (no adjacency matrix, no scatters: XLA scatters serialize on TPU and
    cost milliseconds at batch)."""
    B = table.num_bodies
    dyn = ~table.is_static  # numpy [B]
    both_dyn = dyn[table.pair_body_a] & dyn[table.pair_body_b]  # numpy [P]
    links = [
        (int(table.pair_body_a[p]), int(table.pair_body_b[p]), p)
        for p in range(table.num_pairs)
        if both_dyn[p]
    ]

    labels = list(jnp.arange(B, dtype=jnp.int32))
    # diameter <= number of dynamic bodies; each round is a full in-order
    # sweep so convergence is fast, but bound by B for exactness
    rounds = int(dyn.sum())
    for _ in range(max(1, rounds)):
        for ia, ib, p in links:
            lnk = touching[p]
            m = jnp.minimum(labels[ia], labels[ib])
            labels[ia] = jnp.where(lnk, m, labels[ia])
            labels[ib] = jnp.where(lnk, m, labels[ib])
    return jnp.stack(labels)


def propagate_wake(table: ShapeTable, labels, awake, sleep_time):
    """Island wake propagation: every dynamic body sharing an island with an
    awake body is woken (b2World::Solve flags all island members awake).
    Waking resets the sleep timer (b2Body::SetAwake(true))."""
    B = table.num_bodies
    # one-hot [B(body), B(island-id)] form instead of scatter-max + gather
    # (scatter/gather on island labels miscompiles under batched fusion on
    # XLA CPU -- see solve_position_constraints -- and the one-hot
    # contraction is the faster TPU form anyway)
    oh = labels[:, None] == jnp.arange(B)[None, :]
    island_awake = jnp.any(oh & awake[:, None], axis=0)  # [B] per island id
    new_awake = jnp.any(oh & island_awake[None, :], axis=1) & jnp.asarray(~table.is_static)
    woke = new_awake & ~awake
    sleep_time = jnp.where(woke, 0.0, sleep_time)
    return new_awake, sleep_time


def init_velocity_constraints(
    table: ShapeTable, man: nph.Manifold, pos, angle, vel, omega,
    matched_n, matched_t, active,
) -> VelocityConstraints:
    """b2ContactSolver::InitializeVelocityConstraints over all pairs.

    ``pos`` is the world COM [B,2]; manifold transforms need body origins.
    ``active`` [B] marks awake dynamic bodies; pairs without an active
    dynamic endpoint are excluded from the solve.
    """
    ia = table.pair_body_a  # numpy, static
    ib = table.pair_body_b
    q = m2.rot(angle)  # [B, 2]
    origin = m2.body_origin(pos, q, table.local_center)

    normal, points, _seps = jax.vmap(nph.world_manifold)(
        man, origin[ia], q[ia], origin[ib], q[ib]
    )  # [P,2], [P,2,2]

    c_a = pos[ia]  # [P, 2] world centers
    c_b = pos[ib]
    r_a = points - c_a[:, None, :]
    r_b = points - c_b[:, None, :]

    m_a = table.inv_mass[ia][:, None]  # [P,1] numpy constants
    m_b = table.inv_mass[ib][:, None]
    i_a = table.inv_inertia[ia][:, None]
    i_b = table.inv_inertia[ib][:, None]

    rn_a = m2.cross_vv(r_a, normal[:, None, :])  # [P,2]
    rn_b = m2.cross_vv(r_b, normal[:, None, :])
    k_normal = m_a + m_b + i_a * rn_a**2 + i_b * rn_b**2
    normal_mass = jnp.where(k_normal > 0.0, 1.0 / k_normal, 0.0)

    tangent = jnp.stack([normal[:, 1], -normal[:, 0]], axis=-1)  # cross(n, 1)
    rt_a = m2.cross_vv(r_a, tangent[:, None, :])
    rt_b = m2.cross_vv(r_b, tangent[:, None, :])
    k_tangent = m_a + m_b + i_a * rt_a**2 + i_b * rt_b**2
    tangent_mass = jnp.where(k_tangent > 0.0, 1.0 / k_tangent, 0.0)

    # Relative normal velocity for restitution bias.
    dv = (
        vel[ib][:, None, :]
        + m2.cross_sv(omega[ib][:, None], r_b)
        - vel[ia][:, None, :]
        - m2.cross_sv(omega[ia][:, None], r_a)
    )
    v_rel = m2.dot(dv, normal[:, None, :])
    restitution = table.pair_restitution[:, None]
    bias = jnp.where(v_rel < -VELOCITY_THRESHOLD, -restitution * v_rel, 0.0)

    # 2-point block matrix + conditioning degrade.
    k11 = k_normal[:, 0]
    k22 = k_normal[:, 1]
    k12 = (
        m_a[:, 0]
        + m_b[:, 0]
        + i_a[:, 0] * rn_a[:, 0] * rn_a[:, 1]
        + i_b[:, 0] * rn_b[:, 0] * rn_b[:, 1]
    )
    det = k11 * k22 - k12 * k12
    cond_ok = k11 * k11 < MAX_CONDITION_NUMBER * det
    count = jnp.where((man.count == 2) & ~cond_ok, 1, man.count)

    inv_det = jnp.where(det != 0.0, 1.0 / det, 0.0)
    im11 = inv_det * k22
    im12 = -inv_det * k12
    im22 = inv_det * k11

    solve = (man.count > 0) & (active[ia] | active[ib])

    return VelocityConstraints(
        normal=normal,
        r_a=r_a,
        r_b=r_b,
        normal_mass=normal_mass,
        tangent_mass=tangent_mass,
        bias=bias,
        k11=k11,
        k12=k12,
        k22=k22,
        im11=im11,
        im12=im12,
        im22=im22,
        count=count,
        solve=solve,
        normal_impulse=matched_n,
        tangent_impulse=matched_t,
    )


def warm_start(table: ShapeTable, vc: VelocityConstraints, vel, omega,
               unroll: bool = False):
    """Apply accumulated impulses (b2ContactSolver::WarmStart), masked to the
    effective point count and to solved pairs.

    The pair loops here and below run through :func:`_foreach_pair`: scan
    with dynamic indices by default (small HLO, test-friendly), statically
    unrolled for the TPU throughput path (engine config ``solver_unroll``)."""
    if table.num_pairs == 0:
        return vel, omega

    def body(carry, row, p):
        vel, omega = carry
        n, r_a, r_b, n_imp, t_imp, count, solve = row
        ia, ib = _g(table.pair_body_a, p), _g(table.pair_body_b, p)
        m_a, m_b = _g(table.inv_mass, ia), _g(table.inv_mass, ib)
        i_a, i_b = _g(table.inv_inertia, ia), _g(table.inv_inertia, ib)
        t = jnp.stack([n[1], -n[0]])
        for j in range(2):
            mask = solve & (j < count)
            imp = jnp.where(mask, n_imp[j], 0.0)
            timp = jnp.where(mask, t_imp[j], 0.0)
            impulse = imp * n + timp * t
            vel = vel.at[ia].add(-m_a * impulse)
            omega = omega.at[ia].add(-i_a * m2.cross_vv(r_a[j], impulse))
            vel = vel.at[ib].add(m_b * impulse)
            omega = omega.at[ib].add(i_b * m2.cross_vv(r_b[j], impulse))
        return vel, omega

    xs = (vc.normal, vc.r_a, vc.r_b, vc.normal_impulse, vc.tangent_impulse,
          vc.count, vc.solve)
    vel, omega = _foreach_pair(body, (vel, omega), xs, table.num_pairs, unroll)
    return vel, omega


def _rel_vel(vel, omega, ia, ib, r_a, r_b):
    return (
        vel[ib]
        + m2.cross_sv(omega[ib], r_b)
        - vel[ia]
        - m2.cross_sv(omega[ia], r_a)
    )


def solve_velocity_constraints(table: ShapeTable, vc: VelocityConstraints, vel, omega,
                               iters: int, unroll: bool = False):
    """b2ContactSolver::SolveVelocityConstraints x iters, Gauss-Seidel over
    the static pair list (see warm_start note), batched over envs by the
    caller's vmap."""
    P = table.num_pairs
    if P == 0:
        return vel, omega, vc

    def pair_step(carry, row, p):
        vel, omega, n_imp_all, t_imp_all = carry
        (n, r_a, r_b, normal_mass, tangent_mass, bias,
         k11, k12, k22, im11, im12, im22, count, solve) = row
        ia, ib = _g(table.pair_body_a, p), _g(table.pair_body_b, p)
        friction = _g(table.pair_friction, p)
        m_a, m_b = _g(table.inv_mass, ia), _g(table.inv_mass, ib)
        i_a, i_b = _g(table.inv_inertia, ia), _g(table.inv_inertia, ib)
        t = jnp.stack([n[1], -n[0]])
        cnt = jnp.where(solve, count, 0)
        n_imp = n_imp_all[p]
        t_imp = t_imp_all[p]

        # --- friction, per point, using current normal impulse bound
        for j in range(2):
            active = j < cnt
            dv = _rel_vel(vel, omega, ia, ib, r_a[j], r_b[j])
            vt = m2.dot(dv, t)
            lam = tangent_mass[j] * (-vt)
            max_f = friction * n_imp[j]
            new_imp = jnp.clip(t_imp[j] + lam, -max_f, max_f)
            lam = jnp.where(active, new_imp - t_imp[j], 0.0)
            t_imp = t_imp.at[j].add(lam)
            impulse = lam * t
            vel = vel.at[ia].add(-m_a * impulse)
            omega = omega.at[ia].add(-i_a * m2.cross_vv(r_a[j], impulse))
            vel = vel.at[ib].add(m_b * impulse)
            omega = omega.at[ib].add(i_b * m2.cross_vv(r_b[j], impulse))

        # --- normal: single point
        dv0 = _rel_vel(vel, omega, ia, ib, r_a[0], r_b[0])
        vn0 = m2.dot(dv0, n)
        lam0 = -normal_mass[0] * (vn0 - bias[0])
        new0 = jnp.maximum(n_imp[0] + lam0, 0.0)
        d_single = new0 - n_imp[0]

        # --- normal: 2x2 block solver (Box2D case enumeration)
        a1 = n_imp[0]
        a2 = n_imp[1]
        dv1 = dv0
        dv2 = _rel_vel(vel, omega, ia, ib, r_a[1], r_b[1])
        vn1 = vn0
        vn2 = m2.dot(dv2, n)
        b1 = vn1 - bias[0] - (k11 * a1 + k12 * a2)
        b2 = vn2 - bias[1] - (k12 * a1 + k22 * a2)

        x1_1 = -(im11 * b1 + im12 * b2)
        x2_1 = -(im12 * b1 + im22 * b2)
        ok1 = (x1_1 >= 0.0) & (x2_1 >= 0.0)
        x1_2 = -normal_mass[0] * b1
        vn2_2 = k12 * x1_2 + b2
        ok2 = (x1_2 >= 0.0) & (vn2_2 >= 0.0)
        x2_3 = -normal_mass[1] * b2
        vn1_3 = k12 * x2_3 + b1
        ok3 = (x2_3 >= 0.0) & (vn1_3 >= 0.0)
        ok4 = (b1 >= 0.0) & (b2 >= 0.0)

        x1 = jnp.where(ok1, x1_1, jnp.where(ok2, x1_2, 0.0))
        x2 = jnp.where(ok1, x2_1, jnp.where(ok3, x2_3, 0.0))
        applied = ok1 | ok2 | ok3 | ok4
        d1_blk = jnp.where(applied, x1 - a1, 0.0)
        d2_blk = jnp.where(applied, x2 - a2, 0.0)

        use_block = cnt == 2
        one_active = cnt == 1
        d1 = jnp.where(use_block, d1_blk, jnp.where(one_active, d_single, 0.0))
        d2 = jnp.where(use_block, d2_blk, 0.0)

        n_imp_all = n_imp_all.at[p, 0].add(d1)
        n_imp_all = n_imp_all.at[p, 1].add(d2)
        t_imp_all = t_imp_all.at[p].set(t_imp)
        p1 = d1 * n
        p2 = d2 * n
        vel = vel.at[ia].add(-m_a * (p1 + p2))
        omega = omega.at[ia].add(
            -i_a * (m2.cross_vv(r_a[0], p1) + m2.cross_vv(r_a[1], p2))
        )
        vel = vel.at[ib].add(m_b * (p1 + p2))
        omega = omega.at[ib].add(
            i_b * (m2.cross_vv(r_b[0], p1) + m2.cross_vv(r_b[1], p2))
        )
        return vel, omega, n_imp_all, t_imp_all

    xs = (vc.normal, vc.r_a, vc.r_b,
          vc.normal_mass, vc.tangent_mass, vc.bias, vc.k11, vc.k12, vc.k22,
          vc.im11, vc.im12, vc.im22, vc.count, vc.solve)

    def one_iteration(_, carry):
        return _foreach_pair(pair_step, carry, xs, P, unroll)

    vel, omega, n_imp, t_imp = lax.fori_loop(
        0, iters, one_iteration, (vel, omega, vc.normal_impulse, vc.tangent_impulse)
    )
    return vel, omega, vc.replace(normal_impulse=n_imp, tangent_impulse=t_imp)


def _g(np_const, idx):
    """Gather from a small numpy constant table (static python int -> numpy
    scalar constant; traced index -> dynamic gather)."""
    if isinstance(idx, (int, np.integer)):
        return np_const[idx]
    return jnp.asarray(np_const)[idx]


def _foreach_pair(body, carry, xs, num_pairs: int, unroll: bool):
    """Run ``body(carry, xs[p], p) -> carry`` over the pair axis.

    ``unroll=False``: lax.scan with dynamic indices -- small HLO, but on TPU
    every iteration's gathers/scatters round-trip HBM (memory-latency bound).
    ``unroll=True``: Python unroll with *static* indices -- ~P x larger HLO
    and compile time, but XLA fuses the whole iteration into VMEM-resident
    code, which is what the throughput path needs.
    """
    if not unroll:
        def scan_body(c, row_p):
            row, p = row_p
            return body(c, row, p), None

        carry, _ = lax.scan(scan_body, carry, (xs, jnp.arange(num_pairs)))
        return carry
    for p in range(num_pairs):
        row = jax.tree_util.tree_map(lambda x: x[p], xs)
        carry = body(carry, row, p)
    return carry


def integrate_positions(pos, angle, vel, omega, dt, active):
    """b2Island position integration with translation/rotation clamps; the
    clamped velocities are written back.  Sleeping bodies don't move."""
    translation = dt * vel
    t2 = m2.dot(translation, translation)
    scale = jnp.where(
        t2 > MAX_TRANSLATION**2, MAX_TRANSLATION / jnp.sqrt(jnp.maximum(t2, 1e-30)), 1.0
    )
    vel = vel * scale[:, None]
    rotation = dt * omega
    rscale = jnp.where(
        rotation**2 > MAX_ROTATION**2, MAX_ROTATION / jnp.abs(rotation), 1.0
    )
    omega = omega * rscale
    act = active[:, None]
    return (
        jnp.where(act, pos + dt * vel, pos),
        jnp.where(active, angle + dt * omega, angle),
        vel,
        omega,
    )


def solve_position_constraints(
    table: ShapeTable, man: nph.Manifold, pos, angle, iters: int, solve_mask, labels,
    unroll: bool = False,
):
    """b2ContactSolver::SolvePositionConstraints x iters with b2Island's
    early exit (minSeparation >= -3*slop) reproduced *per island* via done
    masks indexed by island label.

    The per-island done/min-sep bookkeeping uses one-hot [P,B] masks, not
    ``done[isl]`` gathers / ``.at[isl].min`` scatters: besides being the
    TPU-friendly form, the scatter-min inside the fori_loop is miscompiled
    by XLA CPU (jax 0.9.0) when the step is vmapped over a batch >= 2 and
    fused with the upstream program -- the done latch never engages and 60
    Baumgarte iterations push grazing contacts ~0.2 m (vs one compiled at
    batch 1, or the same ops compiled in isolation, which are correct).

    Returns (pos, angle, island_position_solved [B] keyed by label)."""
    P = table.num_pairs
    B = table.num_bodies
    local_center = table.local_center  # numpy, static
    # island id of a pair: label of its dynamic endpoint (body_a if dynamic)
    pick_a = ~table.is_static[table.pair_body_a]  # numpy [P]
    pair_body = np.where(pick_a, table.pair_body_a, table.pair_body_b)  # static
    pair_island = labels[pair_body]  # [P] traced values, static indices
    island_oh = pair_island[:, None] == jnp.arange(B)[None, :]  # [P,B]

    if P == 0:
        return pos, angle, jnp.ones((B,), bool)

    lc = local_center  # numpy

    def pair_step(carry, row, p):
        pos, angle, done, min_sep = carry
        man_p, oh, solve = row  # oh [B]: one-hot of this pair's island
        ia, ib = _g(table.pair_body_a, p), _g(table.pair_body_b, p)
        m_a, m_b = _g(table.inv_mass, ia), _g(table.inv_mass, ib)
        i_a, i_b = _g(table.inv_inertia, ia), _g(table.inv_inertia, ib)
        pair_done = jnp.any(done & oh) | ~solve
        # b2ContactSolver computes the transforms ONCE per contact; point 1
        # reuses the pre-point-0 transform (only the centers cA/aA-derived
        # lever arms see the updated positions)
        q_a = m2.rot(angle[ia])
        q_b = m2.rot(angle[ib])
        org_a = pos[ia] - m2.rot_vec(q_a, _g(lc, ia))
        org_b = pos[ib] - m2.rot_vec(q_b, _g(lc, ib))
        for j in range(2):
            active = (j < man_p.count) & ~pair_done
            track = (j < man_p.count) & solve
            normal, point, separation = nph.position_solver_manifold(
                man_p, org_a, q_a, org_b, q_b, j
            )
            min_sep = jnp.minimum(min_sep, jnp.where(oh & track, separation, 0.0))
            r_a = point - pos[ia]
            r_b = point - pos[ib]
            c = jnp.clip(
                BAUMGARTE * (separation + LINEAR_SLOP), -MAX_LINEAR_CORRECTION, 0.0
            )
            rn_a = m2.cross_vv(r_a, normal)
            rn_b = m2.cross_vv(r_b, normal)
            k = m_a + m_b + i_a * rn_a**2 + i_b * rn_b**2
            impulse = jnp.where((k > 0.0) & active, -c / k, 0.0)
            pimp = impulse * normal
            pos = pos.at[ia].add(-m_a * pimp)
            angle = angle.at[ia].add(-i_a * m2.cross_vv(r_a, pimp))
            pos = pos.at[ib].add(m_b * pimp)
            angle = angle.at[ib].add(i_b * m2.cross_vv(r_b, pimp))
        return pos, angle, done, min_sep

    def one_iteration(_, carry):
        pos, angle, done = carry
        min_sep = jnp.zeros((B,))
        pos, angle, done, min_sep = _foreach_pair(
            pair_step,
            (pos, angle, done, min_sep),
            (man, island_oh, solve_mask),
            P,
            unroll,
        )
        done = done | (min_sep >= -3.0 * LINEAR_SLOP)
        return pos, angle, done

    pos, angle, done = lax.fori_loop(
        0,
        iters,
        one_iteration,
        (pos, angle, jnp.zeros((B,), bool)),
    )
    return pos, angle, done


def update_sleep(table: ShapeTable, labels, awake, sleep_time, vel, omega, dt,
                 position_solved):
    """End-of-step sleep bookkeeping (b2Island::Solve tail).

    Awake dynamic bodies moving below the sleep tolerances accumulate sleep
    time; when every body in an island has slept >= TIME_TO_SLEEP and the
    island's position solve converged, the whole island is put to sleep with
    velocities zeroed."""
    B = table.num_bodies
    dyn = jnp.asarray(~table.is_static)
    active = awake & dyn

    fast = (m2.dot(vel, vel) > LINEAR_SLEEP_TOL_SQ) | (omega**2 > ANGULAR_SLEEP_TOL_SQ)
    sleep_time = jnp.where(active, jnp.where(fast, 0.0, sleep_time + dt), sleep_time)

    # per-island min sleep time over active dynamic bodies; one-hot form
    # instead of scatter-min + gather (see propagate_wake note)
    oh = labels[:, None] == jnp.arange(B)[None, :]  # [B(body), B(island-id)]
    vals = jnp.where(active, sleep_time, jnp.inf)
    island_min = jnp.min(jnp.where(oh, vals[:, None], jnp.inf), axis=0)  # [B] per id
    body_island_min = jnp.min(jnp.where(oh, island_min[None, :], jnp.inf), axis=1)
    body_pos_solved = jnp.any(oh & position_solved[None, :], axis=1)
    goes_to_sleep = (body_island_min >= TIME_TO_SLEEP) & body_pos_solved & active

    awake = awake & ~goes_to_sleep
    vel = jnp.where(goes_to_sleep[:, None], 0.0, vel)
    omega = jnp.where(goes_to_sleep, 0.0, omega)
    sleep_time = jnp.where(goes_to_sleep, 0.0, sleep_time)
    return awake, sleep_time, vel, omega


def jax_tree_index(tree, i):
    """Index every leaf of a pytree along axis 0 (static index)."""
    return jax.tree_util.tree_map(lambda x: x[i], tree)
