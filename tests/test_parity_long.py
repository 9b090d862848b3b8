"""Long-horizon parity vs the reference (VERDICT r1 items 2/3 on the
bitwise north star): 500-step divergence curves, full-completion episodes,
and the solve-order invariance result.

Measured floor (docs/PARITY.md "long-horizon" section): Box2D is f32 C++
with its own instruction ordering, so exact bitwise equality is not
attainable from XLA-compiled arithmetic; what these tests pin instead is

* free motion: divergence is *flat at f32 round-off* (~3e-5 px over 500
  steps -- no growth at all),
* contact: divergence *saturates* (damping 5.0 contracts state; ~5e-3
  normalized units for v3) instead of growing chaotically,
* returns: episode-return parity to ~1e-4 relative on +/-10k-scale
  episodes,
* solve order: at the reference's 180/60 iteration counts, Gauss-Seidel
  converges far enough that contact ORDERING does not matter (ascending
  vs descending pair order both match Box2D to ~3e-3 m transient,
  ~1e-5 m sustained) -- so Box2D's island traversal order
  (b2World::Solve) need not be emulated; the static ascending pair list
  (engine/types.py) is already order-equivalent at these iteration
  counts.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tests.reference_oracle as oracle
from gym_puzzles_tpu.api.registry import _logic


def _drive_curve(env_id, inject_fn, n_steps, seed=0, goal=None,
                 update_params=None):
    """Step reference + rebuild from an injected common state; returns
    (obs_div[t], rew_div[t], ret_ref, ret_ours, done_ref, done_ours)."""
    np.random.seed(123)
    ref = oracle.make_reference(env_id)
    if update_params is not None:
        ref.update_params(*update_params)
    inject_fn(ref)

    logic = _logic(env_id)
    params = logic.default_params()
    if update_params is not None:
        params = params.update_params(*update_params)
    pos, ang = oracle.body_origin_poses(env_id, ref)
    if goal is None:
        if env_id.endswith("v0"):
            goal = [320.0, 262.5, 0.0]
        else:
            goal = logic.goal_norm
    state = logic.inject(pos, ang, np.asarray(goal, np.float32))
    step = jax.jit(logic.step)

    rng = np.random.RandomState(seed)
    obs_div, rew_div, flag_flips = [], [], []
    ret_r = ret_m = 0.0
    done_r = done_m = None
    for t in range(n_steps):
        a = rng.uniform(-1, 1, logic.cfg.act_dim)
        o_r, r_r, d_r, _ = ref.step(a.astype(np.float64))
        state, o_m, r_m, d_m, _ = step(state, jnp.asarray(a, jnp.float32), params)
        ret_r += float(r_r)
        ret_m += float(r_m)
        o_m64 = np.asarray(o_m, np.float64)
        o_r64 = np.asarray(o_r, np.float64)
        d = np.abs(o_m64 - o_r64)
        # angle components are unwrapped in the reference obs; when the two
        # sides cross the +/-pi boundary on different steps the raw diff
        # spikes to exactly 2*pi -- fold that equivalence out
        d = np.minimum(d, np.abs(d - 2.0 * np.pi))
        # boolean goal_contact components flicker near grazing contact --
        # a {0,1} vs {1,0} pair is a flag flip, tracked separately from
        # continuous-state divergence
        is_flag = (np.isin(o_m64, (0.0, 1.0)) & np.isin(o_r64, (0.0, 1.0))
                   & (d == 1.0))
        flag_flips.append(int(is_flag.sum()))
        obs_div.append(float(np.where(is_flag, 0.0, d).max()))
        rew_div.append(abs(float(r_m) - float(r_r)))
        if d_r or d_m:
            done_r, done_m = bool(d_r), bool(d_m)
            break
    return (np.array(obs_div), np.array(rew_div), ret_r, ret_m,
            done_r, done_m, np.array(flag_flips))


def test_v0_free_motion_500_steps_no_divergence_growth():
    """500 steps of contact-free motion: divergence must stay at f32
    round-off (measured 3.1e-5 px) with NO growth, and the 500-step return
    must match to absolute 0.05 on a ~1e4-magnitude return."""
    obs_div, rew_div, ret_r, ret_m, _, _, flips = _drive_curve(
        "MultiRobotPuzzle-v0",
        lambda e: oracle.inject_v0(e, (16.0, 12.0, 0.5),
                                   [(4.0, 4.0, 0.0), (4.0, 11.0, 0.0)]),
        n_steps=500,
    )
    assert len(obs_div) == 500  # neither side terminated
    assert flips.sum() == 0     # no contact at all in this scenario
    assert obs_div.max() < 5e-4          # px; measured 3.1e-5
    assert rew_div.max() < 5e-3          # measured 5.6e-5
    # flatness: the late curve is no worse than the early curve
    assert obs_div[250:].max() < 10 * max(obs_div[:50].max(), 1e-6)
    assert abs(ret_m - ret_r) < 0.05     # measured 0.003 on -10503.47
    assert abs(ret_m - ret_r) / abs(ret_r) < 1e-4


def test_v0_contact_completion_return_parity():
    """Adjacent-spawn push completes the puzzle on both sides at the same
    step with the +10000 bonus; returns match to 0.1."""
    obs_div, rew_div, ret_r, ret_m, done_r, done_m, _flips = _drive_curve(
        "MultiRobotPuzzle-v0",
        lambda e: oracle.inject_v0(e, (10.0, 8.0, 0.0),
                                   [(7.8, 8.0, 0.0), (10.0, 5.6, 0.0)]),
        n_steps=500,
    )
    assert done_r and done_m            # same-step completion
    assert ret_r > 9000 and ret_m > 9000
    assert abs(ret_m - ret_r) < 0.5     # measured 0.04 on +10002.6


def test_v3_contact_500_steps_divergence_saturates():
    """500 steps of sustained v3 contact: divergence saturates at ~5e-3
    normalized units (measured 4.7e-3) instead of growing -- damping 5.0
    contracts the flow, so early contact-order noise does not compound."""
    obs_div, rew_div, ret_r, ret_m, _, _, flips = _drive_curve(
        "MultiRobotPuzzle-v3",
        lambda e: oracle.inject_v3(e, (11.0, 8.0, 0.0),
                                   [(8.6, 8.0, 0.0), (11.0, 5.7, 0.0)]),
        n_steps=500,
    )
    assert len(obs_div) == 500
    assert obs_div.max() < 0.02          # normalized; measured 4.7e-3
    # saturation: the last 300 steps are no worse than the first 100
    assert obs_div[200:].max() <= obs_div[:100].max() * 1.5 + 1e-6
    # grazing-contact flag flickers are transient disagreements, bounded
    assert (flips > 0).sum() <= 20       # steps (of 500) with a flag flip
    assert abs(ret_m - ret_r) < 2.0      # measured 1.0 (4 flicker-steps
    #                                      x the 0.25 contact bonus)


# ---------------------------------------------------------------------------
# full-episode return parity under reference spawns, all five variants
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("env_id", [
    "MultiRobotPuzzle-v0", "MultiRobotPuzzleHeavy-v0",
    "MultiRobotPuzzle-v2", "MultiRobotPuzzleHeavy-v2",
    "MultiRobotPuzzle-v3",
])
def test_full_episode_return_parity(env_id):
    """Drive a 400-step episode from the reference's OWN spawn distribution
    (np.random-seeded, mirrored into the rebuild via inject) with a shared
    random action stream, and compare total returns.  Measured: relative
    return differences of 0-3e-4 across the five variants (v0 3e-4 with a
    spawn-contact transient, v2/Heavy-v2 ~0, v3 2e-4); asserted at 2e-3.
    Reference spawn distributions: 00.py:311-315,366-367; 02.py:303-361;
    core.py:212-232.

    Horizon: the v2 variants' XLA step unrolls 180/60 solver iterations
    over 53 contact pairs, which executes at ~6 s/step on this 2-vCPU CI
    host — the full 400-step drive costs ~40 min PER v2 variant.
    Heavy-v0 (5 agents -> ~55 contact pairs) costs about the same.  CI
    runs those slow variants (both v2s + Heavy-v0) at 120 steps (still
    covers spawn, sustained contact, and the shaped-reward stream);
    RUN_SLOW_PARITY=1 restores the full 400-step drive, which is how the
    docs/PARITY.md numbers were measured."""
    import os

    np.random.seed(1000)  # seeds the reference's global-np.random spawns
    ref = oracle.make_reference(env_id)
    is_v2 = env_id.endswith("v2")
    # Heavy-v0's XLA step (5 agents -> ~55 contact pairs) costs as much as
    # v2's on this CI host, so it gets the same reduced default horizon;
    # RUN_SLOW_PARITY=1 restores the full 400-step drives the docs/PARITY
    # numbers were measured at.
    is_slow_variant = is_v2 or env_id == "MultiRobotPuzzleHeavy-v0"
    n_steps = 400
    if is_slow_variant and not os.environ.get("RUN_SLOW_PARITY"):
        n_steps = 120
    if is_v2:
        ref.update_params(0, 0.997)  # quirk #7: v2 needs update_params
    pos, ang = oracle.body_origin_poses(env_id, ref)
    bp = (pos[4][0], pos[4][1], ang[4])
    aps = [(pos[5 + i][0], pos[5 + i][1], ang[5 + i])
           for i in range(len(pos) - 5)]
    logic = _logic(env_id)
    if env_id.endswith("v3"):
        oracle.inject_v3(ref, bp, aps)
        goal = logic.goal_norm
    elif is_v2:
        goal = np.asarray(ref.block_final_pos[ref.goal_block.userData],
                          np.float32)
        oracle.inject_v2(ref, bp, aps, goal)
    else:
        oracle.inject_v0(ref, bp, aps)
        goal = np.array([320.0, 262.5, 0.0], np.float32)
    params = logic.default_params()
    if is_v2:
        params = params.update_params(0, 0.997)
    state = logic.inject(pos, ang, goal)
    step = jax.jit(logic.step)

    rng = np.random.RandomState(0)
    ret_r = ret_m = 0.0
    done_r = done_m = None
    for t in range(n_steps):
        a = rng.uniform(-1, 1, logic.cfg.act_dim)
        o_r, r_r, d_r, _ = ref.step(a.astype(np.float64))
        state, o_m, r_m, d_m, _ = step(state, jnp.asarray(a, jnp.float32),
                                       params)
        ret_r += float(r_r)
        ret_m += float(r_m)
        if d_r or bool(d_m):
            done_r, done_m = bool(d_r), bool(d_m)
            break
    assert done_r == done_m, (done_r, done_m)
    # done_r/done_m stay None when NEITHER side terminated inside the
    # horizon -- the parity assertion is then "both ran the full drive".
    # Make the coverage explicit in the log so a slow-gated 400-step run
    # records whether termination parity was actually exercised.
    print(f"{env_id}: steps={t + 1} terminated={done_r is not None} "
          f"ret_ref={ret_r:.2f} ret_ours={ret_m:.2f}")
    rel = abs(ret_m - ret_r) / max(abs(ret_r), 1.0)
    assert rel < 2e-3, (ret_r, ret_m, rel)


# ---------------------------------------------------------------------------
# solve-order invariance (the island-traversal question from VERDICT item 2)
# ---------------------------------------------------------------------------

_DT, _VI, _PI = 1.0 / 50.0, 180, 60
_T_BOXES = [(0.5, 0.5, 0.0, -0.5), (1.5, 0.5, 0.0, 0.5)]
_AGENT_POLY = [(-0.25, -0.75), (0.25, -0.75), (0.75, -0.25), (0.75, 0.25),
               (0.25, 0.75), (-0.25, 0.75), (-0.75, 0.25), (-0.75, -0.25)]


def _order_exp(n_steps=150):
    import tests.oracle as orc
    from gym_puzzles_tpu.engine import shapes as shp
    from gym_puzzles_tpu.engine import world as eng
    from gym_puzzles_tpu.engine.types import (BodySpec, FixtureSpec,
                                              build_shape_table)

    w = orc.make_world()
    blk = orc.add_box_body(w, (5.0, 5.0), 0.0, _T_BOXES, 5.0, 0.999,
                           linear_damping=5.0, angular_damping=5.0)
    ags = []
    for (x, y) in [(2.745, 5.5), (5.0, 3.245)]:
        a = w.CreateDynamicBody(position=(x, y), angle=0.0,
                                linearDamping=5.0, angularDamping=5.0)
        a.CreatePolygonFixture(vertices=_AGENT_POLY, density=0.0, friction=0.2)
        ags.append(a)
    ref = []
    for _ in range(n_steps):
        ags[0].linearVelocity = (4 / 3.0, 0.0)
        ags[0].angularVelocity = 0.0
        ags[1].linearVelocity = (0.0, 4 / 3.0)
        ags[1].angularVelocity = 0.0
        w.Step(_DT, _VI, _PI)
        ref.append(orc.world_state([blk] + ags))
    ref = np.stack(ref)

    blk_spec = BodySpec(
        fixtures=[FixtureSpec(vertices=shp.box_vertices(hx, hy, (cx, cy)),
                              density=5.0, friction=0.999)
                  for hx, hy, cx, cy in _T_BOXES],
        linear_damping=5.0, angular_damping=5.0)

    def ag_spec():
        return BodySpec(
            fixtures=[FixtureSpec(vertices=np.array(_AGENT_POLY),
                                  density=0.0, friction=0.2, from_hull=True)],
            linear_damping=5.0, angular_damping=5.0)

    table = build_shape_table([blk_spec, ag_spec(), ag_spec()])

    def permute_pairs(tb, perm):
        perm = np.asarray(perm)
        return dataclasses.replace(
            tb,
            pair_fix_a=tb.pair_fix_a[perm], pair_fix_b=tb.pair_fix_b[perm],
            pair_body_a=tb.pair_body_a[perm], pair_body_b=tb.pair_body_b[perm],
            pair_friction=tb.pair_friction[perm],
            pair_restitution=tb.pair_restitution[perm])

    def run(tb):
        bodies = eng.init_bodies(
            tb, np.array([(5.0, 5.0), (2.745, 5.5), (5.0, 3.245)]), np.zeros(3))
        contacts = eng.init_contacts(tb)
        zf = np.zeros((3, 2), np.float32)
        zt = np.zeros(3, np.float32)
        wake = np.array([False, True, True])

        @jax.jit
        def stepfn(b, c):
            b = b.replace(
                vel=b.vel.at[1].set(jnp.array([4 / 3.0, 0.0]))
                         .at[2].set(jnp.array([0.0, 4 / 3.0])),
                omega=b.omega.at[1].set(0.0).at[2].set(0.0))
            return eng.step(tb, b, c, zf, zt, wake, _DT, _VI, _PI)

        out = []
        for _ in range(n_steps):
            bodies, contacts, _info = stepfn(bodies, contacts)
            out.append(np.concatenate(
                [np.asarray(bodies.pos), np.asarray(bodies.angle)[:, None],
                 np.asarray(bodies.vel), np.asarray(bodies.omega)[:, None]],
                axis=1))
        return np.stack(out)

    P = table.num_pairs
    errs = {}
    for name, perm in [("ascending", list(range(P))),
                       ("descending", list(range(P))[::-1])]:
        traj = run(permute_pairs(table, perm))
        errs[name] = np.abs(traj[:, :, :2] - ref[:, :, :2]).max(axis=(1, 2))
    return errs


def test_solve_order_invariance_at_reference_iterations():
    """At 180/60 iterations Gauss-Seidel converges hard enough that contact
    solve ORDER is immaterial: both ascending and descending pair orders
    track Box2D's sustained two-agent push to <2e-3 m transient / <1e-4 m
    in sustained contact.  This is the measured closure of the 'island
    traversal order' divergence hypothesis (engine/solver.py:23-27): order
    emulation is NOT the parity lever at reference iteration counts."""
    errs = _order_exp(n_steps=150)
    for name, err in errs.items():
        assert err.max() < 5e-3, f"{name}: transient {err.max():.2e}"
        # sustained contact (after the first-touch transient)
        assert err[100:].max() < 1e-3, f"{name}: sustained {err[100:].max():.2e}"
        assert err[-1] < 5e-4, f"{name}: final {err[-1]:.2e}"
