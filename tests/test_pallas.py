"""Pallas solver kernel vs the XLA solver: same states, same actions, same
results (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.random as jr

from gym_puzzles_tpu.engine import solver_pallas

solver_pallas.INTERPRET = True  # CPU tests run the kernel interpreted

from gym_puzzles_tpu.api.registry import _logic  # noqa: E402


@pytest.mark.parametrize("env_id", ["MultiRobotPuzzle-v0"])
def test_step_batched_matches_vmapped_step(env_id):
    """Random spawns, one step.  The kernel computes the same algorithm with
    different f32 association, so deep spawn-overlap resolution (a chaotic
    process -- Box2D itself diverges from any reimplementation there) can
    amplify rounding; we assert tight agreement on the bulk and bounded,
    finite behavior everywhere."""
    logic = _logic(env_id)
    params = logic.default_params()
    E = 128  # one lane tile

    keys = jr.split(jr.key(0), E)
    state, _obs = jax.jit(
        jax.vmap(logic.reset_fast, in_axes=(0, None), out_axes=-1)
    )(keys, params)

    step_ref = jax.jit(jax.vmap(logic.step, in_axes=(-1, -1, None), out_axes=-1))
    step_pl = jax.jit(logic.step_batched)

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.uniform(-1, 1, (logic.cfg.act_dim, E)), jnp.float32)
    s_ref, o_ref, r_ref, d_ref, _ = step_ref(state, a, params)
    s_pl, o_pl, r_pl, d_pl, _ = step_pl(state, a, params)

    assert np.isfinite(np.asarray(o_pl)).all()
    d = np.abs(np.asarray(s_pl.bodies.pos) - np.asarray(s_ref.bodies.pos)).max(axis=(0, 1))
    # no-contact columns must agree to round-off; overall bounded
    touch = np.asarray(s_ref.contacts.touching).any(axis=0)
    np.testing.assert_array_less(d[~touch], 1e-4)
    assert np.median(d) < 1e-3
    assert d.max() < 2.0  # bounded even through chaotic overlap resolution
    np.testing.assert_array_equal(
        np.asarray(s_pl.bodies.awake), np.asarray(s_ref.bodies.awake)
    )


def test_multi_cell_grid_matches_single_cell():
    """Force a 2-cell env grid (MAX_S_BLK=1 at E=256) and compare against
    the single-cell launch.  Pins the non-aliased copy-in path: aliasing the
    state buffers in place is miscompiled on multi-cell grids (Mosaic
    miswindows aliased inputs), which silently corrupted every env at
    batch sizes where the plane budget split the batch -- e.g. v2/Heavy at
    4096 envs -- until the kernel switched to copy-in for grids > 1."""
    logic = _logic("MultiRobotPuzzle-v0")
    params = logic.default_params()
    E = 256  # S = 2 sublane tiles

    keys = jr.split(jr.key(7), E)
    state, _obs = jax.jit(
        jax.vmap(logic.reset_fast, in_axes=(0, None), out_axes=-1)
    )(keys, params)
    a = jnp.asarray(
        np.random.RandomState(1).uniform(-1, 1, (logic.cfg.act_dim, E)), jnp.float32
    )

    s_one, o_one, r_one, d_one, _ = jax.jit(logic.step_batched)(state, a, params)
    solver_pallas.MAX_S_BLK = 1
    try:
        s_two, o_two, r_two, d_two, _ = jax.jit(logic.step_batched)(state, a, params)
    finally:
        solver_pallas.MAX_S_BLK = None

    np.testing.assert_allclose(
        np.asarray(s_two.bodies.pos), np.asarray(s_one.bodies.pos), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(o_two), np.asarray(o_one), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(d_two), np.asarray(d_one))


def test_fused_step_traces():
    """The fused whole-step kernel (engine/step_pallas.py) traces with the
    right output structure.  Numerics run in tests/test_fused_numerics.py
    (REF_STATE interpret mode on CPU; bitwise vs step_batched on TPU)."""
    logic = _logic("MultiRobotPuzzle-v0")
    params = logic.default_params()
    E = 128
    keys = jr.split(jr.key(0), E)
    state, _obs = jax.jit(
        jax.vmap(logic.reset_fast, in_axes=(0, None), out_axes=-1)
    )(keys, params)
    a = jnp.zeros((logic.cfg.act_dim, E), jnp.float32)
    s, obs, reward, done, info = jax.eval_shape(logic.step_fused, state, a, params)
    assert obs.shape == (logic.cfg.obs_dim, E)
    assert reward.shape == (E,)
    assert done.dtype == jnp.bool_
    ref = jax.eval_shape(logic.step_batched, state, a, params)
    assert jax.tree_util.tree_structure(s) == jax.tree_util.tree_structure(ref[0])


@pytest.mark.parametrize(
    "agent_x, act_mag",
    [
        (7.748, 0.0),   # non-penetrating resting contact (gap 2mm < slop)
        (7.76, 0.0),    # 1cm overlap, static resolution
        (7.748, 0.25),  # gentle sustained push
        (7.748, 1.0),   # full-speed sustained push
    ],
)
def test_injected_contact_tight(agent_x, act_mag):
    """Injected contact scenarios WITHOUT deep spawn overlap: the pallas
    solver must match the XLA solver to near round-off -- measured max
    divergence over these scenarios is 4.8e-7 m / 6e-8 N*s after 8 steps,
    so a 1mm regression at a single contact is a loud CI failure.  (The
    earlier statistical 85%-quantile envelope lives on only in the
    random-spawn test above, where deep-overlap resolution is genuinely
    chaotic.)  Scenario: agent face-on against the T-block's wide box
    (block face x=8.5, octagon half-extent 0.75)."""
    logic = _logic("MultiRobotPuzzle-v0")
    params = logic.default_params()
    E = 128

    base = logic.inject(
        np.array([[0.0, 8.0], [21.33, 8.0], [10.67, 0.0], [10.67, 16.0],
                  [10.0, 8.0], [agent_x, 8.0], [10.0, 5.6]]),
        np.zeros(7),
        np.array([320.0, 262.5, 0.0], np.float32),
    )
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[..., None], x.shape + (E,)), base
    )

    step_ref = jax.jit(jax.vmap(logic.step, in_axes=(-1, -1, None), out_axes=-1))
    step_pl = jax.jit(logic.step_batched)
    a = jnp.broadcast_to(
        jnp.array([act_mag, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32)[:, None],
        (6, E),
    )
    s_ref = s_pl = state
    for _ in range(8):
        s_ref, o_ref, _r, _, _ = step_ref(s_ref, a, params)
        s_pl, o_pl, _r, _, _ = step_pl(s_pl, a, params)
    assert bool(np.asarray(s_ref.contacts.touching).any()), "no contact formed"
    d_pos = np.abs(
        np.asarray(s_pl.bodies.pos) - np.asarray(s_ref.bodies.pos)
    ).max()
    d_imp = np.abs(
        np.asarray(s_pl.contacts.normal_impulse)
        - np.asarray(s_ref.contacts.normal_impulse)
    ).max()
    d_obs = np.abs(np.asarray(o_pl) - np.asarray(o_ref)).max()
    assert d_pos < 1e-5, d_pos   # measured 4.8e-7
    assert d_imp < 1e-5, d_imp   # measured 6.0e-8
    assert d_obs < 1e-3, d_obs   # pixel-scale obs; measured 3.1e-5
    np.testing.assert_array_equal(
        np.asarray(s_pl.contacts.man.ids), np.asarray(s_ref.contacts.man.ids)
    )
