"""Env-level smoke + invariant tests for all five registered variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_puzzles_tpu as gpt

ALL_IDS = list(gpt.ENV_IDS)

EXPECT_DIMS = {  # SURVEY.md §8.14 empirical anchors
    "MultiRobotPuzzle-v0": (28, 6),
    "MultiRobotPuzzleHeavy-v0": (40, 15),
    "MultiRobotPuzzle-v2": (39, 4),
    "MultiRobotPuzzleHeavy-v2": (39, 4),
    "MultiRobotPuzzle-v3": (27, 6),
}


@pytest.mark.parametrize("env_id", ALL_IDS)
def test_reset_step_shapes(env_id):
    E = 4
    env = gpt.make(env_id, num_envs=E)
    obs_dim, act_dim = EXPECT_DIMS[env_id]
    assert env.cfg.obs_dim == obs_dim and env.cfg.act_dim == act_dim

    vstate, obs = env.reset(jax.random.key(0))
    assert obs.shape == (E, obs_dim)
    assert np.isfinite(np.asarray(obs)).all()

    key = jax.random.key(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        action = jax.random.uniform(k, (E, act_dim), minval=-1, maxval=1)
        vstate, obs, reward, done, info = env.step(vstate, action)
        assert obs.shape == (E, obs_dim)
        assert reward.shape == (E,)
        assert done.shape == (E,)
        assert np.isfinite(np.asarray(obs)).all()
        assert np.isfinite(np.asarray(reward)).all()


@pytest.mark.parametrize("env_id", ["MultiRobotPuzzle-v0", "MultiRobotPuzzle-v2", "MultiRobotPuzzle-v3"])
def test_determinism(env_id):
    """Same key + same actions => bitwise identical trajectories."""
    E = 2
    env = gpt.make(env_id, num_envs=E)
    act_dim = env.cfg.act_dim
    actions = jax.random.uniform(jax.random.key(7), (5, E, act_dim), minval=-1, maxval=1)

    def rollout():
        vstate, obs = env.reset(jax.random.key(3))
        tot = [np.asarray(obs)]
        for t in range(5):
            vstate, obs, r, d, _ = env.step(vstate, actions[t])
            tot.append(np.asarray(obs))
        return np.concatenate(tot)

    a, b = rollout(), rollout()
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("env_id", ["MultiRobotPuzzle-v0"])
def test_vmap_invariance(env_id):
    """A batch of identical states steps identically to a single env."""
    from gym_puzzles_tpu.api import registry

    logic = registry._logic(env_id)
    params = logic.default_params()
    state, obs = logic.reset(jax.random.key(0), params)
    action = jax.random.uniform(jax.random.key(1), (logic.cfg.act_dim,), minval=-1, maxval=1)

    s1, o1, r1, d1, _ = jax.jit(logic.step)(state, action, params)

    E = 3
    batch = jax.tree_util.tree_map(lambda x: jnp.stack([x] * E), state)
    actions = jnp.stack([action] * E)
    sB, oB, rB, dB, _ = jax.jit(jax.vmap(logic.step, in_axes=(0, 0, None)))(
        batch, actions, params
    )
    for e in range(E):
        np.testing.assert_array_equal(np.asarray(oB[e]), np.asarray(o1))
        np.testing.assert_array_equal(np.asarray(rB[e]), np.asarray(r1))


def test_v3_constructor_surface():
    """make() exposes RobotPuzzleBase's kwargs (core.py:86-93): num_agents
    and heavy reshape the world; goal_velocity/block_density/hardmode are
    accepted-and-ignored (quirk #12)."""
    env = gpt.make(
        "MultiRobotPuzzle-v3", num_envs=2, num_agents=3, heavy=True,
        goal_velocity=2.0, block_density=7.0, hardmode=True,
    )
    assert env.cfg.obs_dim == 4 * 3 + 3 + 16 and env.cfg.act_dim == 9
    vstate, obs = env.reset(jax.random.key(0))
    assert obs.shape == (2, 31)
    action = jax.random.uniform(jax.random.key(1), (2, 9), minval=-1, maxval=1)
    vstate, obs, reward, done, _ = env.step(vstate, action)
    assert np.isfinite(np.asarray(obs)).all()

    # dead params change nothing (same cached logic object)
    from gym_puzzles_tpu.api import registry

    assert registry._logic("MultiRobotPuzzle-v3", False, "t", 3, True,
                           None, None, None, None, None) is env.logic

    # v0/v2 reject the v3-only surface, like the reference's no-arg ctors
    with pytest.raises(ValueError):
        gpt.make("MultiRobotPuzzle-v0", num_envs=1, num_agents=3)


def test_v2_spawn_branches():
    """make() exposes the v2 file's dead spawn branches (SIMPLE/ANYWHERE
    module constants, 02.py:61-62,304-320,349-360): simple=False places the
    block uniformly in the middle third with random agent headings and the
    0.3 goal border; anywhere=True spawns agents across the full width."""
    from gym_puzzles_tpu.api.registry import _logic

    E = 64
    env = gpt.make("MultiRobotPuzzle-v2", num_envs=E, simple=False,
                   anywhere=True)
    logic = env.logic
    lay = logic.layout
    w, h = lay.world_w, lay.world_h
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        jax.random.key(3), jnp.arange(E))
    bodies, goals = jax.vmap(logic._spawn)(keys)
    bpos = np.asarray(bodies.pos[:, lay.block_slot])       # [E, 2]
    apos = np.asarray(bodies.pos[:, lay.agent_slots[0]])   # [E, 2]
    aang = np.asarray(bodies.angle[:, lay.agent_slots[0]])
    # block in the middle third (02.py:318-320), not pinned to the center
    assert (bpos[:, 0] > w / 3).all() and (bpos[:, 0] < 2 * w / 3).all()
    # genuinely random within the band (x band is w/3-0.6 ~ 0.26 m wide)
    assert np.ptp(bpos[:, 0]) > 0.15 and np.ptp(bpos[:, 1]) > 0.4
    # agents beyond the left third (ANYWHERE), random headings (not SIMPLE)
    assert apos[:, 0].max() > w / 3
    assert np.ptp(aang) > 1.0
    # goal border 0.3 (non-SIMPLE, 02.py:305-306): unnormalized x bounds
    from gym_puzzles_tpu.envs.config import V2_RATIO

    gx = np.asarray(goals[:, 0]) / V2_RATIO
    assert (gx >= w * 2 / 3 + 0.3 - 1e-4).all()
    assert (gx <= w - 0.3 + 1e-4).all()
    # this seed draws goals inside the SIMPLE-forbidden 0.1 bands,
    # witnessing the wider non-SIMPLE range (deterministic, fixed key)
    assert gx.max() > w - 0.4 or gx.min() < w * 2 / 3 + 0.4

    # default env unchanged: SIMPLE block pinned at the center (bodies.pos
    # is the COM = origin + R(angle)*localCenter, so recover the origin)
    env_d = gpt.make("MultiRobotPuzzle-v2", num_envs=4)
    bodies_d, _ = jax.vmap(env_d.logic._spawn)(keys[:4])
    bp = np.asarray(bodies_d.pos[:, lay.block_slot])
    ang = np.asarray(bodies_d.angle[:, lay.block_slot])
    lc = np.asarray(lay.table.local_center[lay.block_slot])
    c, s = np.cos(ang), np.sin(ang)
    ox = bp[:, 0] - (c * lc[0] - s * lc[1])
    oy = bp[:, 1] - (s * lc[0] + c * lc[1])
    assert np.allclose(ox, w / 2, atol=1e-5) and np.allclose(oy, h / 2, atol=1e-5)

    # distinct cached logic objects; v0/v3 reject the surface
    assert _logic("MultiRobotPuzzle-v2") is not logic
    with pytest.raises(ValueError):
        gpt.make("MultiRobotPuzzle-v0", num_envs=1, simple=False)
    with pytest.raises(ValueError):
        gpt.make("MultiRobotPuzzle-v3", num_envs=1, anywhere=True)


def test_reference_reset_mode():
    env = gpt.make("MultiRobotPuzzle-v0", num_envs=2, reset_mode="reference")
    vstate, obs = env.reset(jax.random.key(0))
    assert np.isfinite(np.asarray(obs)).all()
    # reference reset already took one random step; episode clock still 0
    assert int(np.asarray(vstate.env.t).max()) == 0


def test_update_params_and_goal():
    from gym_puzzles_tpu.envs.config import RewardParams

    p = RewardParams.default("v2")
    p2 = p.update_params(timestep=100, decay=0.999)
    # decay**(-t) with decay<1 grows
    assert float(p2.shaped_puzzle_reward) > float(p.puzzle_complete_reward)
    p3 = p.update_goal(epoch=0, nb_epochs=10, base_epsilon=0.1)
    assert float(p3.scaled_epsilon) == pytest.approx(0.2)
