"""De-risking ``check_vma=False`` in the distributed train step (VERDICT r1
item 4 / weak #7).

``DistributedPPO`` disables shard_map's varying-manifest checker, so a
miscompile that lets a supposedly-replicated value silently diverge across
devices would otherwise be invisible.  Two independent guards:

* ``test_shard_map_step_matches_vmap_oracle`` -- the SAME inner function
  (``PPO._build_train_step(axis_name=...)``) is evaluated two ways: under
  ``jax.shard_map`` over a real 4-device mesh, and under
  ``jax.vmap(..., axis_name=...)``, which gives *identical* collective
  semantics (psum / pmean / axis_index over the mapped axis) as one batched
  un-sharded program.  Any shard_map windowing/replication miscompile shows
  up as a numeric mismatch against the vmap oracle.

* ``test_replicated_state_stays_replicated_over_steps`` -- three real
  train steps on the mesh, asserting after each that every leaf whose spec
  is replicated (``P()``) is bitwise identical across all addressable
  shards: params, optimizer state, normalizer moments, PRNG key, hparams,
  counters.

Reference relation: the reference has no distribution at all (DummyVecEnv,
train/train.py:80); these tests guard the rebuild's replacement semantics,
not a reference behavior.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gym_puzzles_tpu.parallel.mesh import DistributedPPO, make_mesh
from gym_puzzles_tpu.train.ppo import PPOConfig

N_DEV = 4


def _cfg(**kw):
    base = dict(env_id="MultiRobotPuzzle-v0", n_envs=8, n_steps=4,
                batch_size=8, n_epochs=2, seed=3)
    base.update(kw)
    return PPOConfig(**base)


def _is_spec(x):
    return isinstance(x, P)


def _sharded_dim(spec):
    for i, name in enumerate(spec):
        if name is not None:
            return i
    return None


def _stack_shards(specs, ts, n_dev):
    """Global TrainState -> leading-device-axis stacked pytree, exactly the
    per-device windows shard_map hands to the inner function."""

    def stack(spec, leaf):
        d = _sharded_dim(spec)
        if d is None:
            return jnp.stack([leaf] * n_dev)
        size = leaf.shape[d] // n_dev
        slc = [
            leaf[(slice(None),) * d + (slice(i * size, (i + 1) * size),)]
            for i in range(n_dev)
        ]
        return jnp.stack(slc)

    return jax.tree_util.tree_map(stack, specs, ts, is_leaf=_is_spec)


def _cmp_leaf(name, spec, got, want_stacked):
    """Compare a distributed-output leaf against the vmap oracle's stacked
    output for the same leaf."""
    if jnp.issubdtype(got.dtype, jax.dtypes.prng_key):
        got = jax.random.key_data(got)
        want_stacked = jax.random.key_data(want_stacked)
        spec = P(*spec, None)
    d = _sharded_dim(spec)
    got = np.asarray(got)
    want = np.asarray(want_stacked)
    if d is None:
        # replicated output: every oracle row must agree, then match
        for i in range(1, want.shape[0]):
            np.testing.assert_array_equal(want[0], want[i], err_msg=name)
        want0 = want[0]
    else:
        # sharded output: reassemble the global value by concatenating the
        # per-device rows along the sharded dim
        want0 = np.concatenate(list(want), axis=d)
    if np.issubdtype(got.dtype, np.floating):
        np.testing.assert_allclose(got, want0, rtol=2e-5, atol=1e-6,
                                   err_msg=name)
    else:
        np.testing.assert_array_equal(got, want0, err_msg=name)


def test_shard_map_step_matches_vmap_oracle():
    mesh = make_mesh(N_DEV)
    algo = DistributedPPO(_cfg(), mesh)
    ts = algo.init_state()
    # init_state is deterministic in cfg.seed: a second call is an exact
    # copy, surviving the donated train_step call below
    host_ts = algo.init_state()
    new_ts, metrics = algo.train_step(ts)

    axis = mesh.axis_names[0]
    inner = algo.ppo._build_train_step(axis_name=axis, n_devices=N_DEV)
    stacked = _stack_shards(algo._in_specs, host_ts, N_DEV)
    o_ts, o_metrics = jax.jit(jax.vmap(inner, axis_name=axis))(stacked)

    paths_specs = jax.tree_util.tree_flatten(algo._in_specs,
                                             is_leaf=_is_spec)[0]
    got_leaves, treedef = jax.tree_util.tree_flatten(new_ts)
    want_leaves = jax.tree_util.tree_flatten(o_ts)[0]
    names = [str(p) for p, _ in jax.tree_util.tree_flatten_with_path(new_ts)[0]]
    assert len(paths_specs) == len(got_leaves) == len(want_leaves)
    for name, spec, got, want in zip(names, paths_specs, got_leaves,
                                     want_leaves):
        _cmp_leaf(name, spec, got, want)

    # metrics are replicated (out_specs P()): oracle rows agree and match
    for k in metrics:
        want = np.asarray(o_metrics[k])
        for i in range(1, want.shape[0]):
            np.testing.assert_array_equal(want[0], want[i], err_msg=k)
        np.testing.assert_allclose(np.asarray(metrics[k]), want[0],
                                   rtol=2e-5, atol=1e-6, err_msg=k)


def test_realistic_shard_shape_1024_envs():
    """VERDICT r3 weak #4: the tiny-shape tests (n_envs=8) can't surface
    layout/windowing bugs in the lane-major [..., E] sharding.  Drive
    DistributedPPO at a realistic shard shape -- 1024 envs over all 8
    virtual devices = 128 env lanes per device (the Pallas LANES tile
    width the TPU path shards at) -- for 3 train steps, asserting:

    * env-state leaves are genuinely sharded (8 addressable shards per
      leaf, global trailing dim 1024),
    * replicated leaves (params, opt state, normalizer, key, counters)
      stay bitwise identical across all shards after every step,
    * metrics stay finite and the timestep accounting matches the global
      batch.
    """
    n_dev = 8
    mesh = make_mesh(n_dev)
    algo = DistributedPPO(
        _cfg(n_envs=1024, n_steps=8, batch_size=2048, n_epochs=1), mesh)
    ts = algo.init_state()
    specs = jax.tree_util.tree_flatten(algo._in_specs, is_leaf=_is_spec)[0]

    # the env batch really is sharded over the mesh
    pos = ts.vstate.env.bodies.pos
    assert pos.shape[-1] == 1024
    assert len(pos.addressable_shards) == n_dev
    assert pos.addressable_shards[0].data.shape[-1] == 1024 // n_dev

    for step in range(3):
        ts, metrics = algo.train_step(ts)
        m = jax.device_get(metrics)
        assert np.isfinite(m["loss"]), step
        assert np.isfinite(m["value_loss"]), step
        leaves = jax.tree_util.tree_leaves(ts)
        names = [str(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(ts)[0]]
        for name, spec, leaf in zip(names, specs, leaves):
            if _sharded_dim(spec) is not None:
                d = _sharded_dim(spec)
                assert leaf.shape[d] % n_dev == 0, name
                assert len(leaf.addressable_shards) == n_dev, name
                continue
            if jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
                leaf = jax.random.key_data(leaf)
            shards = [np.asarray(s.data) for s in leaf.addressable_shards]
            for s in shards[1:]:
                np.testing.assert_array_equal(
                    shards[0], s,
                    err_msg=f"step {step}: replicated leaf {name} diverged")
    assert int(jax.device_get(ts.timesteps)) == 3 * 1024 * 8


def test_replicated_state_stays_replicated_over_steps():
    mesh = make_mesh(N_DEV)
    algo = DistributedPPO(_cfg(n_epochs=1), mesh)
    ts = algo.init_state()
    specs = jax.tree_util.tree_flatten(algo._in_specs, is_leaf=_is_spec)[0]
    for step in range(3):
        ts, metrics = algo.train_step(ts)
        leaves = jax.tree_util.tree_leaves(ts)
        names = [str(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(ts)[0]]
        assert len(specs) == len(leaves)
        for name, spec, leaf in zip(names, specs, leaves):
            if _sharded_dim(spec) is not None:
                continue
            if jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
                leaf = jax.random.key_data(leaf)
            shards = [np.asarray(s.data) for s in leaf.addressable_shards]
            assert len(shards) == N_DEV, name
            for s in shards[1:]:
                np.testing.assert_array_equal(
                    shards[0], s,
                    err_msg=f"step {step}: replicated leaf {name} diverged")
        assert np.isfinite(float(np.asarray(metrics["loss"])))
