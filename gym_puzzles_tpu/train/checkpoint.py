"""Checkpoint/resume via orbax.

The reference checkpoints two artifacts: the SB3 model zip and the
VecNormalize statistics pickle (train/train.py:148-149), reloaded with
``PPO.load`` / ``VecNormalize.load`` (train.py:86-92, test.py:66-68).  Here
the whole :class:`TrainState` pytree -- params, optimizer state, normalizer
statistics, env-batch state and PRNG keys -- is one orbax checkpoint, so a
restore continues the *exact* trajectory (tested in tests/test_train.py).
"""

from __future__ import annotations

import pathlib

import jax
import orbax.checkpoint as ocp


def step_count(timesteps) -> int:
    """The TrainState timesteps counter is a device int32 and wraps
    negative past 2^31 env steps (first hit by a 2.4B-step Heavy-v0
    campaign: the checkpoint saved under step -1895825408).  Reinterpret
    as uint32 at every host boundary -- checkpoint labels, logs, eval
    metadata -- which keeps labels positive and counts exact to 2^32."""
    import numpy as np

    return int(np.asarray(timesteps).astype(np.int64) & 0xFFFFFFFF)


def save(path, train_state, step: int):
    path = pathlib.Path(path).absolute()
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(train_state))
        mgr.wait_until_finished()


def restore(path, template, step: int | None = None):
    """template: a TrainState with the right structure/shapes (e.g. from
    PPO.init_state())."""
    path = pathlib.Path(path).absolute()
    with ocp.CheckpointManager(path) as mgr:
        if step is None:
            step = mgr.latest_step()
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))


def restore_policy(path, template, step: int | None = None):
    """Restore ONLY the policy-relevant state -- network params, the obs/ret
    normalizer moments -- into a TrainState built at a *different* env batch
    size (the eval analogue of the reference's PPO.load + VecNormalize.load
    with training=False, test.py:66-74).  Env-batch-shaped leaves (env
    state, per-env returns, PRNG keys) keep the template's values, so a
    checkpoint trained at 4096 envs evaluates in a 1-env harness."""
    import numpy as np

    path = pathlib.Path(path).absolute()
    if step is None:
        step = latest_step(path)
    # Restore as plain numpy via the checkpoint's own metadata tree: ignores
    # the saved device shardings, so a checkpoint written on TPU at 4096
    # envs restores on CPU (or any platform) at its saved shapes.
    item = path / str(step) / "default"
    ckptr = ocp.PyTreeCheckpointer()
    meta_tree = ckptr.metadata(item).item_metadata.tree
    leaves, treedef = jax.tree_util.tree_flatten(meta_tree)
    restore_args = jax.tree_util.tree_unflatten(
        treedef, [ocp.RestoreArgs(restore_type=np.ndarray) for _ in leaves]
    )
    raw = ckptr.restore(item, args=ocp.args.PyTreeRestore(restore_args=restore_args))
    norm = template.normalizer
    saved_norm = raw["normalizer"]

    def graft(rms, saved):
        return rms.replace(
            mean=jax.numpy.asarray(saved["mean"]),
            var=jax.numpy.asarray(saved["var"]),
            count=jax.numpy.asarray(saved["count"]),
        )

    return template.replace(
        params=jax.tree_util.tree_map(jax.numpy.asarray, raw["params"]),
        normalizer=norm.replace(
            obs_rms=graft(norm.obs_rms, saved_norm["obs_rms"]),
            ret_rms=graft(norm.ret_rms, saved_norm["ret_rms"]),
        ),
        timesteps=jax.numpy.asarray(raw["timesteps"]),
    )


def latest_step(path):
    path = pathlib.Path(path).absolute()
    with ocp.CheckpointManager(path) as mgr:
        return mgr.latest_step()
