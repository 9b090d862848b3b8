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


def latest_step(path):
    path = pathlib.Path(path).absolute()
    with ocp.CheckpointManager(path) as mgr:
        return mgr.latest_step()
