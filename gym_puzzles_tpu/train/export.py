"""Export a slim, committable policy checkpoint from a full TrainState one.

The trainer's orbax checkpoint carries the WHOLE TrainState -- including the
env-batch state (16384-env pytrees are tens of MB), which is what makes
exact resume possible (tests/test_train.py) but too heavy to commit as an
evidence artifact.  Evaluation only consumes the policy-relevant subset
(``checkpoint.restore_policy``: net params, obs/ret normalizer moments,
timesteps -- the reference's model zip + VecNormalize pickle pair,
train/train.py:148-149).  This tool re-saves exactly that subset, in the
same orbax tree layout ``restore_policy`` reads, so a slim checkpoint
evaluates identically and survives in git:

    python -m gym_puzzles_tpu.train.export \
        --checkpoint models/v0_r4/MultiRobotPuzzle-v0 \
        --out checkpoints/v0_r4/MultiRobotPuzzle-v0
"""

from __future__ import annotations

import pathlib

import numpy as np

import jax
import orbax.checkpoint as ocp

from gym_puzzles_tpu.train import checkpoint as ckpt


def load_policy_subtree(path, step: int | None = None):
    """Raw numpy {params, normalizer{obs_rms, ret_rms}, timesteps} subtree
    of a saved checkpoint (full or already-slim)."""
    path = pathlib.Path(path).absolute()
    if step is None:
        step = ckpt.latest_step(path)
    item = path / str(step) / "default"
    ckptr = ocp.PyTreeCheckpointer()
    meta_tree = ckptr.metadata(item).item_metadata.tree
    leaves, treedef = jax.tree_util.tree_flatten(meta_tree)
    restore_args = jax.tree_util.tree_unflatten(
        treedef, [ocp.RestoreArgs(restore_type=np.ndarray) for _ in leaves]
    )
    raw = ckptr.restore(item, args=ocp.args.PyTreeRestore(restore_args=restore_args))
    rms = lambda r: {k: r[k] for k in ("mean", "var", "count")}  # noqa: E731
    return {
        "params": raw["params"],
        "normalizer": {
            "obs_rms": rms(raw["normalizer"]["obs_rms"]),
            "ret_rms": rms(raw["normalizer"]["ret_rms"]),
        },
        "timesteps": raw["timesteps"],
    }, int(step)


def export(checkpoint_path, out_path, step: int | None = None) -> int:
    slim, step = load_policy_subtree(checkpoint_path, step)
    ckpt.save(out_path, slim, step)
    return step


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--checkpoint", required=True,
                   help="full TrainState checkpoint dir written by the trainer")
    p.add_argument("--out", required=True, help="slim output checkpoint dir")
    p.add_argument("--step", default=None, type=int)
    args = p.parse_args(argv)
    step = export(args.checkpoint, args.out, args.step)
    print(f"exported policy subset of {args.checkpoint} (step {step}) -> {args.out}")


if __name__ == "__main__":
    main()
