#!/usr/bin/env python
"""Render a GIF of the scripted oracle pusher driving a v0-family env.

Visual debugging companion to docs/benchmarks/oracle_push.py: rolls the
hand-scripted herd-and-push controller (train/scripted.py) on one env and
rasterizes every Nth frame through render/raster.py's human-vision style
(reference rendering: multi_robot_puzzle_00.py:528-592).

    python docs/benchmarks/render_oracle.py --env MultiRobotPuzzleHeavy-v0 \
        --seed 3 --out /tmp/oracle_hv0.gif
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main(argv=None):
    p = argparse.ArgumentParser(description="GIF of the scripted oracle pusher")
    p.add_argument("--env", default="MultiRobotPuzzleHeavy-v0")
    p.add_argument("--seed", default=3, type=int)
    p.add_argument("--steps", default=900, type=int)
    p.add_argument("--every", default=6, type=int,
                   help="rasterize every Nth step")
    p.add_argument("--offset_px", default=70.0, type=float)
    p.add_argument("--controller", default="pusher", choices=["pusher", "planner"])
    p.add_argument("--out", default="/tmp/oracle.gif")
    args = p.parse_args(argv)

    from gym_puzzles_tpu.api.registry import make
    from gym_puzzles_tpu.render import render_state
    from gym_puzzles_tpu.train.scripted import planner_action, pusher_action
    from gym_puzzles_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    env = make(args.env, num_envs=1, auto_reset=False,
               reset_mode="reference", backend="xla")
    params = env.default_params()
    A = env.cfg.act_dim // 3
    vstate, obs = env.reset(jax.random.key(args.seed), params)
    step = jax.jit(env._step_fn)
    frames = []
    for t in range(args.steps):
        if args.controller == "planner":
            act = planner_action(obs, A)
        else:
            act = pusher_action(obs, A, args.offset_px)
        vstate, obs, _r, d, _ = step(vstate, act, params)
        if t % args.every == 0:
            one = jax.tree_util.tree_map(
                lambda x: np.asarray(x)[..., 0] if getattr(x, "ndim", 0) else x,
                vstate.env)
            frames.append(render_state(env.logic, one, mode="human_vision"))
        if bool(d[0]):
            print(f"completed at step {t}")
            break
    print(f"final block->goal dist {float(obs[0, 4 * A + 3]):.2f}")

    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(args.out, save_all=True, append_images=imgs[1:],
                 duration=80, loop=0)
    print(f"wrote {len(frames)} frames to {args.out}")


if __name__ == "__main__":
    main()
