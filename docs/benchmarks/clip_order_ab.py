#!/usr/bin/env python
"""A/B the b2Vec2::Normalize f32 operation order against the v0
contact-seed divergence saturation (VERDICT r4 next #4).

The one continuous-path rounding difference between
engine/narrowphase.py and b2CollidePolygons is the reference-edge
tangent normalize: Box2D multiplies by a reciprocal
(b2Vec2::Normalize -- invLength = 1/len; x *= invLength), the rebuild
divided.  GPT_B2_CLIP_ORDER=1 selects the Box2D order.  This script
reruns the full-horizon v0 drives (seed 1000 = the contact seed whose
obs divergence saturates at 0.54 px after first touch; seed 2000 = the
contact-free control at 6.6e-5 px) under both orders, in subprocesses so
the module flag is picked up at import:

    python docs/benchmarks/clip_order_ab.py \
        > docs/benchmarks/clip_order_ab_r5.jsonl
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))

CHILD = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.path.join({repo!r}, "docs", "benchmarks"))
from full_horizon_parity import drive
from gym_puzzles_tpu.utils import enable_compilation_cache
from gym_puzzles_tpu.engine import narrowphase
enable_compilation_cache()
for seed in (1000, 2000):
    row = drive("MultiRobotPuzzle-v0", seed, 2000)
    row["clip_order"] = ("b2_recip" if narrowphase.B2_RECIP_NORMALIZE
                         else "divide")
    print("ROW " + json.dumps(row), flush=True)
"""


def main():
    for flag in ("0", "1"):
        env = dict(os.environ)
        env["GPT_B2_CLIP_ORDER"] = flag
        proc = subprocess.run(
            [sys.executable, "-c", CHILD.format(repo=REPO)],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=3600)
        if proc.returncode != 0:
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"child failed (flag={flag})")
        for line in proc.stdout.splitlines():
            if line.startswith("ROW "):
                print(line[4:], flush=True)


if __name__ == "__main__":
    main()
