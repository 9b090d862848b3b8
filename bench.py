#!/usr/bin/env python
"""Headline benchmark: env-steps/s/chip on MultiRobotPuzzle-v0 with 4096
vectorized envs at the reference physics configuration (dt=0.02, 180
velocity / 60 position iterations -- multi_robot_puzzle_00.py:428).

Prints ONE JSON line:
    {"metric": "env_steps_per_s_per_chip", "value": N, "unit": "steps/s",
     "vs_baseline": N / 1e6, "repeats": R, "spread_pct": S,
     "floor": 4.2e6, "regression": bool}

``value`` is the median of R independent repeats (each repeat = best of
``iters`` timed chunks, the best-of discipline from rounds 1-4);
``spread_pct`` is (max-min)/median over the repeats, so round-over-round
drift can be classified against measured noise instead of eyeballed
(VERDICT r4 weak #4: the r3->r4 -1.1% drift was unclassifiable from a
single best-of run).  ``regression`` flags value < 4.2M, the asserted
floor under the recorded r1-r4 history (4.38-4.43M).

Baseline: the driver-defined north star of 1M env-steps/s/chip
(BASELINE.md; the reference itself publishes no numbers -- its DummyVecEnv
steps 6 Box2D worlds sequentially in Python).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax


def main(num_envs: int = 4096, chunk: int = 200, iters: int = 5,
         env_id: str = "MultiRobotPuzzle-v0", reset_mode: str = "fast"):
    from gym_puzzles_tpu.api.registry import make
    from gym_puzzles_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    # the fused Pallas backend (whole engine tick in one VMEM-resident
    # kernel) is the TPU throughput path
    backend = "fused" if num_envs % 128 == 0 else "xla"
    env = make(env_id, num_envs=num_envs, backend=backend,
               reset_mode=reset_mode)
    params = env.default_params()

    key = jax.random.key(0)
    vstate, obs = env.reset(key, params)

    actions = jax.random.uniform(
        jax.random.key(1), (chunk, num_envs, env.cfg.act_dim), minval=-1.0, maxval=1.0
    )

    @jax.jit
    def rollout_chunk(vstate, actions):
        def f(vs, a):
            vs, _obs, r, d, _ = env._step_fn(vs, a, params)
            return vs, (r.sum(), d.sum())

        vs, (rs, ds) = lax.scan(f, vstate, actions)
        return vs, rs.sum(), ds.sum()

    t0 = time.time()
    vstate, rsum, _ = rollout_chunk(vstate, actions)
    float(rsum)  # device_get: the only sync that truly waits on this runtime
    compile_s = time.time() - t0
    print(f"# compile+first chunk: {compile_s:.1f}s", file=sys.stderr)

    repeats = []
    for rep in range(3):
        best = 0.0
        for _ in range(iters):
            t0 = time.time()
            vstate, rsum, dsum = rollout_chunk(vstate, actions)
            float(rsum)  # force completion; block_until_ready alone can
            # return before remote execution finishes on this runtime
            dt = time.time() - t0
            rate = chunk * num_envs / dt
            best = max(best, rate)
            print(f"# chunk {chunk}x{num_envs} in {dt*1e3:.1f}ms -> "
                  f"{rate:,.0f} steps/s", file=sys.stderr)
        repeats.append(best)
        print(f"# repeat {rep}: best {best:,.0f} steps/s", file=sys.stderr)

    repeats.sort()
    median = repeats[len(repeats) // 2]
    spread_pct = 100.0 * (repeats[-1] - repeats[0]) / median
    floor = 4.2e6
    print(json.dumps({
        "metric": "env_steps_per_s_per_chip",
        "value": round(median, 1),
        "unit": "steps/s",
        "vs_baseline": round(median / 1e6, 4),
        "repeats": len(repeats),
        "spread_pct": round(spread_pct, 2),
        "floor": floor,
        "regression": median < floor,
    }))


if __name__ == "__main__":
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    env_id = sys.argv[2] if len(sys.argv) > 2 else "MultiRobotPuzzle-v0"
    reset_mode = sys.argv[3] if len(sys.argv) > 3 else "fast"
    main(num_envs=num_envs, env_id=env_id, reset_mode=reset_mode)
