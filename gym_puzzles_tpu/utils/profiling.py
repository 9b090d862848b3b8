"""Tracing/profiling helpers.

The reference has no profiling beyond wandb's tensorboard relay
(train/train.py:53).  Here: jax.profiler traces with the engine phases
pre-annotated via jax.named_scope (narrowphase / islands / velocity_solve /
position_solve / sleep in engine/world.py), dumped as TensorBoard-compatible
XPlane traces.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(profile_dir: str | None):
    """Profile the enclosed block when profile_dir is set; no-op otherwise.

        with profiling.trace("/tmp/tb"):
            env.step(...)
    """
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Rolling env-steps/s meter."""

    def __init__(self):
        self.t0 = time.time()
        self.steps = 0

    def add(self, n: int):
        self.steps += n

    def rate(self) -> float:
        dt = time.time() - self.t0
        return self.steps / dt if dt > 0 else 0.0

    def reset(self):
        self.t0 = time.time()
        self.steps = 0


def assert_deterministic(fn, *args, n: int = 2):
    """Debug-mode determinism sanitizer: run ``fn`` n times and assert
    bitwise-identical outputs (the SURVEY §5 'determinism is the sanitizer'
    plan).  Returns the first result."""
    import jax
    import numpy as np

    results = [jax.device_get(fn(*args)) for _ in range(n)]
    first = jax.tree_util.tree_leaves(results[0])
    for r in results[1:]:
        for a, b in zip(first, jax.tree_util.tree_leaves(r)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    return results[0]
