"""Persistent XLA compilation cache.

The engine's fixed-iteration solver (180 velocity / 60 position iterations,
unrolled over the static pair list) produces large HLO; first compilation
takes tens of seconds.  The program is identical across processes for a
given variant, so the on-disk cache turns every later startup into a hit.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get(
        "GPT_COMPILATION_CACHE", os.path.expanduser("~/.cache/gym_puzzles_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
