"""Test config: force JAX onto a virtual 8-device CPU platform so sharding
tests exercise a real Mesh without TPU hardware.

NOTE: in this image jax is pre-imported at interpreter start with
JAX_PLATFORMS=axon (a tunneled TPU), so setting the env var here is too
late -- the platform must be switched through jax.config before the first
backend touch.  XLA_FLAGS is still read at backend init, so the host device
count env var works as long as no jax computation ran yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from gym_puzzles_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
