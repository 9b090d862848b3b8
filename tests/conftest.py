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

import jax

if os.environ.get("GPT_TPU_TESTS"):
    # keep the real TPU backend: for running the hardware-gated tests
    # (e.g. tests/test_fused_numerics.py::test_fused_bitwise_on_tpu) --
    # run selected files only; the 8-device mesh tests need the CPU mesh
    pass
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

from gym_puzzles_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
