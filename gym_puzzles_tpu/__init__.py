"""gym_puzzles_tpu: a TPU-native, batched reimplementation of the
khajash/gym_puzzles multi-robot block-pushing suite.

The reference (mounted read-only at /root/reference) is a set of Gym envs
over the Box2D C++ engine, stepped one env at a time from Python.  This
package replaces that stack with a jit-compiled JAX physics engine and pure
functional envs, vectorized with vmap and sharded over TPU meshes with
jax.sharding -- thousands of envs per chip in lockstep.

Quick start::

    import gym_puzzles_tpu as gpt
    env = gpt.make("MultiRobotPuzzle-v0", num_envs=4096)
    state, obs = env.reset(jax.random.key(0))
    state, obs, reward, done, info = env.step(state, actions)
"""

__version__ = "0.1.0"

__all__ = ["ENV_IDS", "make", "registry_spec", "__version__"]


def __getattr__(name):
    # Lazy: the engine subpackage is importable without pulling in the env /
    # api layers (and their jax trace-time work).
    if name in ("ENV_IDS", "make", "registry_spec"):
        from gym_puzzles_tpu.api import registry

        return getattr(registry, {"ENV_IDS": "ENV_IDS", "make": "make", "registry_spec": "registry_spec"}[name])
    raise AttributeError(name)
