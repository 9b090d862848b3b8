from gym_puzzles_tpu.api.registry import ENV_IDS, make, registry_spec

__all__ = ["ENV_IDS", "make", "registry_spec"]
