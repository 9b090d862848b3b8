from gym_puzzles_tpu.utils.cache import enable_compilation_cache

__all__ = ["enable_compilation_cache"]
