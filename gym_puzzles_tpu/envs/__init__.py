"""Pure-functional env variants over the batched engine."""

from gym_puzzles_tpu.envs.config import VARIANTS, EnvConfig, RewardParams
from gym_puzzles_tpu.envs.common import EnvState

__all__ = ["VARIANTS", "EnvConfig", "RewardParams", "EnvState"]
