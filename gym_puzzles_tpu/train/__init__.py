from gym_puzzles_tpu.train.ppo import PPO, PPOConfig, TrainState

__all__ = ["PPO", "PPOConfig", "TrainState"]
