from gym.envs import classic_control, registration  # noqa: F401
