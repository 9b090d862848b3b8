"""Minimal legacy-gym (0.21) shim: just enough surface for the reference
envs at /root/reference to import and run headless as a parity oracle.
Test infrastructure only -- not part of the framework."""


class Env:
    metadata = {}

    def seed(self, seed=None):
        return [seed]

    def render(self, mode="human"):
        pass

    def close(self):
        pass


from gym import spaces, utils  # noqa: E402,F401
from gym.envs import registration  # noqa: E402,F401


def make(env_id, **kwargs):
    spec = registration.REGISTRY[env_id]
    import importlib

    mod_name, cls_name = spec["entry_point"].split(":")
    cls = getattr(importlib.import_module(mod_name), cls_name)
    return cls(**kwargs)
