REGISTRY = {}


def register(id, entry_point, max_episode_steps=None, reward_threshold=None, **kw):
    REGISTRY[id] = {
        "entry_point": entry_point,
        "max_episode_steps": max_episode_steps,
        "reward_threshold": reward_threshold,
    }
