def colorize(string, color, bold=False, highlight=False):
    return string


from gym.utils import seeding  # noqa: E402,F401
