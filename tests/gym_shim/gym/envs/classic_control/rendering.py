"""Headless no-op stand-ins for the removed pyglet rendering module
(imported at module level by the reference's robot.py:3 / blocks.py:4)."""


class _Geom:
    def add_attr(self, *a, **k):
        return self


class Viewer:
    def __init__(self, width, height):
        self.width = width
        self.height = height

    def set_bounds(self, *a):
        pass

    def draw_polygon(self, *a, **k):
        return _Geom()

    def draw_polyline(self, *a, **k):
        return _Geom()

    def draw_circle(self, *a, **k):
        return _Geom()

    def render(self, return_rgb_array=False):
        return None

    def close(self):
        pass


class Transform:
    def __init__(self, translation=(0, 0)):
        self.translation = translation


class LineStyle:
    def __init__(self, style=True):
        self.style = style
