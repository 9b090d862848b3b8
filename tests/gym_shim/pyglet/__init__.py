"""Stub pyglet for headless reference import (test infrastructure only)."""


class _Anything:
    def __getattr__(self, name):
        return _Anything()

    def __call__(self, *a, **k):
        return _Anything()


gl = _Anything()
window = _Anything()
image = _Anything()
