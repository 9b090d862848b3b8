"""ctypes binding for the C++ rasterizer core (builds on import if the
shared library is missing and a compiler is available)."""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SO = _DIR / "libgptraster.so"

if not _SO.exists():
    try:
        subprocess.run(["make", "-C", str(_DIR)], check=True, capture_output=True)
    except Exception as e:  # pragma: no cover
        raise ImportError(f"native rasterizer unavailable: {e}")

_lib = ctypes.CDLL(str(_SO))
_lib.gpt_fill_polygon.argtypes = [
    ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ctypes.c_void_p, ctypes.c_int,
    ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
]
_lib.gpt_fill_circle.argtypes = [
    ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
    ctypes.c_int, ctypes.c_float,
]
_lib.gpt_draw_line.argtypes = [
    ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8, ctypes.c_float,
]


def _img_args(img):
    assert img.dtype == np.uint8 and img.ndim == 3 and img.flags.c_contiguous
    h, w, _ = img.shape
    return img.ctypes.data, h, w


def fill_polygon(img, verts, color):
    verts = np.ascontiguousarray(verts, np.float32)
    _lib.gpt_fill_polygon(*_img_args(img), verts.ctypes.data, len(verts), *color)


def fill_circle(img, cx, cy, r, color, filled=True, thickness=2.0):
    _lib.gpt_fill_circle(*_img_args(img), cx, cy, r, *color, int(filled), thickness)


def draw_line(img, ax, ay, bx, by, color, thickness=1.5):
    _lib.gpt_draw_line(*_img_args(img), ax, ay, bx, by, *color, thickness)
