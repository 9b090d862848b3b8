"""Host-side debug renderer: rgb_array frames from device state snapshots.

Replaces the reference's pyglet/OpenGL rendering (multi_robot_puzzle_00.py:
528-601, 02.py:590-707, core.py:421-459) with a GL-free rasterizer, so
``render(mode='rgb_array')``, video recording and the v0 image-observation
pipeline work headless next to a TPU host.  Geometry and colors mirror the
reference: black background, dark-grey walls, grey block with white
center/vertex dots, white agents, blue goal disc (v0/v3) or white goal dot +
grey margin ring (v2); v2's ``agent vision`` mode draws only points and
heading vectors (02.py:665-707).

The hot inner loops (polygon fill, discs) dispatch to the C++ extension in
``_raster`` when built (make -C gym_puzzles_tpu/render), with a vectorized
numpy fallback.
"""

from __future__ import annotations

import numpy as np

from gym_puzzles_tpu.engine import math2d  # noqa: F401  (doc cross-ref)
from gym_puzzles_tpu.envs import config as C

try:
    from gym_puzzles_tpu.render import _raster_cpp as _cpp
except Exception:  # pragma: no cover - extension not built
    _cpp = None

GREY = (127, 127, 127)
WHITE = (255, 255, 255)
LT_GREY = (51, 51, 51)
BLUE = (58, 153, 255)


def _fill_polygon(img, verts_px, color):
    """Fill a convex polygon given float pixel vertices [N,2] (y-up)."""
    if _cpp is not None:
        _cpp.fill_polygon(img, np.asarray(verts_px, np.float32), color)
        return
    h, w, _ = img.shape
    v = np.asarray(verts_px, np.float64)
    x0 = max(int(np.floor(v[:, 0].min())), 0)
    x1 = min(int(np.ceil(v[:, 0].max())) + 1, w)
    y0 = max(int(np.floor(v[:, 1].min())), 0)
    y1 = min(int(np.ceil(v[:, 1].max())) + 1, h)
    if x0 >= x1 or y0 >= y1:
        return
    xs = np.arange(x0, x1) + 0.5
    ys = np.arange(y0, y1) + 0.5
    gx, gy = np.meshgrid(xs, ys)
    inside = np.ones(gx.shape, bool)
    n = len(v)
    for i in range(n):
        a = v[i]
        b = v[(i + 1) % n]
        # CCW polygon: inside = left of every edge
        inside &= (b[0] - a[0]) * (gy - a[1]) - (b[1] - a[1]) * (gx - a[0]) >= 0
    img[y0:y1, x0:x1][inside] = color


def _fill_circle(img, cx, cy, r, color, filled=True, thickness=2.0):
    if _cpp is not None:
        _cpp.fill_circle(img, float(cx), float(cy), float(r), color,
                         bool(filled), float(thickness))
        return
    h, w, _ = img.shape
    x0 = max(int(cx - r - thickness), 0)
    x1 = min(int(cx + r + thickness) + 1, w)
    y0 = max(int(cy - r - thickness), 0)
    y1 = min(int(cy + r + thickness) + 1, h)
    if x0 >= x1 or y0 >= y1:
        return
    xs = np.arange(x0, x1) + 0.5
    ys = np.arange(y0, y1) + 0.5
    gx, gy = np.meshgrid(xs, ys)
    d2 = (gx - cx) ** 2 + (gy - cy) ** 2
    if filled:
        mask = d2 <= r * r
    else:
        mask = (d2 <= (r + thickness) ** 2) & (d2 >= (r - thickness) ** 2)
    img[y0:y1, x0:x1][mask] = color


def _draw_line(img, a, b, color, thickness=1.5):
    """Thick line via distance-to-segment test over the bounding box."""
    h, w, _ = img.shape
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    lo = np.maximum(np.floor(np.minimum(a, b) - thickness), 0).astype(int)
    hi = np.minimum(np.ceil(np.maximum(a, b) + thickness) + 1,
                    [w, h]).astype(int)
    if (hi <= lo).any():
        return
    xs = np.arange(lo[0], hi[0]) + 0.5
    ys = np.arange(lo[1], hi[1]) + 0.5
    gx, gy = np.meshgrid(xs, ys)
    ab = b - a
    denom = ab @ ab + 1e-12
    t = np.clip(((gx - a[0]) * ab[0] + (gy - a[1]) * ab[1]) / denom, 0.0, 1.0)
    dx = gx - (a[0] + t * ab[0])
    dy = gy - (a[1] + t * ab[1])
    mask = dx * dx + dy * dy <= thickness * thickness
    img[lo[1]:hi[1], lo[0]:hi[0]][mask] = color


def _body_polys_px(logic, bodies, ppm, height_px):
    """World-space fixture polygons -> pixel coords (y flipped for images)."""
    import jax

    table = logic.layout.table
    pos = np.asarray(bodies.pos)
    ang = np.asarray(bodies.angle)
    c, s = np.cos(ang), np.sin(ang)
    # body origins
    lc = table.local_center
    org_x = pos[:, 0] - (c * lc[:, 0] - s * lc[:, 1])
    org_y = pos[:, 1] - (s * lc[:, 0] + c * lc[:, 1])
    polys = []
    for f in range(table.num_fixtures):
        b = int(table.fix_body[f])
        n = int(table.fix_count[f])
        v = table.fix_verts[f, :n]
        wx = org_x[b] + c[b] * v[:, 0] - s[b] * v[:, 1]
        wy = org_y[b] + s[b] * v[:, 0] + c[b] * v[:, 1]
        px = np.stack([wx * ppm, height_px - wy * ppm], axis=1)
        polys.append((b, px))
    del jax
    return polys


def render_state(logic, env_state, mode: str = "human_vision") -> np.ndarray:
    """Render one env's state to an (H, W, 3) uint8 frame.

    ``logic``: the PuzzleEnvLogic; ``env_state``: unbatched EnvState.
    ``mode``: 'human_vision' | 'agent_vision' (v2's two styles).
    """
    cfg = logic.cfg
    if cfg.variant == "v2":
        W, H = C.V2_VIEWPORT_W, C.V2_VIEWPORT_H
        ppm = C.V2_SCALE
    elif cfg.variant == "v3":
        W, H = C.V3_SCREEN_W, C.V3_SCREEN_H
        ppm = C.V3_SCALE
    else:
        W, H = C.V0_VIEWPORT_W, C.V0_VIEWPORT_H
        ppm = C.V0_SCALE

    img = np.zeros((H, W, 3), np.uint8)
    bodies = env_state.bodies
    goal = np.asarray(env_state.goal_pos)
    lay = logic.layout

    # goal marker
    if cfg.variant == "v0":
        _fill_circle(img, goal[0], H - goal[1], C.V0_EPSILON, BLUE)
    elif cfg.variant == "v3":
        gx = goal[0] * (W / 2) + W / 2
        gy = goal[1] * (W / 2) + H / 2
        _fill_circle(img, gx, H - gy, C.V3_EPSILON, BLUE)
    else:  # v2: white dot + margin ring, goal stored normalized (x RATIO)
        gx = goal[0] / C.V2_RATIO * ppm
        gy = goal[1] / C.V2_RATIO * ppm
        eps_px = 0.1 / C.V2_RATIO * ppm
        _fill_circle(img, gx, H - gy, 6, WHITE)
        _fill_circle(img, gx, H - gy, eps_px, LT_GREY, filled=False, thickness=3)

    polys = _body_polys_px(logic, bodies, ppm, H)
    agent_set = set(int(s) for s in lay.agent_slots)
    if mode != "agent_vision":
        for b, px in polys:
            if b in agent_set:
                color = WHITE
            elif b == lay.block_slot:
                color = GREY
            else:
                color = LT_GREY
            # pixel coords are y-flipped -> reverse winding for the fill test
            _fill_polygon(img, px[::-1], color)

    # centers + block vertices (small white dots), heading lines in agent mode
    pos = np.asarray(bodies.pos)
    for a in lay.agent_slots:
        _fill_circle(img, pos[a, 0] * ppm, H - pos[a, 1] * ppm,
                     max(3.0, 0.05 * ppm), GREY if mode != "agent_vision" else WHITE)
        if mode == "agent_vision":
            ang = float(np.asarray(bodies.angle)[a])
            tip = pos[a] + 0.35 * np.array([-np.sin(ang), np.cos(ang)])
            _draw_line(img, (pos[a, 0] * ppm, H - pos[a, 1] * ppm),
                       (tip[0] * ppm, H - tip[1] * ppm), WHITE)
    b = lay.block_slot
    _fill_circle(img, pos[b, 0] * ppm, H - pos[b, 1] * ppm, max(3.0, 0.05 * ppm), WHITE)

    # block vertices
    ang = float(np.asarray(bodies.angle)[b])
    c, s = np.cos(ang), np.sin(ang)
    lc = lay.table.local_center[b]
    ox = pos[b, 0] - (c * lc[0] - s * lc[1])
    oy = pos[b, 1] - (s * lc[0] + c * lc[1])
    for v in lay.block_verts:
        wx = ox + c * v[0] - s * v[1]
        wy = oy + s * v[0] + c * v[1]
        _fill_circle(img, wx * ppm, H - wy * ppm, max(2.0, 0.02 * ppm), WHITE)
    return img


def render_batch(logic, batched_state, indices=None, mode="human_vision",
                 batch_axis: int = -1):
    """Render several envs from a batched EnvState -> [N, H, W, 3].

    ``batch_axis`` matches the VectorEnv layout (default -1, lane-major)."""
    import jax

    n = np.asarray(batched_state.bodies.angle).shape[batch_axis]
    indices = range(n) if indices is None else indices
    frames = []
    for i in indices:
        if batch_axis == -1:
            pick = lambda x: np.asarray(x)[..., i]
        else:
            pick = lambda x: np.asarray(x)[i]
        one = jax.tree_util.tree_map(pick, batched_state)
        frames.append(render_state(logic, one, mode=mode))
    return np.stack(frames)
