"""On-device (jitted) rasterizer: pixel observations without leaving the TPU.

The reference's image pipeline renders with pyglet/OpenGL and reads pixels
back to the host per step (`_get_image`, multi_robot_puzzle_00.py:594-601).
The host-side rebuild of that path is ``render/raster.py`` + CPython
``_raster``; this module is the TPU-native version: the frame is computed
*inside* the jitted env step as pure JAX ops, so pixel observations can feed
a CNN policy with zero host round-trips -- state, frame, and learner all
stay on device.

Rasterization = per-pixel coverage tests, which map perfectly onto the VPU:
convex-polygon fills are half-plane products (statically unrolled over the
<=~16 fixtures and <=8 edges -- no gathers), discs and rings are radius
tests, heading lines are distance-to-segment tests.  Geometry, colors, and
sampling convention (pixel centers at +0.5, y-flip, slice-style
downsampling) mirror ``raster.py`` exactly, so frames match the host
renderer pixel-for-pixel away from edge-rounding.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from gym_puzzles_tpu.envs import config as C
from gym_puzzles_tpu.render.raster import BLUE, GREY, LT_GREY, WHITE


def _variant_geometry(cfg):
    if cfg.variant == "v2":
        return C.V2_VIEWPORT_W, C.V2_VIEWPORT_H, C.V2_SCALE
    if cfg.variant == "v3":
        return C.V3_SCREEN_W, C.V3_SCREEN_H, C.V3_SCALE
    return C.V0_VIEWPORT_W, C.V0_VIEWPORT_H, C.V0_SCALE


def make_device_renderer(logic, downsample: int = 4, mode: str = "human_vision"):
    """Build ``render(env_state) -> [h, w, 3] uint8`` as a pure jittable fn.

    ``downsample=d`` samples every d-th full-resolution pixel (the host
    pipeline's ``img[::d, ::d]`` slicing, api/image_obs.py), so a downsampled
    device frame equals the sliced host frame.
    """
    cfg = logic.cfg
    lay = logic.layout
    table = lay.table
    W, H, ppm = _variant_geometry(cfg)
    d = downsample
    h, w = (H + d - 1) // d, (W + d - 1) // d

    # full-res pixel-center coordinates of the sampled grid (y-up flipped at
    # the test sites exactly like raster.py: tests run in y-down px space)
    gx = (np.arange(w) * d + 0.5).astype(np.float32)[None, :]  # [1, w]
    gy = (np.arange(h) * d + 0.5).astype(np.float32)[:, None]  # [h, 1]
    gx = np.broadcast_to(gx, (h, w))
    gy = np.broadcast_to(gy, (h, w))

    # static per-fixture data (numpy -> HLO literals)
    fix_body = [int(b) for b in table.fix_body]
    fix_verts = [np.asarray(table.fix_verts[f, : int(table.fix_count[f])], np.float32)
                 for f in range(table.num_fixtures)]
    local_center = np.asarray(table.local_center, np.float32)
    agent_set = set(int(s) for s in lay.agent_slots)
    block_slot = int(lay.block_slot)

    def fixture_color(b):
        if b in agent_set:
            return WHITE
        if b == block_slot:
            return GREY
        return LT_GREY

    center_r = max(3.0, 0.05 * ppm)
    vert_r = max(2.0, 0.02 * ppm)

    def paint(img, mask, color):
        col = jnp.asarray(np.array(color, np.uint8))
        return jnp.where(mask[:, :, None], col, img)

    def disc_mask(cx_px, cy_px_yup, r):
        """Filled disc at y-up px center (raster.py flips y at the call)."""
        dx = gx - cx_px
        dy = gy - (H - cy_px_yup)
        return dx * dx + dy * dy <= r * r

    def ring_mask(cx_px, cy_px_yup, r, thickness):
        dx = gx - cx_px
        dy = gy - (H - cy_px_yup)
        d2 = dx * dx + dy * dy
        return (d2 <= (r + thickness) ** 2) & (d2 >= (r - thickness) ** 2)

    def segment_mask(ax, ay_yup, bx, by_yup, thickness):
        a = jnp.stack([ax, H - ay_yup])
        b = jnp.stack([bx, H - by_yup])
        ab = b - a
        denom = ab @ ab + 1e-12
        t = jnp.clip(((gx - a[0]) * ab[0] + (gy - a[1]) * ab[1]) / denom, 0.0, 1.0)
        dx = gx - (a[0] + t * ab[0])
        dy = gy - (a[1] + t * ab[1])
        return dx * dx + dy * dy <= thickness * thickness

    def poly_mask(verts_px):
        """Convex fill: pixel center left of every edge (raster.py:53-58).
        ``verts_px`` [N, 2] in y-down px space, reversed winding applied by
        the caller exactly as raster.py does."""
        m = jnp.ones((h, w), bool)
        n = verts_px.shape[0]
        for i in range(n):
            a = verts_px[i]
            b = verts_px[(i + 1) % n]
            m &= (b[0] - a[0]) * (gy - a[1]) - (b[1] - a[1]) * (gx - a[0]) >= 0
        return m

    def render(env_state):
        bodies = env_state.bodies
        pos = bodies.pos  # [B, 2] world meters
        ang = bodies.angle
        cth, sth = jnp.cos(ang), jnp.sin(ang)
        org_x = pos[:, 0] - (cth * local_center[:, 0] - sth * local_center[:, 1])
        org_y = pos[:, 1] - (sth * local_center[:, 0] + cth * local_center[:, 1])

        img = jnp.zeros((h, w, 3), jnp.uint8)
        goal = env_state.goal_pos

        # goal marker (variant units -> px, raster.py:154-165)
        if cfg.variant == "v0":
            img = paint(img, disc_mask(goal[0], goal[1], C.V0_EPSILON), BLUE)
        elif cfg.variant == "v3":
            gx_px = goal[0] * (W / 2) + W / 2
            gy_px = goal[1] * (W / 2) + H / 2
            img = paint(img, disc_mask(gx_px, gy_px, C.V3_EPSILON), BLUE)
        else:  # v2: white dot + margin ring; goal stored normalized (x RATIO)
            gx_px = goal[0] / C.V2_RATIO * ppm
            gy_px = goal[1] / C.V2_RATIO * ppm
            eps_px = 0.1 / C.V2_RATIO * ppm
            img = paint(img, disc_mask(gx_px, gy_px, 6.0), WHITE)
            img = paint(img, ring_mask(gx_px, gy_px, eps_px, 3.0), LT_GREY)

        # fixture fills (human vision only, raster.py:169-178)
        if mode != "agent_vision":
            for f, verts in enumerate(fix_verts):
                b = fix_body[f]
                wx = org_x[b] + cth[b] * verts[:, 0] - sth[b] * verts[:, 1]
                wy = org_y[b] + sth[b] * verts[:, 0] + cth[b] * verts[:, 1]
                px = jnp.stack([wx * ppm, H - wy * ppm], axis=1)
                img = paint(img, poly_mask(px[::-1]), fixture_color(b))

        # centers + heading lines (raster.py:181-191)
        for a in lay.agent_slots:
            a = int(a)
            m = disc_mask(pos[a, 0] * ppm, pos[a, 1] * ppm, center_r)
            img = paint(img, m, GREY if mode != "agent_vision" else WHITE)
            if mode == "agent_vision":
                tip_x = pos[a, 0] - 0.35 * sth[a]
                tip_y = pos[a, 1] + 0.35 * cth[a]
                img = paint(
                    img,
                    segment_mask(pos[a, 0] * ppm, pos[a, 1] * ppm,
                                 tip_x * ppm, tip_y * ppm, 1.5),
                    WHITE,
                )
        b = block_slot
        img = paint(img, disc_mask(pos[b, 0] * ppm, pos[b, 1] * ppm, center_r), WHITE)

        # block vertex dots (raster.py:194-202)
        verts = np.asarray(lay.block_verts, np.float32)
        wx = org_x[b] + cth[b] * verts[:, 0] - sth[b] * verts[:, 1]
        wy = org_y[b] + sth[b] * verts[:, 0] + cth[b] * verts[:, 1]
        for k in range(verts.shape[0]):
            img = paint(img, disc_mask(wx[k] * ppm, wy[k] * ppm, vert_r), WHITE)
        return img

    render.height = h
    render.width = w
    return render
