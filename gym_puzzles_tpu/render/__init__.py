from gym_puzzles_tpu.render.raster import render_state, render_batch

__all__ = ["render_state", "render_batch"]
