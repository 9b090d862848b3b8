import jax, jax.numpy as jnp, numpy as np
from gym_puzzles_tpu.api.registry import make
from gym_puzzles_tpu.render import render_state
from gym_puzzles_tpu.train.scripted import pusher_action
from gym_puzzles_tpu.utils import enable_compilation_cache
enable_compilation_cache()
env = make("MultiRobotPuzzleHeavy-v0", num_envs=1, auto_reset=False,
           reset_mode="reference", backend="xla")
params = env.default_params()
A = env.cfg.act_dim // 3
vstate, obs = env.reset(jax.random.key(3), params)
step = jax.jit(env._step_fn)
frames = []
for t in range(900):
    act = pusher_action(obs, A, 70.0)
    vstate, obs, r, d, _ = step(vstate, act, params)
    if t % 6 == 0:
        one = jax.tree_util.tree_map(lambda x: np.asarray(x)[..., 0]
                                     if getattr(x, "ndim", 0) else x, vstate.env)
        frames.append(render_state(env.logic, one, mode="human_vision"))
    if bool(d[0]):
        print("completed at", t); break
print("final dist", float(obs[0, 4*A+3]))
from PIL import Image
imgs = [Image.fromarray(f) for f in frames]
imgs[0].save("/tmp/oracle_hv0.gif", save_all=True, append_images=imgs[1:], duration=80, loop=0)
print("frames", len(frames))
