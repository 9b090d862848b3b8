import jax
jax.config.update("jax_platforms", "cpu")
import time, dataclasses
import numpy as np, jax.numpy as jnp
from gym_puzzles_tpu.engine import step_pallas, solver_pallas
step_pallas.INTERPRET = True
step_pallas.UNROLL = True
from gym_puzzles_tpu.envs.config import VARIANTS
from gym_puzzles_tpu.envs.v0 import V0Env

cfg = dataclasses.replace(VARIANTS["MultiRobotPuzzle-v0"], velocity_iters=8, position_iters=4)
logic = V0Env(cfg)
params = logic.default_params()
E = 128
base = logic.inject(
    np.array([[0.0,8.0],[21.33,8.0],[10.67,0.0],[10.67,16.0],[10.0,8.0],[7.745,8.5],[10.0,6.245]]),
    np.zeros(7), np.array([320.0,262.5,0.0], np.float32))
st = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x[...,None], x.shape+(E,)), base)
a = jnp.broadcast_to(jnp.array([1.,0.,0.,0.,1.,0.], jnp.float32)[:,None], (6,E))

t0=time.time()
step_fz = jax.jit(logic.step_fused)
s_f, o_f, r_f, d_f, _ = step_fz(st, a, params)
jax.block_until_ready(o_f)
print("fused interpret compile+run:", round(time.time()-t0,1), "s")

step_ref = jax.jit(jax.vmap(logic.step, in_axes=(-1,-1,None), out_axes=-1))
s_r, o_r, r_r, d_r, _ = step_ref(st, a, params)
print("touching ref:", np.asarray(s_r.contacts.touching).any())
print("pos diff:", np.abs(np.asarray(s_f.bodies.pos)-np.asarray(s_r.bodies.pos)).max())
print("obs diff:", np.abs(np.asarray(o_f)-np.asarray(o_r)).max())
print("cnt eq:", (np.asarray(s_f.contacts.man.count)==np.asarray(s_r.contacts.man.count)).all())
print("ids eq:", (np.asarray(s_f.contacts.man.ids)==np.asarray(s_r.contacts.man.ids)).all())
print("imp diff:", np.abs(np.asarray(s_f.contacts.normal_impulse)-np.asarray(s_r.contacts.normal_impulse)).max())
