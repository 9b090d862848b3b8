"""Dump a 12-step fused contact-drive end state under POS_TRIG_INCREMENTAL
on|off; diff the dumps to verify bitwise equality.

Usage: python ab_pos_trig_bitwise.py on|off out.npz [env_id]

v0 drives the injected face-on push scenario (same as validate_fused.py);
other env ids (e.g. MultiRobotPuzzle-v2: 53 contact pairs, different
mass/inertia so different per-update dA magnitudes) drive 128 random
reset_fast spawns with full-magnitude constant actions -- deep-overlap
spawn resolution plus sustained pushing exercises the position phase hard.
"""
import sys
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import gym_puzzles_tpu.engine.solver_pallas as slp
slp.POS_TRIG_INCREMENTAL = sys.argv[1] == "on"
import jax, jax.numpy as jnp
import jax.random as jr
import numpy as np
from gym_puzzles_tpu.api.registry import _logic
from gym_puzzles_tpu.utils import enable_compilation_cache
enable_compilation_cache()
env_id = sys.argv[3] if len(sys.argv) > 3 else "MultiRobotPuzzle-v0"
logic = _logic(env_id)
params = logic.default_params()
if env_id.endswith("v2"):
    params = params.update_params(0, 0.997)
E = 128
if env_id == "MultiRobotPuzzle-v0":
    base = logic.inject(
        np.array([[0.0,8.0],[21.33,8.0],[10.67,0.0],[10.67,16.0],[10.0,8.0],[7.8,8.0],[10.0,5.6]]),
        np.zeros(7), np.array([320.0,262.5,0.0], np.float32))
    st = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[...,None], x.shape+(E,)), base)
else:
    keys = jr.split(jr.key(0), E)
    st, _ = jax.jit(jax.vmap(logic.reset_fast, in_axes=(0, None),
                             out_axes=-1))(keys, params)
if env_id == "MultiRobotPuzzle-v0":
    a2 = jnp.broadcast_to(
        jnp.array([1.,0.,0.,0.,1.,0.], jnp.float32)[:,None], (6,E))
else:
    a2 = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (logic.cfg.act_dim, E)), jnp.float32)
step_fz = jax.jit(logic.step_fused)
s = st
for t in range(12):
    s, o, r, d, _ = step_fz(s, a2, params)
np.savez(sys.argv[2], pos=np.asarray(s.bodies.pos), angle=np.asarray(s.bodies.angle),
         vel=np.asarray(s.bodies.vel), obs=np.asarray(o))
print("touching:", bool(np.asarray(s.contacts.touching).any()))
