"""Dump 12-step fused contact-drive end state under POS_TRIG_INCREMENTAL on|off; diff the dumps to verify bitwise equality."""
import sys
sys.path.insert(0, "/root/repo")
import gym_puzzles_tpu.engine.solver_pallas as slp
slp.POS_TRIG_INCREMENTAL = sys.argv[1] == "on"
import jax, jax.numpy as jnp
import numpy as np
from gym_puzzles_tpu.api.registry import _logic
from gym_puzzles_tpu.utils import enable_compilation_cache
enable_compilation_cache()
logic = _logic("MultiRobotPuzzle-v0")
params = logic.default_params()
E = 128
base = logic.inject(
    np.array([[0.0,8.0],[21.33,8.0],[10.67,0.0],[10.67,16.0],[10.0,8.0],[7.8,8.0],[10.0,5.6]]),
    np.zeros(7), np.array([320.0,262.5,0.0], np.float32))
st = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x[...,None], x.shape+(E,)), base)
a2 = jnp.broadcast_to(jnp.array([1.,0.,0.,0.,1.,0.], jnp.float32)[:,None], (6,E))
step_fz = jax.jit(logic.step_fused)
s = st
for t in range(12):
    s, o, r, d, _ = step_fz(s, a2, params)
np.savez(sys.argv[2], pos=np.asarray(s.bodies.pos), angle=np.asarray(s.bodies.angle),
         vel=np.asarray(s.bodies.vel), obs=np.asarray(o))
print("touching:", bool(np.asarray(s.contacts.touching).any()))
