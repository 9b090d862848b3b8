"""Scripted controllers over the public observation layout.

``pusher_action`` is a hand-coded herd-and-push controller for the
v0-family holonomic envs (obs layout multi_robot_puzzle_00.py:442-472):
every agent approaches a staging point a fixed offset BEHIND the block
(opposite the goal), then leans through the block toward the goal at max
speed.  Used two ways:

* as a physical-ceiling probe for the registered reward bars
  (docs/benchmarks/oracle_push.py),
* as the demonstrator for imitation bootstrap (train/imitate.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def pusher_action(obs, num_agents: int, offset_px: float = 70.0,
                  push_px: float = 30.0):
    """[E, obs_dim] v0-family obs -> [E, 3*num_agents] actions in [-1, 1].

    Two-phase potential controller: approach the staging point
    ``block - g_hat * offset_px`` (g_hat = unit block->goal), and once the
    agent sits behind the block (cos > 0.5 against -g_hat), drive through
    the block toward the goal (``block + g_hat * push_px``).  Velocities
    are unit-infinity normalized: full speed on the dominant axis (the
    env scales actions by MAX_SPEED, 00.py:419-420).
    """
    E = obs.shape[0]
    ag = obs[:, : 4 * num_agents].reshape(E, num_agents, 4)
    a2b = -ag[:, :, 0:2]  # agent->block, px (obs stores agent-block)
    blk = obs[:, 4 * num_agents : 4 * num_agents + 4]
    b2g = -blk[:, 0:2]  # block->goal, px (obs stores block-goal)
    g_hat = b2g / jnp.maximum(jnp.linalg.norm(b2g, axis=-1, keepdims=True), 1e-6)
    rel_a = -a2b  # block->agent
    rel_n = rel_a / jnp.maximum(jnp.linalg.norm(rel_a, axis=-1, keepdims=True), 1e-6)
    behind = (rel_n * (-g_hat)[:, None, :]).sum(-1) > 0.5  # [E, A]
    approach = a2b - g_hat[:, None, :] * offset_px
    push = a2b + g_hat[:, None, :] * push_px
    des = jnp.where(behind[:, :, None], push, approach)
    mag = jnp.maximum(jnp.abs(des).max(axis=-1, keepdims=True), 1e-6)
    v = des / mag
    act = jnp.concatenate([v, jnp.zeros((E, num_agents, 1))], axis=-1)
    return act.reshape(E, 3 * num_agents)
