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
    dist_a = jnp.maximum(jnp.linalg.norm(rel_a, axis=-1, keepdims=True), 1e-6)
    rel_n = rel_a / dist_a
    # per-agent slot directions fanned around -g_hat: five agents cannot
    # share one staging point (they jam each other and never move the
    # block); each gets its own contact slot behind the block.
    num = a2b.shape[1]
    theta = jnp.linspace(-0.6, 0.6, num) if num > 1 else jnp.zeros((1,))
    c, s = jnp.cos(theta), jnp.sin(theta)
    gx, gy = -g_hat[:, 0], -g_hat[:, 1]  # [E]
    u = jnp.stack([gx[:, None] * c[None] - gy[:, None] * s[None],
                   gx[:, None] * s[None] + gy[:, None] * c[None]], axis=-1)
    behindness = (rel_n * u).sum(-1)  # 1 = at own slot direction
    slot_target = a2b + u * offset_px  # agent -> its staging slot
    # ORBIT while not behind: chasing the slot in a straight line ploughs
    # through the block (and a pushed block flees the pursuing agents, so
    # they never round it -- observed failure mode).  Circle the block at
    # a safe radius instead: tangential drive + radial correction onto the
    # orbit, signed toward the shorter way to the slot.
    orbit_r = offset_px
    tang = jnp.stack([-rel_n[..., 1], rel_n[..., 0]], axis=-1)
    sign = jnp.sign((tang * slot_target).sum(-1, keepdims=True) + 1e-6)
    orbit = (sign * tang * 120.0
             + rel_n * (orbit_r - dist_a))  # radial: settle onto the circle
    near = dist_a[..., 0] < orbit_r + 60.0
    approach = jnp.where((near & (behindness < 0.6))[:, :, None],
                         orbit, slot_target)
    # once slotted: push straight toward the goal at full speed -- all
    # agents' forces aligned, maximum momentum transfer into the block.
    in_slot = (behindness > 0.6) & (dist_a[..., 0] < orbit_r + 60.0)
    push = g_hat[:, None, :] * jnp.maximum(push_px, 1.0)
    des = jnp.where(in_slot[:, :, None], push, approach)
    mag = jnp.maximum(jnp.abs(des).max(axis=-1, keepdims=True), 1e-6)
    v = des / mag
    act = jnp.concatenate([v, jnp.zeros((E, num_agents, 1))], axis=-1)
    return act.reshape(E, 3 * num_agents)
