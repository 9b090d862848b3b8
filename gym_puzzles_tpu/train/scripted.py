"""Scripted controllers over the public observation layout.

``pusher_action`` is a hand-coded herd-and-push controller for the
v0-family holonomic envs (obs layout multi_robot_puzzle_00.py:442-472):
every agent approaches a staging point a fixed offset BEHIND the block
(opposite the goal), then leans through the block toward the goal at max
speed.  ``planner_action`` is its round-5 successor: it reconstructs the
block's full world geometry from the vertex section of the obs
(00.py:470-472), slots agents along the actual back face (sorted
assignment, no path crossing), routes around the block, and GATES the
push until the formation is in place (the r4 controller's failure mode
was per-agent pushing that shoved the block away from late agents).
Used two ways:

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


def planner_action(obs, num_agents: int, gate: int | None = None,
                   slot_gap_px: float = 24.0, tol_px: float = 35.0):
    """[E, obs_dim] v0-family obs -> [E, 3*num_agents] actions in [-1, 1].

    Geometry-aware gated herd-and-push (see module docstring).  Phases,
    all computed statelessly from the current obs:

    1. Reconstruct world geometry: block center = goal + (block-goal) obs,
       block outline = the 8 world-space vertex obs (00.py:455-472).
    2. Find the back face: vertices at the support extreme along -u
       (u = unit block->goal); slot ``num_agents`` staging points evenly
       across that face's tangential span, ``slot_gap_px`` off the face.
    3. Sorted assignment: agents ranked by tangential coordinate take
       slots in the same order -- approach paths never cross.
    4. Routing: far agents drive straight at their slot; agents near the
       block but not behind it orbit around (tangential + radial
       correction), signed toward their slot.
    5. Gate: until >= ``gate`` agents (default num_agents - 1) sit within
       ``tol_px`` of their slots, arrived agents station-keep instead of
       pushing.  Once open, arrived agents drive through the block toward
       the goal at full speed.
    """
    E = obs.shape[0]
    A = num_agents
    if gate is None:
        gate = max(A - 2, 1)
    ag = obs[:, : 4 * A].reshape(E, A, 4)
    rel = ag[:, :, 0:2]  # agent - block_center, px
    blk = obs[:, 4 * A : 4 * A + 4]
    b2g = -blk[:, 0:2]  # block -> goal, px
    gl2 = jnp.maximum(jnp.linalg.norm(b2g, axis=-1, keepdims=True), 1e-6)
    u = b2g / gl2  # [E, 2] push direction
    perp = jnp.stack([-u[:, 1], u[:, 0]], axis=-1)  # [E, 2]
    verts = obs[:, 4 * A + 4 : 4 * A + 4 + 16].reshape(E, 8, 2)
    # verts are world px; block center world = goal + blk[0:2]; goal is the
    # fixed (320, 262.5) of the v0 family (00.py:115-128)
    bc = jnp.asarray([320.0, 262.5])[None] + blk[:, 0:2]
    vrel = verts - bc[:, None]  # [E, 8, 2] block-centered outline

    s_v = (vrel * -u[:, None]).sum(-1)  # support coords along -u
    p_v = (vrel * perp[:, None]).sum(-1)  # tangential coords
    smax = s_v.max(-1, keepdims=True)
    # slot tangential offsets at the agents' physical packing pitch (the
    # octagons are 1.5 m = 45 px wide; the heavy T's bar face is 6 m =
    # 180 px, exactly five slots), centered on the push line.  Agents
    # slotted past a narrower face keep driving forward during the push
    # until they contact whatever surface is there.
    offs = jnp.broadcast_to(
        (jnp.arange(A, dtype=obs.dtype) - (A - 1) / 2.0) * 46.0,
        (E, A))  # [E, A] sorted ascending
    slot_s = smax + slot_gap_px  # [E, 1]
    slots = (-u[:, None] * slot_s[..., None]
             + perp[:, None] * offs[..., None])  # [E, A, 2] block-centered

    # sorted assignment: agent tangential rank -> slot rank
    p_a = (rel * perp[:, None]).sum(-1)  # [E, A]
    rank = jnp.argsort(jnp.argsort(p_a, axis=-1), axis=-1)  # [E, A]
    my_slot = jnp.take_along_axis(slots, rank[..., None], axis=1)  # [E, A, 2]

    to_slot = my_slot - rel  # [E, A, 2]
    d_slot = jnp.linalg.norm(to_slot, axis=-1)  # [E, A]
    arrived = d_slot < tol_px
    # veto the push while a straggler is in the frontal sector: the block
    # would be shoved straight into it, stalling both (observed failure)
    front_dist = jnp.linalg.norm(rel, axis=-1)
    blocking = ((rel * u[:, None]).sum(-1) > 0.0) & (front_dist < 175.0)
    gate_open = ((arrived.sum(-1, keepdims=True) >= gate)
                 & ~blocking.any(-1, keepdims=True))  # [E, 1]

    # routing: tangent-point avoidance around the block's inflated
    # bounding circle (blended orbit/approach heuristics chattered or
    # dragged agents into the block's shoulder -- observed failures of
    # the first two cuts).  If the straight segment to the slot crosses
    # the circle, head for the tangent touch point on the angular side
    # of the slot; if inside the circle, spiral out-and-around.
    dist_b = jnp.maximum(jnp.linalg.norm(rel, axis=-1), 1e-6)  # [E, A]
    r_blk = jnp.linalg.norm(vrel, axis=-1).max(-1, keepdims=True)  # [E, 1]
    d_m = jnp.linalg.norm(my_slot, axis=-1)  # slot distance from center
    r_c = jnp.maximum(jnp.minimum(r_blk + 8.0, d_m - 10.0), 20.0)  # [E, A]
    phi_q = jnp.arctan2(rel[..., 1], rel[..., 0])
    phi_m = jnp.arctan2(my_slot[..., 1], my_slot[..., 0])
    dphi = jnp.mod(phi_m - phi_q + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    side = jnp.where(dphi >= 0.0, 1.0, -1.0)
    # antipodal agents (slot on the far side) have an unstable dphi sign
    # and chatter between going left/right around -- observed stall.
    # Tiebreak by slot rank: lower-ranked agents round on the - side.
    stable = jnp.where(rank > (A - 1) / 2.0, 1.0, -1.0)
    side = jnp.where(jnp.abs(dphi) > jnp.pi - 0.4, stable, side)
    # does the straight segment agent->slot cross the routing circle?
    t_seg = jnp.clip(((-rel) * to_slot).sum(-1)
                     / jnp.maximum((to_slot ** 2).sum(-1), 1e-6), 0.0, 1.0)
    closest = rel + t_seg[..., None] * to_slot
    crosses = jnp.linalg.norm(closest, axis=-1) < r_c - 1.0
    outside = dist_b > r_c + 2.0
    beta = jnp.arccos(jnp.clip(r_c / dist_b, -1.0, 1.0))
    phi_t = phi_q + side * beta
    touch = r_c[..., None] * jnp.stack([jnp.cos(phi_t), jnp.sin(phi_t)], -1)
    to_tangent = touch - rel
    rn = rel / dist_b[..., None]
    tang = jnp.stack([-rn[..., 1], rn[..., 0]], axis=-1)
    escape = (rn * (r_c + 12.0 - dist_b)[..., None] * 3.0
              + side[..., None] * tang * 120.0)
    des = jnp.where((crosses & outside)[..., None], to_tangent,
                    jnp.where((crosses & ~outside)[..., None], escape,
                              to_slot))

    # push / station-keep
    push = jnp.broadcast_to(u[:, None], des.shape) * 100.0
    hold = to_slot * 0.05  # proportional station-keeping, sub-max speed
    des = jnp.where((arrived & gate_open)[..., None], push,
                    jnp.where((arrived & ~gate_open)[..., None], hold, des))

    mag = jnp.maximum(jnp.abs(des).max(axis=-1, keepdims=True), 1e-6)
    scale = jnp.where(jnp.abs(des).max(-1, keepdims=True) > 40.0,
                      1.0 / mag, 1.0 / 40.0)
    v = jnp.clip(des * scale, -1.0, 1.0)
    act = jnp.concatenate([v, jnp.zeros((E, A, 1))], axis=-1)
    return act.reshape(E, 3 * A)
