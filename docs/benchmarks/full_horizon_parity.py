#!/usr/bin/env python
"""Full-horizon parity: reference-vs-rebuild divergence at the REGISTERED
episode lengths (VERDICT r3 missing #2 / next #7).

The in-tree parity tests measure 400-500-step drives (docs/PARITY.md);
this script extends the measurement to the registered horizons --
max_episode_steps 2000 (v0/v2/Heavy-v2), 3000 (Heavy-v0), 1500 (v3),
gym_puzzles/__init__.py:6,13,20,27,34 -- over 3 reference spawn seeds per
variant, with the rebuild stepping on the real TPU (the reference's Box2D
C++ runs on the host CPU; the 2-vCPU CI box cannot afford the rebuild's
unrolled 180/60 XLA step at these horizons, the TPU can).

    python docs/benchmarks/full_horizon_parity.py > docs/benchmarks/full_horizon_parity_r4.jsonl

One JSON row per (env_id, spawn seed): obs-divergence maxima over step
windows, flag-flip counts, return relative difference, termination
agreement.  Same folding rules as tests/test_parity_long.py::_drive_curve
(angle-wrap 2*pi equivalence folded out; boolean goal_contact flips
tracked separately from continuous divergence).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

VARIANTS = {
    "MultiRobotPuzzle-v0": 2000,
    "MultiRobotPuzzleHeavy-v0": 3000,
    "MultiRobotPuzzle-v2": 2000,
    "MultiRobotPuzzleHeavy-v2": 2000,
    "MultiRobotPuzzle-v3": 1500,
}
WINDOWS = (100, 400, 1000, 2000, 3000)


def drive(env_id, spawn_seed, n_steps):
    import contextlib

    import tests.reference_oracle as oracle
    from gym_puzzles_tpu.api.registry import _logic

    np.random.seed(spawn_seed)  # the reference's global-np.random spawns
    with contextlib.redirect_stdout(sys.stderr):
        # the reference prints "initialize..." from __init__ (00.py:195);
        # keep stdout pure JSONL (VERDICT r4 weak #2)
        ref = oracle.make_reference(env_id)
    is_v2 = env_id.endswith("v2")
    if is_v2:
        ref.update_params(0, 0.997)  # quirk #7
    pos, ang = oracle.body_origin_poses(env_id, ref)
    bp = (pos[4][0], pos[4][1], ang[4])
    aps = [(pos[5 + i][0], pos[5 + i][1], ang[5 + i])
           for i in range(len(pos) - 5)]
    logic = _logic(env_id)
    if env_id.endswith("v3"):
        oracle.inject_v3(ref, bp, aps)
        goal = logic.goal_norm
    elif is_v2:
        goal = np.asarray(ref.block_final_pos[ref.goal_block.userData],
                          np.float32)
        oracle.inject_v2(ref, bp, aps, goal)
    else:
        oracle.inject_v0(ref, bp, aps)
        goal = np.array([320.0, 262.5, 0.0], np.float32)
    params = logic.default_params()
    if is_v2:
        params = params.update_params(0, 0.997)
    state = logic.inject(pos, ang, goal)
    step = jax.jit(logic.step)

    rng = np.random.RandomState(spawn_seed + 17)
    actions = rng.uniform(-1, 1, (n_steps, logic.cfg.act_dim))
    t0 = time.time()

    # Rebuild side: ONE chunked on-device scan over 128 identical lanes
    # through the production fused kernel (per-step host dispatch on the
    # tunneled runtime costs ~0.5 s/call -- a 2000-step drive took ~17 min
    # that way; the scanned fused roll takes seconds and its kernels are
    # already in the persistent cache from the eval runs).
    E = 128
    state_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[..., None], x.shape + (E,)), state)
    acts = jnp.broadcast_to(
        jnp.asarray(actions, jnp.float32)[..., None], actions.shape + (E,))
    use_fused = jax.default_backend() in ("tpu", "axon")
    step_b = logic.step_fused if use_fused else logic.step_batched

    @jax.jit
    def roll_chunk(st, a_chunk):
        def f(st, a):
            st, obs, r, d, _ = step_b(st, a, params)
            return st, (obs[:, 0], r[0], d[0])

        return jax.lax.scan(f, st, a_chunk)

    obs_m_all, rew_m_all, done_m_all = [], [], []
    chunk = 200
    for c0 in range(0, n_steps, chunk):
        state_b, (o, r, d) = roll_chunk(state_b, acts[c0 : c0 + chunk])
        obs_m_all.append(np.asarray(jax.device_get(o), np.float64))
        rew_m_all.append(np.asarray(jax.device_get(r), np.float64))
        done_m_all.append(np.asarray(jax.device_get(d)))
    obs_m_all = np.concatenate(obs_m_all)
    rew_m_all = np.concatenate(rew_m_all)
    done_m_all = np.concatenate(done_m_all)

    # Reference side: host loop (interactive-script speed, cheap on CPU)
    obs_div, flips = [], 0
    ret_r = ret_m = 0.0
    done_r = done_m = None
    for t in range(n_steps):
        o_r, r_r, d_r, _ = ref.step(actions[t].astype(np.float64))
        # TimeLimit-wrap the raw shim-driven reference at the registered
        # max_episode_steps (gym_puzzles/__init__.py:6,13,20,27,34): the
        # rebuild carries the wrapper in-env (envs/base.py), the bare
        # reference env does not, so without this the final row always
        # read terminated_ours=true vs ref=false (VERDICT r4 weak #2)
        d_r = bool(d_r) or (t == n_steps - 1)
        o_m64 = obs_m_all[t]
        ret_r += float(r_r)
        ret_m += float(rew_m_all[t])
        o_r64 = np.asarray(o_r, np.float64)
        d = np.abs(o_m64 - o_r64)
        d = np.minimum(d, np.abs(d - 2.0 * np.pi))  # angle-wrap fold
        is_flag = (np.isin(o_m64, (0.0, 1.0)) & np.isin(o_r64, (0.0, 1.0))
                   & (d == 1.0))
        flips += int(is_flag.sum())
        obs_div.append(float(np.where(is_flag, 0.0, d).max()))
        if d_r or bool(done_m_all[t]):
            done_r, done_m = bool(d_r), bool(done_m_all[t])
            break
    obs_div = np.asarray(obs_div)
    row = {
        "env_id": env_id,
        "spawn_seed": spawn_seed,
        "steps": int(len(obs_div)),
        "horizon": n_steps,
        "terminated_ref": done_r,
        "terminated_ours": done_m,
        "done_agree": done_r == done_m,
        "ret_ref": round(ret_r, 4),
        "ret_ours": round(ret_m, 4),
        "ret_reldiff": round(abs(ret_m - ret_r) / max(abs(ret_r), 1.0), 8),
        "flag_flip_steps": flips,
        "drive_seconds": round(time.time() - t0, 1),
    }
    for w in WINDOWS:
        if len(obs_div) >= w:
            row[f"obs_maxdiff_to_{w}"] = float(obs_div[:w].max())
    row["obs_maxdiff_full"] = float(obs_div.max())
    # saturation check: is the tail worse than the early curve?
    if len(obs_div) > 600:
        row["obs_maxdiff_tail"] = float(obs_div[len(obs_div) // 2:].max())
    return row


def main():
    from gym_puzzles_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    for env_id, horizon in VARIANTS.items():
        for seed in (1000, 2000, 3000):
            row = drive(env_id, seed, horizon)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
