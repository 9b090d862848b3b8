"""Policy evaluation + video recording: the rebuild of train/test.py.

``evaluate_policy`` runs N episodes with the trained deterministic policy
(normalizer frozen: VecNormalize training=False / norm_reward=False,
test.py:66-68) and reports mean/std of raw episode returns; ``record_video``
renders an episode with the host rasterizer and writes an .npz frame stack
(plus an animated GIF if PIL is available).
"""

from __future__ import annotations

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp


def _image_pipeline(algo):
    """The training env's image-obs pipeline config (so eval rebuilds the
    exact obs the CNN was trained on), or None for flat-obs runs."""
    env = getattr(algo, "env", None)
    if getattr(algo, "obs_shape", None) is None or env is None:
        return None
    return (env.obs_depth, env.frameskip, env.downsample, env.mode,
            env.block_shape)


def _flat_eval_backend(n: int) -> str:
    """Which engine backend a flat-obs eval env of batch ``n`` rides.

    The fused whole-tick kernel needs lane-aligned batches on real TPU
    hardware (n % 128 == 0); everything else takes the portable XLA path.
    Exposed as a function (rather than buried in _make_eval_env) so eval
    results can RECORD which numeric path produced them -- 64-episode
    (xla) and 128-episode (fused) evals of the same checkpoint differ at
    f32 round-off (measured benign: docs/BENCHMARKS.md's 64-xla vs
    128-fused v2 agreement), and "solved" claims should be attributable."""
    return "fused" if n % 128 == 0 and jax.default_backend() == "tpu" else "xla"


def _make_eval_env(env_id: str, n: int, image_cfg=None):
    """Dedicated eval env: auto_reset off, reference reset semantics.  For
    CNN runs this is a DeviceImageVectorEnv with the training pipeline's
    frame config -- the SB3 analogue is that eval wraps whatever policy
    trained (test.py:60-76).

    On a real TPU with a lane-aligned batch the eval env rides the fused
    whole-tick kernel instead of the XLA solver: a 64-episode v2 eval
    through the scan-form XLA solver costs ~10-16 min of 2000-step
    episodes, while the fused kernel does 128 lanes in seconds -- which is
    what makes honest-eval-ranked sweeps affordable.  CPU (tests) and
    ragged batches keep the portable XLA path."""
    if image_cfg is not None:
        from gym_puzzles_tpu.api.image_obs import DeviceImageVectorEnv

        depth, fs, ds, mode, bs = image_cfg
        # image evals ride the fused kernel on lane-aligned TPU batches for
        # the same reason flat ones do -- and the 128-lane image env on the
        # XLA path has crashed the tunneled TPU worker outright (r4).
        backend = _flat_eval_backend(n)
        return DeviceImageVectorEnv(env_id, num_envs=n, obs_depth=depth,
                                    frameskip=fs, downsample=ds, mode=mode,
                                    block_shape=bs, auto_reset=False,
                                    reset_mode="reference", backend=backend)
    from gym_puzzles_tpu.api.registry import make

    backend = _flat_eval_backend(n)
    # stderr, so `evaluate ... > out.json` stays machine-parseable JSON
    print(f"# eval env: {env_id} n={n} backend={backend}", file=sys.stderr)
    return make(env_id, num_envs=n, auto_reset=False,
                reset_mode="reference", backend=backend)


def _use_obs_norm(algo) -> bool:
    """Mirror the trainer's VecNormalize logic (ppo.py::_build_train_step):
    obs normalization applies only to flat obs -- SB3 image runs use
    norm_obs=False, and obs_rms has flat-obs shape anyway."""
    return algo.cfg.normalize and getattr(algo, "obs_shape", None) is None


def evaluate_policy(algo, train_state, n_episodes: int = 10, deterministic: bool = True,
                    max_steps: int | None = None, seed: int = 0):
    """-> (mean_return, std_return, returns list).  Uses a dedicated
    single-batch env so evaluation never disturbs training state."""
    from gym_puzzles_tpu.train import normalize as nrm

    cfg = algo.cfg
    env = _make_eval_env(cfg.env_id, 1, _image_pipeline(algo))
    params = env.default_params()
    net = algo.net
    norm = train_state.normalizer
    max_steps = max_steps or env.cfg.max_episode_steps
    use_obs_norm = _use_obs_norm(algo)

    # net params / normalizer are device arrays: pass as jit ARGS, never
    # close over them (captured device constants stall every execution on
    # the tunneled TPU)
    @jax.jit
    def policy(net_params, norm_st, obs, key):
        if use_obs_norm:
            _, n_obs = nrm.normalize_obs(norm_st, obs, update=False)
        else:
            n_obs = obs
        mean, log_std, _v = net.apply(net_params, n_obs)
        if deterministic:
            return jnp.clip(mean, -1.0, 1.0)
        noise = jax.random.normal(key, mean.shape)
        return jnp.clip(mean + jnp.exp(log_std) * noise, -1.0, 1.0)

    returns = []
    key = jax.random.key(seed)
    for ep in range(n_episodes):
        key, k = jax.random.split(key)
        vstate, obs = env.reset(k, params)
        total = 0.0
        for _t in range(max_steps):
            key, ka = jax.random.split(key)
            action = policy(train_state.params, norm, obs, ka)
            vstate, obs, reward, done, _ = env.step(vstate, action, params)
            total += float(reward[0])
            if bool(done[0]):
                break
        returns.append(total)
    return float(np.mean(returns)), float(np.std(returns)), returns


@functools.lru_cache(maxsize=8)
def _batched_eval_fns(env_id: str, n_episodes: int, deterministic: bool, net,
                      image_cfg=None, use_obs_norm: bool = True):
    """Build (env, jitted start, jitted roll) once per
    (env_id, n_episodes, deterministic, net-architecture, obs pipeline): a
    sweep calling evaluate_policy_batched per trial reuses the same traced
    program instead of paying a fresh retrace + compile-cache lookup each
    time.  (flax modules are frozen dataclasses -- hashable cache keys;
    image_cfg is a plain tuple.)"""
    from gym_puzzles_tpu.train import normalize as nrm

    env = _make_eval_env(env_id, n_episodes, image_cfg)

    # net params / normalizer / env params ride as jit ARGUMENTS -- a
    # captured device array in a jitted closure stalls every call on the
    # tunneled runtime (see CLAUDE.md sharp edges).
    def step(net_params, norm_st, params, carry, k):
        vstate, obs, finished, total, length = carry
        if use_obs_norm:
            _, n_obs = nrm.normalize_obs(norm_st, obs, update=False)
        else:
            n_obs = obs
        mean, log_std, _v = net.apply(net_params, n_obs)
        if deterministic:
            act = mean
        else:
            act = mean + jnp.exp(log_std) * jax.random.normal(k, mean.shape)
        act = jnp.clip(act, -1.0, 1.0)
        vstate, obs, reward, done, _ = env._step_fn(vstate, act, params)
        total = total + jnp.where(finished, 0.0, reward)
        length = length + jnp.where(finished, 0, 1).astype(jnp.int32)
        finished = finished | done
        return (vstate, obs, finished, total, length), None

    @jax.jit
    def start(key, params):
        k_reset, k_act = jax.random.split(key)
        vstate, obs = env.reset(k_reset, params)
        return (vstate, obs, jnp.zeros((n_episodes,), bool),
                jnp.zeros((n_episodes,), jnp.float32),
                jnp.zeros((n_episodes,), jnp.int32)), k_act

    @functools.partial(jax.jit, static_argnums=5)
    def roll(net_params, norm_st, params, carry, key, n):
        keys = jax.random.split(key, n + 1)
        carry, _ = jax.lax.scan(
            lambda c, k: step(net_params, norm_st, params, c, k),
            carry, keys[1:])
        return carry, keys[0]

    return env, start, roll


def evaluate_policy_batched(algo, train_state, n_episodes: int = 64,
                            deterministic: bool = True, seed: int = 0,
                            max_steps: int | None = None, env_params=None,
                            chunk: int = 200):
    """On-device evaluation: one episode per env lane, rolled in jitted
    ``chunk``-step ``lax.scan`` segments with the carry staying on device --
    a handful of device round-trips instead of ``evaluate_policy``'s
    per-step host sync, so sweeps can afford honest deterministic
    evaluation after every trial.  Episodes beyond their ``done`` are
    masked out of the return sum (auto_reset off).

    Chunked rather than one max_steps-long scan on purpose: the proven
    pattern on the tunneled TPU runtime (same as bench.py) -- a single
    2000-iteration scan program has crashed the remote worker here, and
    chunking also lets an early finish of every lane skip the tail.

    -> (mean_return, std_return, returns list, lengths list) over
    ``n_episodes`` episodes with i.i.d. spawn/goal randomness (per-lane
    PRNG keys).  ``lengths`` = steps until done (== max_steps for
    timeouts), the diagnostic that separates fast completions from slow
    ones under the per-step distance penalties.
    """
    env, start, roll = _batched_eval_fns(algo.cfg.env_id, n_episodes,
                                         deterministic, algo.net,
                                         _image_pipeline(algo),
                                         _use_obs_norm(algo))
    params = env_params if env_params is not None else env.default_params()
    params = jax.tree_util.tree_map(jnp.asarray, params)
    max_steps = max_steps or env.cfg.max_episode_steps
    chunk = min(chunk, max_steps)

    carry, k_act = start(jax.random.key(seed), params)
    remaining = max_steps
    while remaining > 0:
        n = min(chunk, remaining)  # final partial chunk keeps max_steps exact
        carry, k_act = roll(train_state.params, train_state.normalizer,
                            params, carry, k_act, n)
        remaining -= n
        if bool(jax.device_get(carry[2].all())):
            break
    totals = np.asarray(jax.device_get(carry[3]))
    lengths = np.asarray(jax.device_get(carry[4]))
    return (float(totals.mean()), float(totals.std()), totals.tolist(),
            lengths.tolist())


def record_video(algo, train_state, path: str, n_steps: int = 300, seed: int = 0,
                 mode: str = "human_vision", fps: int = 50):
    """Roll one episode and save frames.  Writes ``path``.npz always and
    ``path``.gif when PIL is importable."""
    from gym_puzzles_tpu.render import render_state
    from gym_puzzles_tpu.train import normalize as nrm

    cfg = algo.cfg
    image_cfg = _image_pipeline(algo)
    env = _make_eval_env(cfg.env_id, 1, image_cfg)
    logic = env.logic  # VectorEnv and DeviceImageVectorEnv both expose it
    params = env.default_params()
    norm = train_state.normalizer
    use_obs_norm = _use_obs_norm(algo)

    @jax.jit
    def policy(net_params, norm_st, obs):
        if use_obs_norm:
            _, n_obs = nrm.normalize_obs(norm_st, obs, update=False)
        else:
            n_obs = obs
        mean, _ls, _v = algo.net.apply(net_params, n_obs)
        return jnp.clip(mean, -1.0, 1.0)

    vstate, obs = env.reset(jax.random.key(seed), params)
    frames = []
    for _ in range(n_steps):
        env_state = vstate.vec.env if image_cfg is not None else vstate.env
        one = jax.tree_util.tree_map(lambda x: np.asarray(x)[..., 0]
                                     if getattr(x, "ndim", 0) else x, env_state)
        frames.append(render_state(logic, one, mode=mode))
        vstate, obs, reward, done, _ = env.step(
            vstate, policy(train_state.params, norm, obs), params
        )
        if bool(done[0]):
            break
    frames = np.stack(frames)
    np.savez_compressed(path + ".npz", frames=frames, fps=fps)
    try:
        from PIL import Image

        imgs = [Image.fromarray(f) for f in frames[:: max(1, fps // 10)]]
        imgs[0].save(path + ".gif", save_all=True, append_images=imgs[1:],
                     duration=1000 // 10, loop=0)
    except Exception:
        pass
    return frames


def main(argv=None):
    """``python -m gym_puzzles_tpu.train.evaluate`` — the reference's
    ``train/test.py`` as a CLI: restore a checkpoint (policy params + frozen
    normalizer stats, the PPO.load + VecNormalize.load(training=False)
    analogue, test.py:60-76), evaluate N episodes, optionally record video.
    Prints one JSON line with mean/std/returns."""
    import argparse
    import json

    from gym_puzzles_tpu.train.ppo import PPO, PPOConfig
    from gym_puzzles_tpu.train import checkpoint as ckpt
    from gym_puzzles_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    p = argparse.ArgumentParser(description="Evaluate a trained policy")
    p.add_argument("--checkpoint", required=True, type=str,
                   help="orbax checkpoint dir written by the trainer CLI")
    p.add_argument("--config", default=None, type=str, help="JSON config path")
    p.add_argument("--env", default=None, type=str, help="env id override")
    p.add_argument("--policy", default=None, choices=["mlp", "cnn"],
                   help="policy architecture of the checkpoint")
    p.add_argument("--downsample", default=4, type=int,
                   help="cnn only: frame downsample the checkpoint was "
                        "trained with (must match -- it sets the CNN "
                        "flatten width)")
    p.add_argument("--obs_depth", default=3, type=int,
                   help="cnn only: stacked frame count (00.py:197-200)")
    p.add_argument("--frameskip", default=4, type=int,
                   help="cnn only: physics frameskip (00.py:161-162)")
    p.add_argument("--n_episodes", default=10, type=int)
    p.add_argument("--max_steps", default=None, type=int,
                   help="episode step cap (default: the env's registered "
                        "max_episode_steps)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--stochastic", action="store_true",
                   help="sample actions instead of the deterministic mean")
    p.add_argument("--batched", action="store_true",
                   help="one episode per env lane on device (fast on TPU)")
    p.add_argument("--video", default=None, type=str,
                   help="record one episode to PATH.npz/.gif")
    p.add_argument("--video_mode", default="human_vision",
                   choices=["human_vision", "agent_vision"])
    args = p.parse_args(argv)

    config = {}
    if args.config:
        with open(args.config) as f:
            config = json.load(f)
    overrides = {"n_envs": 1, "n_steps": 2, "batch_size": 2, "n_epochs": 1}
    if args.env:
        overrides["env_id"] = args.env
    if args.policy:
        overrides["policy"] = args.policy
    cfg = PPOConfig.from_reference_json(config, **overrides)

    if cfg.policy == "cnn":
        from gym_puzzles_tpu.api.image_obs import DeviceImageVectorEnv

        algo = PPO(cfg, env=DeviceImageVectorEnv(
            cfg.env_id, num_envs=cfg.n_envs, obs_depth=args.obs_depth,
            frameskip=args.frameskip, downsample=args.downsample))
    else:
        algo = PPO(cfg)
    template = algo.init_state(jax.random.key(args.seed))
    state = ckpt.restore_policy(args.checkpoint, template)

    lengths = None
    if args.batched:
        mean, std, returns, lengths = evaluate_policy_batched(
            algo, state, n_episodes=args.n_episodes, seed=args.seed,
            max_steps=args.max_steps, deterministic=not args.stochastic)
    else:
        mean, std, returns = evaluate_policy(
            algo, state, n_episodes=args.n_episodes, seed=args.seed,
            max_steps=args.max_steps, deterministic=not args.stochastic)
    if cfg.policy == "cnn":
        eval_backend = "device-image"
    else:
        eval_backend = _flat_eval_backend(args.n_episodes if args.batched else 1)
    # eval envs never inherit reduced training iters (_make_eval_env passes
    # no overrides) -- record the reference-physics counts for the artifact
    from gym_puzzles_tpu.envs.config import VARIANTS

    ecfg = VARIANTS[cfg.env_id]
    row = {"env_id": cfg.env_id, "checkpoint": args.checkpoint,
           "trained_timesteps": ckpt.step_count(state.timesteps),
           "eval_backend": eval_backend, "batched": args.batched,
           "eval_solver_iters": [int(ecfg.velocity_iters),
                                 int(ecfg.position_iters)],
           "mean_return": mean, "std_return": std, "returns": returns}
    if lengths is not None:
        row["lengths"] = lengths
    print(json.dumps(row))
    if args.video:
        record_video(algo, state, args.video, seed=args.seed,
                     mode=args.video_mode)
        print(f"video written to {args.video}.npz/.gif")
    return mean, std, returns


if __name__ == "__main__":
    main()


def script_main():
    """Console-script entry: swallow main()'s return so sys.exit(...) is 0."""
    main()
