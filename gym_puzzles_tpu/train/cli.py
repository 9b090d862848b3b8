"""Training CLI, reference-compatible.

Mirrors train/train.py + train/parsers.py: a JSON config file (the
reference's train/configs/*.json load unchanged), CLI overrides for seed /
timesteps / n_envs and the PPO hyperparameters, optional wandb logging, and
checkpoint save/resume.

    python -m gym_puzzles_tpu.train.cli --config train_configs/ppo-mrp-v0.json \
        --n_envs 4096 --total_timesteps 5000000
"""

from __future__ import annotations

import argparse
import json
import time


def build_parser():
    p = argparse.ArgumentParser(description="PPO on gym_puzzles_tpu")
    # base flags (parsers.py:22-75)
    p.add_argument("--config", default=None, type=str, help="JSON config path")
    p.add_argument("--env", default=None, type=str, help="env id override")
    p.add_argument("--seed", default=17, type=int)
    p.add_argument("--total_timesteps", default=1_000_000, type=int)
    p.add_argument("--n_envs", default=None, type=int)
    p.add_argument("--disable_wandb", action="store_true")
    p.add_argument("--run_wandb_sweep", action="store_true",
                   help="third config tier (parsers.py:61-66, train.py:33-41): "
                        "when set, a wandb sweep agent's wandb.config values "
                        "override the JSON config and CLI flags")
    p.add_argument("--save_model", action="store_true")
    p.add_argument("--checkpoint_dir", default="models", type=str)
    p.add_argument("--checkpoint_every", default=0, type=int,
                   help="ALSO checkpoint every N updates (0 = end only): "
                        "tunneled-TPU runs can stall mid-flight; periodic "
                        "saves bound what a restart loses")
    p.add_argument("--resume", default=None, type=str, help="checkpoint dir to resume")
    p.add_argument("--resume_policy", default=None, type=str,
                   help="warm-start from a slim policy export "
                        "(train/export.py): params + normalizer moments "
                        "graft into a fresh TrainState (new optimizer, env "
                        "batch, PRNG) -- unlike --resume, works across "
                        "n_envs and from the committed checkpoints/")
    p.add_argument("--distributed", action="store_true",
                   help="shard the env batch over all local devices")
    p.add_argument("--update_params_decay", default=None, type=float,
                   help="per-update reward decay (the reference trainer's "
                        "env.update_params(timestep, decay) hook)")
    p.add_argument("--anneal_lr", action="store_true",
                   help="linear lr decay over the run (dynamic -- no recompile)")
    p.add_argument("--update_goal", action="store_true",
                   help="shrink the goal epsilon over training (the "
                        "reference's env.update_goal(epoch, nb_epochs))")
    p.add_argument("--set_reward_params", default=None, type=str,
                   help="reward-weight overrides by the reference's "
                        "set_reward_params kwarg names (00.py:231-239), "
                        "e.g. 'agentDelta=30,blockDelta=400,"
                        "blockDistance=0.005'")
    p.add_argument("--reward_anneal_updates", default=None, type=int,
                   help="linearly anneal --set_reward_params overrides back "
                        "to the variant defaults over the first N updates "
                        "(reward-weight curriculum; dynamic, no recompile)")
    p.add_argument("--policy", default=None, choices=["mlp", "cnn"],
                   help="policy architecture: mlp (reference MlpPolicy) or "
                        "cnn (the v0 image-obs mode, 00.py:161-162,197-200 "
                        "-- trains on device-rendered stacked frames)")
    p.add_argument("--env_backend", default=None,
                   choices=["xla", "pallas", "fused"],
                   help="engine backend: fused = whole engine tick in one "
                        "VMEM-resident kernel (TPU throughput path), pallas "
                        "= Pallas contact solve only; both need "
                        "n_envs %% 128 == 0")
    p.add_argument("--velocity_iters", default=None, type=int,
                   help="solver velocity iterations (default: the "
                        "reference's 180, 00.py:428; see the iteration "
                        "ladder in docs/BENCHMARKS.md)")
    p.add_argument("--position_iters", default=None, type=int,
                   help="solver position iterations (default: the "
                        "reference's 60)")
    p.add_argument("--max_episode_steps", default=None, type=int,
                   help="training-horizon override (speed curriculum: only "
                        "episodes finishing inside it earn the completion "
                        "reward); honest evals keep the registered limit")
    p.add_argument("--log_interval", default=1, type=int)
    # PPO hparams (parsers.py:78-131)
    for name, typ in [
        ("learning_rate", float), ("clip_range", float), ("batch_size", int),
        ("n_epochs", int), ("ent_coef", float), ("n_steps", int),
        ("max_grad_norm", float), ("vf_coef", float), ("gamma", float),
        ("gae_lambda", float), ("target_kl", float),
    ]:
        p.add_argument(f"--{name}", default=None, type=typ)
    return p


def main(argv=None):
    from gym_puzzles_tpu.train.ppo import PPO, PPOConfig
    from gym_puzzles_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    config = {}
    if args.config:
        with open(args.config) as f:
            config = json.load(f)

    overrides = {}
    for k in ("learning_rate", "clip_range", "batch_size", "n_epochs", "ent_coef",
              "n_steps", "max_grad_norm", "vf_coef", "gamma", "gae_lambda",
              "target_kl"):
        v = getattr(args, k)
        if v is not None:
            overrides[k] = v
    if args.env:
        overrides["env_id"] = args.env
    if args.n_envs:
        overrides["n_envs"] = args.n_envs
    if args.env_backend:
        overrides["env_backend"] = args.env_backend
    if args.policy:
        overrides["policy"] = args.policy
    if args.velocity_iters is not None:
        overrides["velocity_iters"] = args.velocity_iters
    if args.position_iters is not None:
        overrides["position_iters"] = args.position_iters
    if args.max_episode_steps is not None:
        overrides["max_episode_steps"] = args.max_episode_steps
    if args.update_params_decay is not None:
        overrides["update_params_decay"] = args.update_params_decay
    if args.update_goal:
        overrides["update_goal"] = True
    if args.anneal_lr:
        overrides["anneal_lr"] = True
    if args.set_reward_params:
        overrides["reward_params"] = tuple(
            (k.strip(), float(v))
            for k, v in (item.split("=") for item in
                         args.set_reward_params.split(",") if item)
        )
    if args.reward_anneal_updates is not None:
        overrides["reward_anneal_updates"] = args.reward_anneal_updates
    overrides["seed"] = args.seed
    overrides["total_timesteps"] = args.total_timesteps

    logger = None
    if not args.disable_wandb:
        try:
            import wandb

            project = overrides.get("env_id") or config.get("env", "MultiRobotPuzzle-v0")
            run = wandb.init(project=project, group="PPO-tpu-v1", config=vars(args))
            logger = run
            if args.run_wandb_sweep:
                # the reference's third config tier (train.py:33-41): a sweep
                # agent's wandb.config wins over JSON + CLI for alg params
                import dataclasses as _dc

                fields = {f.name for f in _dc.fields(PPOConfig)}
                sweep_cfg = {k: v for k, v in dict(wandb.config).items()
                             if k in fields}
                if "net_arch" in sweep_cfg:
                    sweep_cfg["net_arch"] = tuple(sweep_cfg["net_arch"])
                overrides.update(sweep_cfg)
        except Exception as e:  # wandb genuinely optional
            print(f"wandb unavailable ({e}); logging to stdout only")
    elif args.run_wandb_sweep:
        print("--run_wandb_sweep ignored: wandb disabled")

    cfg = PPOConfig.from_reference_json(config, **overrides)
    print(f"config: {cfg}")

    if args.distributed:
        from gym_puzzles_tpu.parallel.mesh import DistributedPPO, make_mesh

        algo = DistributedPPO(cfg, make_mesh())
    else:
        algo = PPO(cfg)

    state = algo.init_state()
    if args.resume:
        import jax
        import jax.numpy as jnp

        from gym_puzzles_tpu.train import checkpoint as ckpt
        from gym_puzzles_tpu.train.ppo import HParams

        state = ckpt.restore(args.resume, state)
        # the session's config/CLI hyperparameters win over the checkpoint's
        # saved HParams (pre-HParams behavior: cfg was baked into the program).
        # Same for env reward params: a resumed leg starts from THIS session's
        # --set_reward_params (or the variant defaults) rather than whatever
        # curriculum state the previous leg ended on -- which is what makes
        # two-leg weight-curriculum recipes (shaped leg -> default-weights
        # converge leg) explicit.
        env_params = (algo.ppo if hasattr(algo, "ppo") else algo).env_params
        state = state.replace(
            hparams=HParams.from_config(cfg),
            env_params=jax.tree_util.tree_map(jnp.asarray, env_params),
            normalizer=state.normalizer.replace(
                gamma=jnp.asarray(cfg.gamma, jnp.float32)),
        )
        print(f"resumed from {args.resume} at {ckpt.step_count(state.timesteps)} steps")
    elif args.resume_policy:
        from gym_puzzles_tpu.train import checkpoint as ckpt

        state = ckpt.restore_policy(args.resume_policy, state)
        print(f"warm-started policy from {args.resume_policy} "
              f"at {ckpt.step_count(state.timesteps)} steps")

    t_start = time.time()
    from gym_puzzles_tpu.train.checkpoint import step_count

    last = {"t": t_start, "steps": step_count(state.timesteps)}

    def log_fn(update, metrics):
        if update % args.log_interval:
            return
        now = time.time()
        steps = step_count(metrics["timesteps"])
        sps = (steps - last["steps"]) / max(now - last["t"], 1e-9)
        last.update(t=now, steps=steps)
        line = {
            "update": update,
            "timesteps": steps,
            "steps_per_s": round(sps),
            "ep_rew_mean": float(metrics["ep_rew_mean"]),
            "episodes": float(metrics["episodes"]),
            "completions": int(metrics["completions"]),
            "loss": float(metrics["loss"]),
            "value_loss": float(metrics["value_loss"]),
            "entropy": float(metrics["entropy"]),
            "approx_kl": float(metrics["approx_kl"]),
        }
        print(json.dumps(line))
        if logger is not None:
            logger.log({"rollout/ep_rew_mean": line["ep_rew_mean"],
                        "time/steps_per_s": sps, **{f"train/{k}": v for k, v in line.items()}})

    checkpoint_fn = None
    if args.save_model:
        from gym_puzzles_tpu.train import checkpoint as ckpt

        path = f"{args.checkpoint_dir}/{cfg.env_id}"

        def checkpoint_fn(update, ts):
            ckpt.save(path, ts, ckpt.step_count(ts.timesteps))
            print(f"periodic checkpoint at update {update} -> {path}",
                  flush=True)

    final = algo.learn(args.total_timesteps, log_fn=log_fn, state=state,
                       checkpoint_fn=checkpoint_fn,
                       checkpoint_every=args.checkpoint_every)

    if args.save_model:
        ckpt.save(path, final, ckpt.step_count(final.timesteps))
        print(f"saved checkpoint to {path}")
    return final


def script_main():
    """Console-script entry: swallow main()'s TrainState return value so the
    setuptools ``sys.exit(main())`` wrapper exits 0."""
    main()


if __name__ == "__main__":
    main()
