"""Imitation bootstrap: behavior-clone a scripted demonstrator, emit a
full TrainState checkpoint that the PPO trainer can ``--resume``.

The v0-family reward structure makes Heavy-v0 a speed problem (a policy
completing at 1850 steps still nets -25k under the per-step distance
penalties; docs/BENCHMARKS.md).  The scripted herd-and-push controller
(train/scripted.py) demonstrates fast completions; this tool distills it
into the standard ActorCritic MLP by supervised regression on on-policy
demonstrator rollouts, then hands the result to PPO for reward
finetuning:

    python -m gym_puzzles_tpu.train.imitate --env MultiRobotPuzzleHeavy-v0 \
        --n_envs 4096 --rounds 60 --out models/hv0_bc
    python -m gym_puzzles_tpu.train.cli --env MultiRobotPuzzleHeavy-v0 ... \
        --resume models/hv0_bc/MultiRobotPuzzleHeavy-v0 ...

The checkpoint carries the SAME pytree as the trainer's (params, Adam
state, normalizer with demonstrator obs statistics, env batch state), so
exact ``--resume`` and ``evaluate --checkpoint`` both work unchanged.
The value head is regressed toward the running normalized-return signal
so PPO's first updates start from sane advantages.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gym_puzzles_tpu.train import normalize as nrm
from gym_puzzles_tpu.train.scripted import pusher_action


def bc_train(cfg, rounds: int = 60, bc_lr: float = 1e-3, offset_px: float = 70.0,
             log_every: int = 10, log_fn=print):
    """-> (PPO algo, TrainState with distilled params).

    Each round: roll ``cfg.n_steps`` demonstrator steps in the live
    training env (auto-reset on), update the obs/return normalizer
    exactly like the PPO rollout does, then fit the policy mean to the
    demonstrator actions (MSE) + the value head to the normalized
    discounted-return proxy, with ``cfg.n_epochs`` epochs of
    ``cfg.batch_size`` minibatches.
    """
    from gym_puzzles_tpu.train.ppo import PPO

    algo = PPO(cfg)
    ts = algo.init_state()
    env = algo.env
    net = algo.net
    tx = optax.adam(bc_lr)
    bc_opt = tx.init(ts.params)
    n_steps, n_envs = cfg.n_steps, cfg.n_envs
    total = n_steps * n_envs
    n_minibatch = max(total // cfg.batch_size, 1)
    log_std_target = float(np.log(0.2))

    def rollout(carry, _):
        vstate, obs, norm, key = carry
        act = pusher_action(obs, env.cfg.act_dim // 3, offset_px)
        vstate, nobs, reward, done, _ = env._step_fn(vstate, act, algo.env_params)
        norm, obs_n = nrm.normalize_obs(norm, obs, update=True)
        norm, rew_n = nrm.normalize_reward(norm, reward, done, update=True)
        return (vstate, nobs, norm, key), (obs_n, act, rew_n, done)

    def loss_fn(params, obs_n, act, ret_n):
        mean, log_std, value = net.apply(params, obs_n)
        pi_loss = ((mean - act) ** 2).mean()
        std_loss = ((log_std - log_std_target) ** 2).mean()
        v_loss = ((value - ret_n) ** 2).mean()
        return pi_loss + 0.1 * std_loss + 0.5 * v_loss, (pi_loss, v_loss)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def bc_round(ts, bc_opt, key):
        key, k_roll, k_perm = jax.random.split(key, 3)
        carry = (ts.vstate, ts.last_obs, ts.normalizer, k_roll)
        (vstate, last_obs, norm, _), (obs_n, act, rew_n, done) = jax.lax.scan(
            rollout, carry, None, length=n_steps)
        # normalized-return proxy for the value head: per-step normalized
        # reward discounted forward (cheap reverse scan); episode
        # boundaries mask the accumulator so returns do not bleed across
        # auto-resets within the window
        def disc(c, rd):
            r, d = rd
            c = r + cfg.gamma * c * (1.0 - d.astype(r.dtype))
            return c, c
        _, ret_n = jax.lax.scan(disc, jnp.zeros_like(rew_n[0]), (rew_n, done),
                                reverse=True)
        flat_obs = obs_n.reshape(total, -1)
        flat_act = act.reshape(total, -1)
        flat_ret = ret_n.reshape(total)

        def epoch(carry, k):
            params, opt = carry
            perm = jax.random.permutation(k, total)
            idxs = perm[: n_minibatch * cfg.batch_size].reshape(
                n_minibatch, cfg.batch_size)

            def mb(carry, idx):
                params, opt = carry
                (loss, aux), g = grad_fn(params, flat_obs[idx], flat_act[idx],
                                         flat_ret[idx])
                upd, opt = tx.update(g, opt, params)
                return (optax.apply_updates(params, upd), opt), (loss, *aux)

            (params, opt), m = jax.lax.scan(mb, (params, opt), idxs)
            return (params, opt), m

        (params, bc_opt), metrics = jax.lax.scan(
            epoch, (ts.params, bc_opt), jax.random.split(k_perm, cfg.n_epochs))
        ts = ts.replace(params=params, vstate=vstate, last_obs=last_obs,
                        normalizer=norm, key=key,
                        timesteps=ts.timesteps + total)
        return ts, bc_opt, metrics

    key = jax.random.key(cfg.seed)
    for r in range(rounds):
        key, k = jax.random.split(key)
        ts, bc_opt, metrics = bc_round(ts, bc_opt, k)
        if r % log_every == 0 or r == rounds - 1:
            loss, pi, v = jax.device_get(
                jax.tree_util.tree_map(lambda x: x.mean(), metrics))
            log_fn(f'{{"bc_round": {r}, "loss": {float(loss):.5f}, '
                   f'"pi_mse": {float(pi):.5f}, "v_mse": {float(v):.5f}}}')
    return algo, ts


def main(argv=None):
    import argparse

    from gym_puzzles_tpu.train import checkpoint as ckpt
    from gym_puzzles_tpu.train.ppo import PPOConfig
    from gym_puzzles_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description="behavior-clone the scripted pusher")
    p.add_argument("--env", default="MultiRobotPuzzleHeavy-v0")
    p.add_argument("--n_envs", default=4096, type=int)
    p.add_argument("--n_steps", default=64, type=int)
    p.add_argument("--batch_size", default=8192, type=int)
    p.add_argument("--n_epochs", default=4, type=int)
    p.add_argument("--rounds", default=60, type=int)
    p.add_argument("--bc_lr", default=1e-3, type=float)
    p.add_argument("--offset_px", default=70.0, type=float)
    p.add_argument("--gamma", default=0.999, type=float)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--env_backend", default=None,
                   choices=["xla", "pallas", "fused"])
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    backend = args.env_backend or (
        "fused" if jax.default_backend() == "tpu" and args.n_envs % 128 == 0
        else "xla")
    cfg = PPOConfig(env_id=args.env, n_envs=args.n_envs, n_steps=args.n_steps,
                    batch_size=args.batch_size, n_epochs=args.n_epochs,
                    gamma=args.gamma, seed=args.seed, env_backend=backend)
    algo, ts = bc_train(cfg, rounds=args.rounds, bc_lr=args.bc_lr,
                        offset_px=args.offset_px)
    path = f"{args.out}/{cfg.env_id}"
    ckpt.save(path, ts, ckpt.step_count(ts.timesteps))
    print(f"saved BC checkpoint to {path} ({ckpt.step_count(ts.timesteps)} demo steps)")


if __name__ == "__main__":
    main()
