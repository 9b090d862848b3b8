"""PPO learner: the TPU-native replacement for the reference's SB3 training
stack (train/train.py: DummyVecEnv + VecNormalize + PPO.learn).

Shape of the computation: one ``train_step`` = one jitted XLA program that
  1. rolls the vectorized env forward ``n_steps`` with ``lax.scan`` (env
     state never leaves the device -- the reference's sequential Python
     env loop, train.py:80 + SB3 collect_rollouts, is the throughput
     bottleneck this removes),
  2. computes GAE(gamma, lambda) advantages,
  3. runs ``n_epochs`` x minibatch SGD with the clipped surrogate, entropy
     bonus, value loss, global-norm grad clipping, and SB3's target_kl
     early stop (break when approx_kl > 1.5 * target_kl).

Hyperparameter names and defaults mirror train/configs/ppo-mrp-*.json so the
reference's configs load directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from gym_puzzles_tpu.api.vector import VectorEnv
from gym_puzzles_tpu.train import normalize as nrm
from gym_puzzles_tpu.train.networks import ActorCritic, gaussian_entropy, gaussian_log_prob


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    env_id: str = "MultiRobotPuzzle-v0"
    n_envs: int = 6
    n_steps: int = 4096
    batch_size: int = 128
    n_epochs: int = 10
    learning_rate: float = 0.00063
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    ent_coef: float = 0.01
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    target_kl: float | None = 0.01
    net_arch: tuple = (256, 256)
    # 'mlp' (SB3 MlpPolicy, the reference's configuration) or 'cnn' (SB3
    # CnnPolicy / NatureCNN -- what SB3 selects for the v0 image-obs mode)
    policy: str = "mlp"
    normalize: bool = True
    seed: int = 17
    total_timesteps: int = 1_000_000
    # env backend: 'fused' = whole engine tick in one VMEM-resident kernel
    # (TPU throughput path), 'pallas' = Pallas contact solve only (both
    # need n_envs % 128 == 0); 'xla' = portable default
    env_backend: str = "xla"
    # Reward curriculum, the reference trainer's contract (SURVEY §3.3):
    # update_params(timestep, decay) scales the shaped penalties/completion
    # reward each update (02.py:227-230); update_goal(epoch, nb_epochs)
    # shrinks the goal epsilon over training (00.py:245-246).  env params
    # ride TrainState, so schedule updates never recompile the train step.
    update_params_decay: float | None = None
    update_goal: bool = False
    # Linear lr decay over the run (SB3's `learning_rate=linear_schedule`).
    # Implemented via the dynamic HParams pytree -- no recompiles.
    anneal_lr: bool = False
    # Reward-weight overrides by the reference's set_reward_params kwarg
    # names (00.py:231-239), e.g. (("agentDelta", 30.0), ("blockDelta",
    # 400.0)).  A LIVE v0-family surface: the weights are consumed every
    # step (00.py:480-492), so a shaping curriculum on them stays inside
    # the reference's own capability envelope.  Tuple-of-pairs (not dict)
    # keeps the config hashable.
    reward_params: tuple = ()
    # Linearly anneal the reward_params overrides back to the variant's
    # defaults over the first N updates of the run (0 = hold them fixed).
    # Weights ride TrainState as dynamic scalars -- no recompiles.
    reward_anneal_updates: int = 0
    # Solver iteration counts (None = the reference's 180/60,
    # multi_robot_puzzle_00.py:428).  Reduced counts trade trajectory
    # parity for throughput -- see the iteration ladder in
    # docs/BENCHMARKS.md before changing them.
    velocity_iters: int | None = None
    position_iters: int | None = None
    # Training-horizon override (None = the registered max_episode_steps,
    # gym_puzzles/__init__.py:6,13,20,27,34).  A shortened horizon is a
    # completion-speed curriculum: only episodes finishing inside it earn
    # the +10000 completion reward.  Honest evals (train/evaluate.py)
    # always run the registered limit.
    max_episode_steps: int | None = None

    @staticmethod
    def from_reference_json(config: dict, **overrides) -> "PPOConfig":
        """Load a reference train/configs/*.json dict (train.py:33-41)."""
        alg = dict(config.get("alg_params", {}))
        kw: dict[str, Any] = dict(
            env_id=config.get("env", "MultiRobotPuzzle-v0"),
            n_envs=config.get("n_envs", 6),
        )
        for k in ("learning_rate", "n_steps", "batch_size", "n_epochs", "gamma",
                  "gae_lambda", "clip_range", "ent_coef", "vf_coef",
                  "max_grad_norm", "target_kl"):
            if k in alg:
                kw[k] = alg[k]
        net = alg.get("policy_kwargs", {}).get("net_arch")
        if net:
            kw["net_arch"] = tuple(net)
        kw.update(overrides)
        return PPOConfig(**kw)


@struct.dataclass
class HParams:
    """Optimization hyperparameters as DYNAMIC scalars riding TrainState.

    The wandb sweep the reference ships (train/sweep-bayes.yml) searches
    exactly these knobs; baking them into the jitted program as HLO
    constants would force a full recompile (minutes of Mosaic kernel
    compilation) per trial.  As f32 arguments they keep one compiled
    executable across every trial and enable schedules (lr annealing,
    clip decay) at zero cost.  Shape-affecting knobs (n_steps, batch_size,
    n_epochs, n_envs, net_arch) stay static in PPOConfig.
    """

    learning_rate: Any
    lr_base: Any  # schedule anchor: what anneal_lr scales (set_hparams keeps it)
    clip_range: Any
    ent_coef: Any
    vf_coef: Any
    max_grad_norm: Any
    target_kl: Any  # <= 0 disables the KL stop (dynamic -- no recompile)
    gamma: Any
    gae_lambda: Any

    @staticmethod
    def from_config(cfg: "PPOConfig") -> "HParams":
        f = lambda v: jnp.asarray(v, jnp.float32)  # noqa: E731
        return HParams(
            learning_rate=f(cfg.learning_rate),
            lr_base=f(cfg.learning_rate),
            clip_range=f(cfg.clip_range),
            ent_coef=f(cfg.ent_coef),
            vf_coef=f(cfg.vf_coef),
            max_grad_norm=f(cfg.max_grad_norm),
            target_kl=f(cfg.target_kl if cfg.target_kl is not None else 0.0),
            gamma=f(cfg.gamma),
            gae_lambda=f(cfg.gae_lambda),
        )


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    normalizer: Any
    vstate: Any  # VectorState
    last_obs: Any  # [E, obs_dim] raw
    key: Any
    timesteps: Any  # int32 env steps consumed
    ep_return: Any  # [E] running raw episode returns
    ep_len: Any  # [E]
    stat_return: Any  # [] EMA of completed episode returns
    stat_count: Any
    env_params: Any  # RewardParams pytree -- curriculum state (quirk #7 hooks)
    hparams: Any  # HParams pytree -- dynamic optimization knobs


@struct.dataclass
class Transition:
    obs: Any
    action: Any
    log_prob: Any
    value: Any
    reward: Any
    done: Any
    status: Any


class PPO:
    """Builder object: holds the env + net and exposes pure jitted fns."""

    def __init__(self, cfg: PPOConfig, env: VectorEnv | None = None):
        self.cfg = cfg
        if env is None:
            if cfg.policy == "cnn":
                from gym_puzzles_tpu.api.image_obs import DeviceImageVectorEnv

                env = DeviceImageVectorEnv(cfg.env_id, num_envs=cfg.n_envs,
                                           backend=cfg.env_backend,
                                           velocity_iters=cfg.velocity_iters,
                                           position_iters=cfg.position_iters)
            else:
                from gym_puzzles_tpu.api.registry import make

                env = make(cfg.env_id, num_envs=cfg.n_envs, backend=cfg.env_backend,
                           velocity_iters=cfg.velocity_iters,
                           position_iters=cfg.position_iters,
                           max_episode_steps=cfg.max_episode_steps)
        self.env = env
        # image envs expose obs_shape (stacked uint8 frames); flat envs don't
        self.obs_shape = getattr(env, "obs_shape", None)
        if self.obs_shape is not None:
            from gym_puzzles_tpu.train.networks import CnnActorCritic

            self.net = CnnActorCritic(act_dim=env.cfg.act_dim)
        else:
            self.net = ActorCritic(act_dim=env.cfg.act_dim, hidden=cfg.net_arch)
        # Adam moments only; global-norm clipping and the -lr step scaling
        # are applied manually from the DYNAMIC HParams so sweeps/schedules
        # never recompile (see HParams).
        self.tx = optax.scale_by_adam(eps=1e-5)
        self.default_env_params = env.default_params()
        self.env_params = (
            self.default_env_params.set_reward_params(**dict(cfg.reward_params))
            if cfg.reward_params else self.default_env_params
        )
        self._train_step = jax.jit(self._build_train_step(), donate_argnums=0)

    # ------------------------------------------------------------------
    def init_state(self, key=None) -> TrainState:
        cfg = self.cfg
        key = jax.random.key(cfg.seed) if key is None else key
        k_net, k_env, k_run = jax.random.split(key, 3)
        vstate, obs = self.env.reset(k_env, self.env_params)
        if self.obs_shape is not None:
            dummy = jnp.zeros((1,) + tuple(self.obs_shape), jnp.uint8)
        else:
            dummy = jnp.zeros((1, self.env.cfg.obs_dim))
        params = self.net.init(k_net, dummy)
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            normalizer=nrm.NormalizerState.create(self.env.cfg.obs_dim, cfg.n_envs, cfg.gamma),
            vstate=vstate,
            last_obs=obs,
            key=k_run,
            timesteps=jnp.asarray(0, jnp.int32),
            ep_return=jnp.zeros((cfg.n_envs,), jnp.float32),
            ep_len=jnp.zeros((cfg.n_envs,), jnp.int32),
            stat_return=jnp.asarray(0.0, jnp.float32),
            stat_count=jnp.asarray(0.0, jnp.float32),
            env_params=jax.tree_util.tree_map(jnp.asarray, self.env_params),
            hparams=HParams.from_config(cfg),
        )

    # ------------------------------------------------------------------
    def _build_train_step(self, axis_name: str | None = None, n_devices: int = 1):
        """axis_name: when set, the returned function is written for use
        inside shard_map over that mesh axis -- per-device env shards,
        pmean'd gradients/metrics, synchronized normalizer statistics and
        KL early-stop (the TPU replacement for the reference's
        single-process learner)."""
        cfg = self.cfg
        env = self.env
        net = self.net
        tx = self.tx
        # VecNormalize semantics: obs normalization only for flat obs (SB3
        # image runs use norm_obs=False); reward normalization either way.
        use_obs_norm = cfg.normalize and self.obs_shape is None
        use_norm = cfg.normalize

        def psync(x):
            return jax.lax.pmean(x, axis_name) if axis_name else x

        def psum(x):
            return jax.lax.psum(x, axis_name) if axis_name else x

        def make_rollout_step(params, env_params):
            def rollout_step(carry, _):
                vstate, last_obs, norm, key, ep_ret, ep_len, stat_r, stat_c = carry
                if use_obs_norm:
                    norm, n_obs = nrm.normalize_obs(norm, last_obs, update=True)
                else:
                    n_obs = last_obs
                key, k_act = jax.random.split(key)
                mean, log_std, value = net.apply(params, n_obs)
                noise = jax.random.normal(k_act, mean.shape)
                action = mean + jnp.exp(log_std) * noise
                log_prob = gaussian_log_prob(mean, log_std, action)
                clipped = jnp.clip(action, -1.0, 1.0)  # SB3 clips to the space

                vstate, obs, reward, done, info = env._step_fn(vstate, clipped, env_params)
                if use_norm:
                    norm, n_reward = nrm.normalize_reward(norm, reward, done, update=True)
                else:
                    n_reward = reward

                ep_ret = ep_ret + reward
                ep_len = ep_len + 1
                finished = done
                stat_r = stat_r + jnp.where(finished, ep_ret, 0.0).sum()
                stat_c = stat_c + finished.sum()
                ep_ret = jnp.where(finished, 0.0, ep_ret)
                ep_len = jnp.where(finished, 0, ep_len)

                tr = Transition(
                    obs=n_obs, action=action, log_prob=log_prob, value=value,
                    reward=n_reward, done=done, status=info["done_status"],
                )
                return (vstate, obs, norm, key, ep_ret, ep_len, stat_r, stat_c), tr

            return rollout_step

        def loss_fn(params, batch, advantages, returns, hp):
            mean, log_std, value = net.apply(params, batch.obs)
            log_prob = gaussian_log_prob(mean, log_std, batch.action)
            ratio = jnp.exp(log_prob - batch.log_prob)
            a = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
            pg1 = a * ratio
            pg2 = a * jnp.clip(ratio, 1.0 - hp.clip_range, 1.0 + hp.clip_range)
            pg_loss = -jnp.minimum(pg1, pg2).mean()
            v_loss = ((returns - value) ** 2).mean()
            ent = gaussian_entropy(log_std)
            total = pg_loss + hp.vf_coef * v_loss - hp.ent_coef * ent
            approx_kl = ((ratio - 1.0) - jnp.log(ratio)).mean()
            return total, (pg_loss, v_loss, ent, approx_kl)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def train_step(ts: TrainState):
            hp = ts.hparams
            # --- rollout -------------------------------------------------
            if axis_name:
                # replicated master key -> decorrelated per-device streams;
                # the stored key advances replicated.
                local_key = jax.random.fold_in(ts.key, jax.lax.axis_index(axis_name))
                next_master = jax.random.split(ts.key, 2)[0]
            else:
                local_key = ts.key
                next_master = None
            carry = (ts.vstate, ts.last_obs, ts.normalizer, local_key,
                     ts.ep_return, ts.ep_len, ts.stat_return, ts.stat_count)
            carry, traj = jax.lax.scan(
                make_rollout_step(ts.params, ts.env_params), carry, None,
                length=cfg.n_steps
            )
            vstate, last_obs, norm, key, ep_ret, ep_len, stat_r, stat_c = carry
            if axis_name:
                # sync normalizer statistics across the mesh (per-device
                # updates during the rollout drift apart): mean/var averaged,
                # counts accumulated as old + sum(per-device increments)
                def sync_rms(new, old):
                    return new.replace(
                        mean=psync(new.mean),
                        var=psync(new.var),
                        count=old.count + psum(new.count - old.count),
                    )

                norm = norm.replace(
                    obs_rms=sync_rms(norm.obs_rms, ts.normalizer.obs_rms),
                    ret_rms=sync_rms(norm.ret_rms, ts.normalizer.ret_rms),
                )
                stat_r = ts.stat_return + psum(stat_r - ts.stat_return)
                stat_c = ts.stat_count + psum(stat_c - ts.stat_count)

            # bootstrap value for GAE
            if use_obs_norm:
                _, n_last = nrm.normalize_obs(norm, last_obs, update=False)
            else:
                n_last = last_obs
            _, _, last_value = net.apply(ts.params, n_last)

            # --- GAE (SB3 semantics: dones mark episode boundaries) ------
            def gae_step(carry, tr_t):
                gae, next_value = carry
                nonterminal = 1.0 - tr_t.done.astype(jnp.float32)
                delta = tr_t.reward + hp.gamma * next_value * nonterminal - tr_t.value
                gae = delta + hp.gamma * hp.gae_lambda * nonterminal * gae
                return (gae, tr_t.value), gae

            (_, _), advantages = jax.lax.scan(
                gae_step, (jnp.zeros_like(last_value), last_value), traj, reverse=True
            )
            returns = advantages + traj.value

            # --- flatten (local shapes: under shard_map this device sees
            # n_envs / n_devices env columns) -----------------------------
            total = traj.done.shape[0] * traj.done.shape[1]
            flat = jax.tree_util.tree_map(lambda x: x.reshape((total,) + x.shape[2:]), traj)
            adv_f = advantages.reshape(total)
            ret_f = returns.reshape(total)
            # per-device minibatch keeps the reference's *global* batch size
            mb_size = max(1, min(cfg.batch_size // n_devices, total))
            n_minibatch = max(1, total // mb_size)

            def epoch_step(carry, _):
                params, opt_state, key, stop, kl_last = carry
                key, k = jax.random.split(key)
                perm = jax.random.permutation(k, total)

                def mb_step(carry, idx):
                    params, opt_state, stop, kl_last = carry
                    mb = jax.tree_util.tree_map(lambda x: x[idx], flat)
                    (loss, (pg, vl, ent, kl)), grads = grad_fn(
                        params, mb, adv_f[idx], ret_f[idx], hp
                    )
                    # DP all-reduce: same update on every device, KL stop in sync
                    grads = psync(grads)
                    kl = psync(kl)
                    # global-norm clip + Adam + (-lr) step, all from dynamic hp
                    g_norm = optax.global_norm(grads)
                    clip = jnp.minimum(1.0, hp.max_grad_norm / (g_norm + 1e-6))
                    grads = jax.tree_util.tree_map(lambda g: g * clip, grads)
                    updates, new_opt = tx.update(grads, opt_state, params)
                    updates = jax.tree_util.tree_map(
                        lambda u: -hp.learning_rate * u, updates
                    )
                    new_params = optax.apply_updates(params, updates)
                    # SB3 target_kl: stop all further minibatches this update.
                    # Fully dynamic: hp.target_kl <= 0 disables the stop, so
                    # sweeps/set_hparams control it without a recompile and
                    # regardless of whether cfg.target_kl was None.
                    newly_stopped = (hp.target_kl > 0.0) & (kl > 1.5 * hp.target_kl)
                    use = ~stop
                    params = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(use, new, old), new_params, params
                    )
                    opt_state = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(use, new, old), new_opt, opt_state
                    )
                    stop = stop | (use & newly_stopped)
                    kl_last = jnp.where(use, kl, kl_last)
                    return (params, opt_state, stop, kl_last), (loss, pg, vl, ent)

                idxs = perm[: n_minibatch * mb_size].reshape(n_minibatch, mb_size)
                (params, opt_state, stop, kl_last), metrics = jax.lax.scan(
                    mb_step, (params, opt_state, stop, kl_last), idxs
                )
                return (params, opt_state, key, stop, kl_last), metrics

            init = (ts.params, ts.opt_state, key, jnp.asarray(False), jnp.asarray(0.0))
            (params, opt_state, key, stop, kl_last), metrics = jax.lax.scan(
                epoch_step, init, None, length=cfg.n_epochs
            )
            loss_m, pg_m, vl_m, ent_m = metrics

            completed = stat_c - ts.stat_count
            mean_ret = jnp.where(
                completed > 0, (stat_r - ts.stat_return) / jnp.maximum(completed, 1.0), jnp.nan
            )
            global_steps = ts.timesteps + total * n_devices
            out_metrics = {
                "loss": psync(loss_m.mean()),
                "policy_loss": psync(pg_m.mean()),
                "value_loss": psync(vl_m.mean()),
                "entropy": psync(ent_m.mean()),
                "approx_kl": kl_last,
                "kl_stopped": stop,
                "ep_rew_mean": mean_ret,
                "episodes": completed,
                "completions": psum((flat.status == 3).sum()),
                "timesteps": global_steps,
            }
            new_ts = TrainState(
                params=params,
                opt_state=opt_state,
                normalizer=norm,
                vstate=vstate,
                last_obs=last_obs,
                key=next_master if axis_name else key,
                timesteps=global_steps,
                ep_return=ep_ret,
                ep_len=ep_len,
                stat_return=stat_r,
                stat_count=stat_c,
                env_params=ts.env_params,
                hparams=ts.hparams,
            )
            return new_ts, out_metrics

        return train_step

    # ------------------------------------------------------------------
    def train_step(self, ts: TrainState):
        return self._train_step(ts)

    def apply_curriculum(self, ts: TrainState, update: int, n_updates: int):
        """The reference trainer's per-epoch hooks (SURVEY §3.3): decay the
        shaped rewards (`update_params`, 02.py:227-230) and shrink the goal
        epsilon (`update_goal`, 00.py:245-246).  env params live in
        TrainState as traced arrays, so this never recompiles."""
        cfg = self.cfg
        p = ts.env_params
        if cfg.reward_anneal_updates and cfg.reward_params:
            # Reward-weight curriculum: linearly anneal the set_reward_params
            # overrides (self.env_params) back to the variant defaults over
            # the first reward_anneal_updates updates.  Computed host-side
            # from the static start/end tables each update; the annealed
            # scalars ride TrainState, so the schedule never recompiles.
            from gym_puzzles_tpu.envs.config import RewardParams

            frac = min(1.0, update / max(1, cfg.reward_anneal_updates))
            fields = {RewardParams.REFERENCE_WEIGHT_NAMES.get(k, k)
                      for k, _ in cfg.reward_params}
            for base, shaped in (
                ("out_of_bounds_penalty", "shaped_bounds_penalty"),
                ("blk_out_of_bounds_penalty", "shaped_blk_bounds_penalty"),
                ("puzzle_complete_reward", "shaped_puzzle_reward"),
            ):
                if base in fields:
                    fields.add(shaped)
            repl = {
                f: np.float32((1.0 - frac) * float(getattr(self.env_params, f))
                              + frac * float(getattr(self.default_env_params, f)))
                for f in fields
            }
            p = p.replace(**repl)
        if cfg.update_params_decay is not None:
            p = p.update_params(ts.timesteps, cfg.update_params_decay)
        if cfg.update_goal:
            base = float(self.env_params.scaled_epsilon)
            p = p.update_goal(update, max(1, n_updates), base)
        if p is not ts.env_params:
            ts = ts.replace(env_params=p)
        if cfg.anneal_lr:
            # anchor to hp.lr_base, not cfg.learning_rate: a sweep-sampled or
            # set_hparams lr must keep its own annealing schedule
            frac = 1.0 - update / max(1, n_updates)
            ts = ts.replace(hparams=ts.hparams.replace(
                learning_rate=ts.hparams.lr_base * jnp.float32(frac)))
        return ts

    def set_reward_params(self, ts: TrainState, **kw):
        """The reference's ``env.set_reward_params`` (00.py:231-239) on a
        live TrainState: override reward weights by their reference kwarg
        names (agentDelta, agentDistance, blockDelta, blockDistance,
        puzzleComp, outOfBounds, blkOutOfBounds) without recompiling."""
        return ts.replace(env_params=ts.env_params.set_reward_params(**kw))

    def set_hparams(self, ts: TrainState, **kw):
        """Update dynamic optimization knobs (see HParams) on a live
        TrainState -- sweeps and schedules without recompiling.  Setting
        ``learning_rate`` also re-anchors ``lr_base`` (what anneal_lr
        scales); ``target_kl=0`` disables the KL stop.  Changing ``gamma``
        also rewrites the reward normalizer's discount so VecNormalize-style
        return scaling stays consistent."""
        kw = {k: jnp.asarray(v, jnp.float32) for k, v in kw.items()}
        if "learning_rate" in kw and "lr_base" not in kw:
            # distinct buffer, NOT an alias: the train step donates the whole
            # TrainState and refuses to donate one buffer twice
            kw["lr_base"] = jnp.array(kw["learning_rate"], copy=True)
        hp = ts.hparams.replace(**kw)
        ts = ts.replace(hparams=hp)
        if "gamma" in kw:
            ts = ts.replace(
                normalizer=ts.normalizer.replace(
                    # copy, not alias (donation -- see lr_base above)
                    gamma=jnp.array(kw["gamma"], copy=True)
                )
            )
        return ts

    def learn(self, total_timesteps=None, log_fn=None, state=None,
              checkpoint_fn=None, checkpoint_every: int = 0):
        """``checkpoint_fn(update, ts)`` fires every ``checkpoint_every``
        updates (0 = only the caller's final save) -- long runs on the
        tunneled TPU runtime can stall mid-flight (observed: an image-env
        leg hung at 19M steps with no error), and periodic saves bound
        what a restart loses."""
        cfg = self.cfg
        total = total_timesteps or cfg.total_timesteps
        ts = self.init_state() if state is None else state
        per_update = cfg.n_steps * cfg.n_envs
        n_updates = max(1, total // per_update)
        for u in range(n_updates):
            ts = self.apply_curriculum(ts, u, n_updates)
            ts, metrics = self.train_step(ts)
            if log_fn is not None:
                log_fn(u, jax.device_get(metrics))
            if (checkpoint_fn is not None and checkpoint_every > 0
                    and u and u % checkpoint_every == 0):
                checkpoint_fn(u, ts)
        return ts
