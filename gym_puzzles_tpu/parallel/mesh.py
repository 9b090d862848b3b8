"""Device-mesh data parallelism: env batch sharded over chips, learner
replicated, XLA collectives over ICI.

The reference has NO distribution: DummyVecEnv is a sequential in-process
loop (train/train.py:80) and "multi-machine" means isolated wandb sweep
agents (README.md:101-107).  This module is the TPU-native story those
leave on the table:

* a 1-D ``Mesh`` over all local (or pod-slice) devices with axis ``data``;
* the PPO train step wrapped in ``shard_map``: each device rolls out its
  env shard and computes minibatch gradients locally; ``psum``/``pmean``
  all-reduce gradients, KL stats and normalizer moments over ICI;
* multi-host entry via ``jax.distributed.initialize`` -- one process per
  host, the same program, the same mesh spanning the slice.

Scaling shape: the env batch is embarrassingly parallel (no cross-env
interaction), so the only per-update communication is O(params) for the
gradient all-reduce -- the classic >=90% DP scaling regime when
n_envs/chip is kept constant.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gym_puzzles_tpu.train.ppo import PPO, PPOConfig, TrainState

DATA_AXIS = "data"


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up (jax.distributed).  No-op on a single process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def train_state_specs(axis: str = DATA_AXIS, batch_axis: int = -1):
    """PartitionSpec pytree-builder for TrainState: env-batch leaves sharded
    on the data axis, learner state replicated.

    The env state pytree keeps its batch dimension *last* (lane-major TPU
    layout, see api/vector.py), so its leaves shard on their trailing axis;
    the user-contract leaves (last_obs, per-env stats, keys) are batch-first.
    """

    def spec_for(path, leaf):
        top = path[0].name if path else ""
        names = [getattr(p, "name", "") for p in path]
        ndim = getattr(leaf, "ndim", len(getattr(leaf, "shape", ())))
        if top == "vstate" and "env" in names:
            if batch_axis == -1:
                return P(*([None] * (ndim - 1)), axis)
            return P(axis)
        if top == "vstate" and "key" in names:
            return P(axis)
        if top in ("last_obs", "ep_return", "ep_len"):
            return P(axis)
        if top == "normalizer" and "returns" in names:
            return P(axis)
        return P()

    def build(ts: TrainState):
        return jax.tree_util.tree_map_with_path(spec_for, ts)

    return build


class DistributedPPO:
    """PPO whose train step runs under shard_map over a 1-D data mesh.

    Usage::

        mesh = make_mesh()
        algo = DistributedPPO(PPOConfig(env_id=..., n_envs=4096), mesh)
        ts = algo.init_state()          # env batch sharded over the mesh
        ts, metrics = algo.train_step(ts)
    """

    def __init__(self, cfg: PPOConfig, mesh: Mesh):
        n_dev = mesh.devices.size
        if cfg.n_envs % n_dev:
            raise ValueError(f"n_envs={cfg.n_envs} must divide over {n_dev} devices")
        self.mesh = mesh
        self.ppo = PPO(cfg)
        self.cfg = cfg
        axis = mesh.axis_names[0]

        inner = self.ppo._build_train_step(axis_name=axis, n_devices=n_dev)
        spec_builder = train_state_specs(axis, batch_axis=self.ppo.env.batch_axis)
        ts_template = jax.eval_shape(self.ppo.init_state, jax.random.key(0))
        in_specs = spec_builder(ts_template)

        # metrics structure from the single-device step on a local-shard
        # template (the distributed inner can't be shape-evaluated outside
        # the mesh because of its collectives)
        plain = self.ppo._build_train_step()
        out_shapes = jax.eval_shape(plain, _local_shard_shapes(ts_template, in_specs, n_dev))
        metrics_spec = jax.tree_util.tree_map(lambda _: P(), out_shapes[1])

        self._step = jax.jit(
            jax.shard_map(
                inner,
                mesh=mesh,
                in_specs=(in_specs,),
                out_specs=(in_specs, metrics_spec),
                # the engine's Gauss-Seidel scans mix replicated constraint
                # tables with device-varying state; skip the varying-manifest
                # check (collective placement is explicit in the PPO step)
                check_vma=False,
            ),
            donate_argnums=0,
        )
        self._in_specs = in_specs

    def init_state(self) -> TrainState:
        shardings = jax.tree_util.tree_map(
            lambda spec: NamedSharding(self.mesh, spec), self._in_specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        # build the state INSIDE jit with global out_shardings: unlike
        # device_put, this works when the mesh spans multiple processes
        # (device_put rejects non-addressable shardings) -- each process
        # traces the same program and XLA materializes only its own shards
        return jax.jit(self.ppo.init_state, out_shardings=shardings)()

    def train_step(self, ts: TrainState):
        return self._step(ts)

    def set_hparams(self, ts: TrainState, **kw):
        return self.ppo.set_hparams(ts, **kw)

    def learn(self, total_timesteps=None, log_fn=None, state=None):
        cfg = self.cfg
        total = total_timesteps or cfg.total_timesteps
        ts = self.init_state() if state is None else state
        per_update = cfg.n_steps * cfg.n_envs
        n_updates = max(1, total // per_update)
        for u in range(n_updates):
            ts = self.ppo.apply_curriculum(ts, u, n_updates)
            ts, metrics = self.train_step(ts)
            if log_fn is not None:
                log_fn(u, jax.device_get(metrics))
        return ts


def _local_shard_shapes(template, specs, n_dev):
    """ShapeDtypeStructs of one device's shard, for shape evaluation."""

    def shrink(leaf, spec):
        shape = list(leaf.shape)
        for dim, name in enumerate(spec):
            if name is not None and dim < len(shape):
                shape[dim] //= n_dev
        return jax.ShapeDtypeStruct(tuple(shape), leaf.dtype)

    return jax.tree_util.tree_map(
        shrink, template, specs, is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct)
    )
