"""Worker for the composed recovery test (launched by
tests/test_multiprocess.py::test_recovery_restart_from_checkpoint).

Exercises the full contract parallel/health.py documents -- rank dies ->
survivor raises HeartbeatTimeout -> the job restarts from the latest orbax
checkpoint and continues to the bitwise-expected state -- in three phases,
each a fresh 2-process jax.distributed job over the same 4-device mesh:

* ``control``: train 3 steps straight, print the step-3 params checksum.
* ``fail``: train 2 steps, checkpoint cooperatively (every rank calls
  ckpt.save -- the multi-process orbax path), then rank 1 dies silently;
  rank 0's next heartbeat must raise HeartbeatTimeout and exit the way a
  supervisor-restarted process would.
* ``recover``: fresh job restores the checkpoint and trains 1 more step;
  its params checksum must equal the control run's bitwise.

Usage: python tests/_mp_recovery_worker.py <phase> <pid> <nproc> <port> <ckpt_dir>
"""

import jax

jax.config.update("jax_platforms", "cpu")

import json  # noqa: E402
import os  # noqa: E402
import sys  # noqa: E402
import time  # noqa: E402

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

phase, pid, nproc, port = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
ckpt_dir = sys.argv[5]

jax.config.update("jax_cpu_collectives_implementation", "gloo")

from gym_puzzles_tpu.parallel.health import Heartbeat, HeartbeatTimeout  # noqa: E402
from gym_puzzles_tpu.parallel.mesh import (  # noqa: E402
    DistributedPPO,
    init_distributed,
    make_mesh,
)
from gym_puzzles_tpu.train import checkpoint as ckpt  # noqa: E402
from gym_puzzles_tpu.train.ppo import PPOConfig  # noqa: E402

init_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)

mesh = make_mesh()
cfg = PPOConfig(env_id="MultiRobotPuzzle-v0", n_envs=8, n_steps=4,
                batch_size=8, n_epochs=1, seed=0)
algo = DistributedPPO(cfg, mesh)
ts = algo.init_state()


def params_sum(ts):
    return float(sum(
        np.abs(np.asarray(leaf.addressable_shards[0].data)).sum()
        for leaf in jax.tree_util.tree_leaves(ts.params)
    ))


if phase == "control":
    for _ in range(3):
        ts, _m = algo.train_step(ts)
    print("RESULT " + json.dumps({"pid": pid, "params_sum": params_sum(ts)}),
          flush=True)

elif phase == "fail":
    for _ in range(2):
        ts, _m = algo.train_step(ts)
    # cooperative multi-process checkpoint: every rank calls save (orbax
    # coordinates shard writes over jax.distributed)
    ckpt.save(ckpt_dir, ts, 2)
    print("SAVED", flush=True)
    if pid == 1:
        # die silently: never join another collective, outlive the healthy
        # rank's deadline so this is a genuine stall, not a clean teardown
        time.sleep(25.0)
        print("STALLER_EXITING", flush=True)
    else:
        hb = Heartbeat(timeout=6.0)
        try:
            hb.ping()
            print("NO_TIMEOUT", flush=True)
        except HeartbeatTimeout:
            print("TIMEOUT_RAISED", flush=True)
            # poisoned process: exit as a supervisor restart would
            os._exit(0)

elif phase == "recover":
    ts = ckpt.restore(ckpt_dir, ts)
    ts, _m = algo.train_step(ts)
    print("RESULT " + json.dumps({"pid": pid, "params_sum": params_sum(ts)}),
          flush=True)

else:
    raise SystemExit(f"unknown phase {phase}")
