"""Worker for the 2-process jax.distributed test (launched by
tests/test_multiprocess.py, one subprocess per rank).

Brings up the multi-process runtime through the SAME entry the production
path uses (``parallel.mesh.init_distributed``), builds a DistributedPPO
over the *global* mesh (both processes' devices), runs two train steps, and
prints one JSON line per step with the replicated metrics plus a params
checksum -- the parent asserts the lines agree bitwise across ranks.

Usage: python tests/_mp_ppo_worker.py <process_id> <num_processes> <port>
"""

import jax

jax.config.update("jax_platforms", "cpu")

import json  # noqa: E402
import os  # noqa: E402
import sys  # noqa: E402

import numpy as np  # noqa: E402

# the script lives in tests/; make the repo root importable (sys.path
# surgery, NOT PYTHONPATH -- the env var would shadow sitecustomize)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

# CPU collectives across processes ride gloo
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from gym_puzzles_tpu.parallel.mesh import (  # noqa: E402
    DistributedPPO,
    init_distributed,
    make_mesh,
)
from gym_puzzles_tpu.train.ppo import PPOConfig  # noqa: E402

init_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc
n_local = jax.local_device_count()
assert jax.device_count() == nproc * n_local

mesh = make_mesh()  # spans both processes' devices
cfg = PPOConfig(env_id="MultiRobotPuzzle-v0", n_envs=8, n_steps=4,
                batch_size=8, n_epochs=1, seed=0)
algo = DistributedPPO(cfg, mesh)
ts = algo.init_state()


def rep0(x):
    """First addressable replica of a replicated global array."""
    return np.asarray(x.addressable_shards[0].data)


for step in range(2):
    ts, metrics = algo.train_step(ts)
    params_sum = float(
        sum(np.abs(rep0(leaf)).sum() for leaf in jax.tree_util.tree_leaves(ts.params))
    )
    out = {
        "pid": pid,
        "step": step,
        "devices": jax.device_count(),
        "params_sum": params_sum,
        "metrics": {
            k: float(rep0(v).reshape(-1)[0]) for k, v in sorted(metrics.items())
        },
    }
    print("RESULT " + json.dumps(out), flush=True)
