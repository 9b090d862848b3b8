"""Worker for the 2-process heartbeat failure test (launched by
tests/test_multiprocess.py::test_heartbeat_detects_dead_rank).

Both ranks join jax.distributed and complete one collective heartbeat
round.  Then rank 1 simulates a hang (sleeps without ever pinging again)
while rank 0 pings with a short deadline: the healthy rank's watchdog must
raise HeartbeatTimeout instead of blocking forever in the psum -- the one
behavior a failure detector exists for.

Usage: python tests/_mp_heartbeat_worker.py <process_id> <num_processes> <port>
"""

import jax

jax.config.update("jax_platforms", "cpu")

import os  # noqa: E402
import sys  # noqa: E402
import time  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

jax.config.update("jax_cpu_collectives_implementation", "gloo")

from gym_puzzles_tpu.parallel.health import Heartbeat, HeartbeatTimeout  # noqa: E402
from gym_puzzles_tpu.parallel.mesh import init_distributed  # noqa: E402

init_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)

# round 1: everyone participates -- must complete well inside the deadline
hb = Heartbeat(timeout=60.0)
hb.ping()
print("PING_OK", flush=True)

if pid == 1:
    # simulate a stalled host: never join the next collective.  Outlive the
    # healthy rank's deadline so the stall is a genuine silent hang rather
    # than a connection teardown, then exit without pinging.
    time.sleep(25.0)
    print("STALLER_EXITING", flush=True)
else:
    hb.timeout = 6.0
    t0 = time.monotonic()
    try:
        hb.ping()
        print("NO_TIMEOUT", flush=True)
    except HeartbeatTimeout:
        print(f"TIMEOUT_RAISED after {time.monotonic() - t0:.1f}s", flush=True)
        # after a heartbeat timeout the process is poisoned (the distributed
        # runtime holds a half-completed collective and aborts on normal
        # interpreter shutdown) -- the documented contract is an immediate
        # restart from checkpoint, so exit the way a supervisor would
        os._exit(0)
