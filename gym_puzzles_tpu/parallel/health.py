"""Multi-host failure detection.

The reference's only failure handling is a try/except around model.learn
(train/train.py:102-116).  For pod-slice runs the rebuild adds a collective
heartbeat: every host joins a tiny psum on a watchdog cadence; if any host
stalls or dies, the collective never completes on the healthy hosts -- so
``ping`` bounds the collective with a deadline and raises
:class:`HeartbeatTimeout` when it expires, letting the job restart from the
latest orbax checkpoint (train/checkpoint.py) instead of hanging.

Design note: the collective runs on a helper thread precisely because a
blocked ``psum`` cannot be interrupted from inside -- the caller waits on
an event with a timeout and raises, abandoning the stuck daemon thread.
After a timeout the process should be treated as poisoned (the distributed
runtime may hold a half-completed collective) and restarted; that is the
contract the checkpoint/resume path exists for.  The failure path is
exercised by a real 2-process kill test (tests/test_multiprocess.py).
"""

from __future__ import annotations

import threading


class Heartbeat:
    """Deadline-bounded collective ping.

        hb = Heartbeat(timeout=120.0)
        while training:
            ts, metrics = algo.train_step(ts)
            hb.ping()          # raises HeartbeatTimeout if the collective
                               # round does not complete within timeout

    ``interval`` is accepted for backward compatibility and unused (the
    deadline now bounds every ping directly instead of sampling a
    last-success timestamp on a side thread).
    """

    def __init__(self, timeout: float = 120.0, interval: float | None = None):
        self.timeout = timeout
        del interval

    def _collective(self):
        import jax
        import jax.numpy as jnp

        # tiny all-reduce across all processes/devices: completes only when
        # every participant arrives
        x = jnp.ones((jax.local_device_count(),))
        jax.block_until_ready(
            jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
        )

    def ping(self):
        done = threading.Event()
        err: list[BaseException] = []

        def run():
            try:
                self._collective()
            except BaseException as e:  # surfaced to the caller below
                err.append(e)
            finally:
                done.set()

        t = threading.Thread(target=run, daemon=True, name="heartbeat-ping")
        t.start()
        if not done.wait(self.timeout):
            raise HeartbeatTimeout(
                f"collective heartbeat did not complete within {self.timeout}s "
                "-- a participant is stalled or dead; restart from the latest "
                "checkpoint"
            )
        if err:
            # a dead peer can also surface as a transport error (e.g. gloo
            # connection reset) instead of a silent stall -- same remedy
            raise HeartbeatTimeout(
                f"collective heartbeat failed: {err[0]!r}"
            ) from err[0]

    def close(self):
        pass


class HeartbeatTimeout(RuntimeError):
    pass
