"""Multi-host failure detection.

The reference's only failure handling is a try/except around model.learn
(train/train.py:102-116).  For pod-slice runs the rebuild adds a collective
heartbeat: every host joins a tiny psum on a watchdog cadence; if any host
stalls, the collective blocks and the watchdog raises on every healthy host
after ``timeout`` so the job can restart from the latest orbax checkpoint
(train/checkpoint.py) rather than hang.
"""

from __future__ import annotations

import threading
import time


class Heartbeat:
    """Watchdog around a collective ping.

        hb = Heartbeat(timeout=120.0)
        while training:
            ts, metrics = algo.train_step(ts)
            hb.ping()          # raises HeartbeatTimeout if the last
                               # collective round took longer than timeout
    """

    def __init__(self, timeout: float = 120.0, interval: float = 10.0):
        self.timeout = timeout
        self.interval = interval
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._stalled = threading.Event()
        self._thread = threading.Thread(target=self._watch, daemon=True)
        self._thread.start()

    def _watch(self):
        while not self._stop.wait(self.interval):
            if time.monotonic() - self._last > self.timeout:
                self._stalled.set()
                return

    def ping(self):
        import jax
        import jax.numpy as jnp

        if self._stalled.is_set():
            raise HeartbeatTimeout(
                f"no heartbeat for > {self.timeout}s -- a host is stalled; "
                "restart from the latest checkpoint"
            )
        # tiny all-reduce across all processes/devices: completes only when
        # every participant arrives
        x = jnp.ones((jax.local_device_count(),))
        jax.block_until_ready(
            jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
        )
        self._last = time.monotonic()

    def close(self):
        self._stop.set()


class HeartbeatTimeout(RuntimeError):
    pass
