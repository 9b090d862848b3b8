import numpy as np


class Box:
    def __init__(self, low, high, shape=None, dtype=np.float32):
        low = np.asarray(low, dtype=np.float64)
        high = np.asarray(high, dtype=np.float64)
        if shape is not None:
            low = np.broadcast_to(low, shape).astype(np.float64)
            high = np.broadcast_to(high, shape).astype(np.float64)
        self.low = low
        self.high = high
        self.shape = low.shape
        self.dtype = dtype
        # derive from the global np.random stream rather than OS entropy:
        # the reference's reset takes one action_space.sample() step
        # (00.py:411), so an entropy-seeded space made every parity-drive
        # spawn state process-unique (discovered round 5 -- three runs of
        # the same spawn seed produced three different ret_ref).  Harnesses
        # seed np.random (the reference's own spawn contract), which now
        # pins the sample step too.
        self._rng = np.random.RandomState(np.random.randint(2 ** 31))

    def seed(self, seed=None):
        self._rng = np.random.RandomState(seed)
        return [seed]

    def sample(self):
        lo = np.where(np.isfinite(self.low), self.low, -1.0)
        hi = np.where(np.isfinite(self.high), self.high, 1.0)
        return self._rng.uniform(lo, hi).astype(np.float64)

    def contains(self, x):
        return bool(np.all(x >= self.low) and np.all(x <= self.high))
