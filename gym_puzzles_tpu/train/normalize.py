"""VecNormalize-equivalent running normalization, as a pure pytree.

The reference wraps its envs in SB3 ``VecNormalize`` (train/train.py:82):
observations are standardized by running mean/var (clip 10) and rewards are
scaled by the running std of the *discounted return* (clip 10).  That
normalization is part of observable training behavior, and its statistics
are part of the checkpoint contract (train.py:149 saves them; test.py:66-68
reloads with training=False), so it is reproduced here exactly, batched.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

CLIP_OBS = 10.0
CLIP_REWARD = 10.0
EPS = 1e-8


@struct.dataclass
class RunningMeanStd:
    mean: object
    var: object
    count: object

    @staticmethod
    def create(shape):
        return RunningMeanStd(
            mean=jnp.zeros(shape, jnp.float32),
            var=jnp.ones(shape, jnp.float32),
            count=jnp.asarray(1e-4, jnp.float32),
        )

    def update(self, batch):
        """Parallel Welford update over the leading batch axis."""
        b_mean = batch.mean(axis=0)
        b_var = batch.var(axis=0)
        b_count = jnp.asarray(batch.shape[0], jnp.float32)
        delta = b_mean - self.mean
        tot = self.count + b_count
        mean = self.mean + delta * b_count / tot
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + delta**2 * self.count * b_count / tot
        return RunningMeanStd(mean=mean, var=m2 / tot, count=tot)


@struct.dataclass
class NormalizerState:
    obs_rms: RunningMeanStd
    ret_rms: RunningMeanStd
    returns: object  # [E] running discounted returns
    gamma: object

    @staticmethod
    def create(obs_dim, num_envs, gamma=0.99):
        return NormalizerState(
            obs_rms=RunningMeanStd.create((obs_dim,)),
            ret_rms=RunningMeanStd.create(()),
            returns=jnp.zeros((num_envs,), jnp.float32),
            gamma=jnp.asarray(gamma, jnp.float32),
        )


def normalize_obs(state: NormalizerState, obs, update: bool = True):
    """-> (state', normalized obs).  update=False for eval (VecNormalize
    training=False, test.py:66-68)."""
    if update:
        state = state.replace(obs_rms=state.obs_rms.update(obs))
    n = (obs - state.obs_rms.mean) / jnp.sqrt(state.obs_rms.var + EPS)
    return state, jnp.clip(n, -CLIP_OBS, CLIP_OBS)


def normalize_reward(state: NormalizerState, reward, done, update: bool = True):
    """-> (state', normalized reward).  Scales by the running std of the
    discounted return (SB3 semantics: returns updated before the rms)."""
    returns = state.returns * state.gamma + reward
    if update:
        state = state.replace(ret_rms=state.ret_rms.update(returns), returns=returns)
        state = state.replace(returns=jnp.where(done, 0.0, state.returns))
    n = reward / jnp.sqrt(state.ret_rms.var + EPS)
    return state, jnp.clip(n, -CLIP_REWARD, CLIP_REWARD)
