"""Policy/value networks.

The reference trains SB3 PPO with ``MlpPolicy`` and ``net_arch=[256, 256]``
(train/configs/ppo-mrp-v3.json:16-18): a shared tanh MLP trunk feeding a
Gaussian policy head with state-independent log-std and a value head.  Same
architecture here in flax, f32 params (MXU-friendly widths; obs dims are
tiny so the matmuls are batch-bound).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class ActorCritic(nn.Module):
    act_dim: int
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs):
        x = obs
        for width in self.hidden:
            x = nn.tanh(nn.Dense(width, kernel_init=nn.initializers.orthogonal(jnp.sqrt(2.0)),
                                 bias_init=nn.initializers.zeros)(x))
        mean = nn.Dense(self.act_dim, kernel_init=nn.initializers.orthogonal(0.01),
                        bias_init=nn.initializers.zeros)(x)
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0),
                         bias_init=nn.initializers.zeros)(x)
        log_std = self.param("log_std", nn.initializers.zeros, (self.act_dim,))
        return mean, log_std, value.squeeze(-1)


class CnnActorCritic(nn.Module):
    """SB3 ``CnnPolicy`` equivalent (NatureCNN trunk) for the v0 image-obs
    pipeline: what the reference's trainer would instantiate for
    ``obs_type='image'`` stacked uint8 frames (00.py:161-162,197-200).

    Convs run in bfloat16 (MXU-native) with f32 params and heads: pixel
    features tolerate bf16, the policy/value heads and log-std stay f32.
    """

    act_dim: int
    hidden: int = 512

    @nn.compact
    def __call__(self, obs):
        x = obs.astype(jnp.float32) / 255.0
        x = x.astype(jnp.bfloat16)
        init = nn.initializers.orthogonal(jnp.sqrt(2.0))
        for feat, kern, stride in ((32, 8, 4), (64, 4, 2), (64, 3, 1)):
            x = nn.relu(nn.Conv(feat, (kern, kern), strides=(stride, stride),
                                padding="VALID", kernel_init=init,
                                dtype=jnp.bfloat16, param_dtype=jnp.float32)(x))
        x = x.reshape((x.shape[0], -1)).astype(jnp.float32)
        x = nn.relu(nn.Dense(self.hidden, kernel_init=init)(x))
        mean = nn.Dense(self.act_dim, kernel_init=nn.initializers.orthogonal(0.01),
                        bias_init=nn.initializers.zeros)(x)
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0),
                         bias_init=nn.initializers.zeros)(x)
        log_std = self.param("log_std", nn.initializers.zeros, (self.act_dim,))
        return mean, log_std, value.squeeze(-1)


def gaussian_log_prob(mean, log_std, action):
    """Diagonal Gaussian log-prob, summed over action dims."""
    var = jnp.exp(2.0 * log_std)
    lp = -0.5 * ((action - mean) ** 2 / var + 2.0 * log_std + jnp.log(2.0 * jnp.pi))
    return lp.sum(axis=-1)


def gaussian_entropy(log_std):
    return (log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e)).sum()
