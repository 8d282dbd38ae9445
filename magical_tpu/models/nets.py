"""Policy / discriminator networks for the IL baselines.

The reference repo ships no networks (training lived outside it; the
paper's BC/GAIL baselines used a small CNN on the 96x96 stacked
observations).  These flax modules are the TPU-native equivalents,
designed for the MXU: channel counts in multiples of 64, bfloat16
activations, fused GroupNorm+ReLU, global-average-pool head.  The final
dense layers carry optional ``model``-axis sharding annotations so the
policy can be tensor-parallel under pjit when desired.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class MagicalCNN(nn.Module):
    """Policy trunk + action logits (and optional value head)."""
    num_actions: int = 18
    widths: Sequence[int] = (64, 128, 128, 256)
    dtype: jnp.dtype = jnp.bfloat16
    with_value_head: bool = False

    @nn.compact
    def __call__(self, obs):
        # obs: uint8 (B, H, W, C) channels-last (or CHW -> transpose)
        if obs.shape[1] <= 16 and obs.shape[-1] > 16:
            obs = jnp.moveaxis(obs, 1, -1)
        x = obs.astype(self.dtype) / 255.0
        for i, w in enumerate(self.widths):
            x = nn.Conv(w, (5, 5) if i == 0 else (3, 3), strides=(2, 2),
                        dtype=self.dtype, name=f'conv{i}')(x)
            x = nn.GroupNorm(num_groups=8, dtype=self.dtype,
                             name=f'gn{i}')(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))                     # global avg pool
        x = nn.Dense(256, dtype=self.dtype, name='fc',
                     kernel_init=nn.with_partitioning(
                         nn.initializers.lecun_normal(), (None, 'model')))(x)
        x = nn.relu(x)
        logits = nn.Dense(self.num_actions, dtype=jnp.float32,
                          name='pi')(x)
        if self.with_value_head:
            value = nn.Dense(1, dtype=jnp.float32, name='v')(x)[..., 0]
            return logits, value
        return logits


class Discriminator(nn.Module):
    """GAIL discriminator: D(obs, act) -> logit of 'expert'."""
    num_actions: int = 18
    widths: Sequence[int] = (64, 128, 128)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs, act):
        if obs.shape[1] <= 16 and obs.shape[-1] > 16:
            obs = jnp.moveaxis(obs, 1, -1)
        x = obs.astype(self.dtype) / 255.0
        for i, w in enumerate(self.widths):
            x = nn.Conv(w, (3, 3), strides=(2, 2), dtype=self.dtype,
                        name=f'conv{i}')(x)
            x = nn.GroupNorm(num_groups=8, dtype=self.dtype,
                             name=f'gn{i}')(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        a = jax.nn.one_hot(act, self.num_actions, dtype=self.dtype)
        x = jnp.concatenate([x, a], axis=-1)
        x = nn.relu(nn.Dense(256, dtype=self.dtype, name='fc')(x))
        return nn.Dense(1, dtype=jnp.float32, name='out')(x)[..., 0]
