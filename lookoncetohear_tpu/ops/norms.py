"""Normalization layers with the exact semantics used by both
TF-GridNet variants in the reference.

- `layer_norm`: standard last-dims LayerNorm (torch.nn.LayerNorm).
  Used everywhere in the streaming separator (reference
  tfgridnet_causal.py:594-620 wraps nn.LayerNorm).
- `espnet_layer_norm_4d`: normalize over the channel axis (dim 1) of a
  [B, C, T, F] tensor with per-channel affine — espnet's
  LayerNormalization4D, used by the offline/embedding TF-GridNet.
- `espnet_layer_norm_4dcf`: normalize jointly over (C, F) of
  [B, C, T, F] with [C, F]-shaped affine — espnet's
  LayerNormalization4DCF.
- `group_norm1`: GroupNorm(num_groups=1) == LayerNorm over (C, T, F)
  with per-channel affine; follows the offline model's input conv.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def normalize(x, axes, eps):
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps)


class LayerNorm(nn.Module):
    """torch.nn.LayerNorm over the last dimension(s).

    `features` may be an int (last dim) or tuple (trailing dims)."""

    features: int | tuple
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        feats = self.features if isinstance(self.features, tuple) \
            else (self.features,)
        scale = self.param("scale", nn.initializers.ones, feats)
        bias = self.param("bias", nn.initializers.zeros, feats)
        axes = tuple(range(x.ndim - len(feats), x.ndim))
        return normalize(x, axes, self.eps) * scale + bias


class EspnetLayerNorm4D(nn.Module):
    """Normalize [B, C, T, F] over C with (C,)-affine (espnet
    LayerNormalization4D; biased variance)."""

    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones,
                           (1, self.channels, 1, 1))
        beta = self.param("beta", nn.initializers.zeros,
                          (1, self.channels, 1, 1))
        return normalize(x, (1,), self.eps) * gamma + beta


class EspnetLayerNorm4DCF(nn.Module):
    """Normalize [B, C, T, F] over (C, F) with (C, F)-affine (espnet
    LayerNormalization4DCF)."""

    channels: int
    freqs: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones,
                           (1, self.channels, 1, self.freqs))
        beta = self.param("beta", nn.initializers.zeros,
                          (1, self.channels, 1, self.freqs))
        return normalize(x, (1, 3), self.eps) * gamma + beta


class GroupNorm1(nn.Module):
    """torch GroupNorm(1, C): normalize over (C, *spatial), per-channel
    affine. x layout: [B, C, T, F]."""

    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones,
                           (1, self.channels, 1, 1))
        beta = self.param("bias", nn.initializers.zeros,
                          (1, self.channels, 1, 1))
        return normalize(x, (1, 2, 3), self.eps) * gamma + beta


class PReLU(nn.Module):
    """torch.nn.PReLU with a single shared slope (init 0.25)."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda key, shape: jnp.full(shape, self.init), (1,))
        return jnp.where(x >= 0, x, alpha * x)
