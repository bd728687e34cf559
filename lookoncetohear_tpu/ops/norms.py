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

import jax
import jax.numpy as jnp
import numpy as np
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


# --- MXU-dot ("flat") norm forms for the streaming serving path --------
#
# On this chip, VPU lane reductions run at ~16 GB/s and any tensor
# whose minor axis is tiny (the per-head [B, T, F, nh, 6] views of the
# Q/K projections) is lane-padded to 128, so every elementwise pass
# touches ~21x the real elements (PERF.md round-2 layout probes). These
# helpers keep the serving step's LayerNorms entirely in the flat
# [B, D] projection-native layout and compute the statistics as dots
# against constant 0/1 segment matrices — reductions ride the MXU and
# no small-minor-axis tensor is ever materialized. Numerics: one-pass
# E[x^2] - mu^2 in f32 (vs the two-pass jnp.var form) — equal to the
# reference LayerNorm (tfgridnet_causal.py:594-620) up to f32
# reassociation noise, covered by tests/test_serve.py::TestMXUNorms.


def head_segment_matrix(d_flat: int, n_head: int, dim: int) -> np.ndarray:
    """[D, nh] 0/1 f32 constant: flat (f, head, dim) column d belongs
    to head (d % (n_head*dim)) // dim."""
    col = np.arange(d_flat)
    head = (col % (n_head * dim)) // dim
    return (head[:, None] == np.arange(n_head)[None, :]).astype(
        np.float32)


def flat_head_layer_norm(y_flat, seg, n_per_head: float, scale_flat,
                         bias_flat, eps: float):
    """Per-(row, head) LayerNorm on flat (f, head, dim) columns.

    y_flat: [B, D]; seg: [D, nh] 0/1; scale/bias_flat: [D] (the
    LayerNorm's [F*dim] affine tiled per head). Returns y_flat's dtype.
    """
    x = y_flat.astype(jnp.float32)
    mu = (x @ seg) / n_per_head                       # [B, nh]
    m2 = ((x * x) @ seg) / n_per_head
    inv = jax.lax.rsqrt(jnp.maximum(m2 - mu * mu, 0.0) + eps)
    xn = (x - mu @ seg.T) * (inv @ seg.T)
    return (xn * scale_flat + bias_flat).astype(y_flat.dtype)


def flat_layer_norm(x_flat, scale_flat, bias_flat, eps: float):
    """Whole-row LayerNorm on [B, D] via a ones-column MXU dot."""
    d = x_flat.shape[-1]
    ones = np.ones((d, 1), np.float32)
    x = x_flat.astype(jnp.float32)
    mu = (x @ ones) / d                               # [B, 1]
    m2 = ((x * x) @ ones) / d
    inv = jax.lax.rsqrt(jnp.maximum(m2 - mu * mu, 0.0) + eps)
    xn = (x - mu) * inv
    return (xn * scale_flat + bias_flat).astype(x_flat.dtype)


class PReLU(nn.Module):
    """torch.nn.PReLU with a single shared slope (init 0.25)."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda key, shape: jnp.full(shape, self.init), (1,))
        return jnp.where(x >= 0, x, alpha * x)
