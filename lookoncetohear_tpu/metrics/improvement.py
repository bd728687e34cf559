"""Improvement metrics (SNRi / SI-SNRi).

Reference semantics (src/ts_hear_embed_pl_module.py:52-56): per sample,
mean over channels of metric(pred, target) − metric(mixture, target),
where mixture uses only the first and last input channels.
"""

from __future__ import annotations

import jax.numpy as jnp


def metric_improvement(metric, mixture: jnp.ndarray, pred: jnp.ndarray,
                       target: jnp.ndarray) -> jnp.ndarray:
    """mixture/pred/target: [B, C, T] -> per-sample improvement [B]."""
    gain = metric(pred, target) - metric(mixture, target)  # [B, C]
    return jnp.mean(gain, axis=-1)
