"""Contrastive embedding losses (enrollment-network training).

torch.nn.CosineEmbeddingLoss semantics, used with margin=0.5 by the
embedding task (reference src/binaural_embed_pl_module.py:21,45-51):
positive pairs vs the precomputed clean d-vector, negative pairs vs
the other speakers' d-vectors after `neg_loss_start_epoch`.
"""

from __future__ import annotations

import jax.numpy as jnp


def _cos(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, eps)


def cosine_embedding_loss(emb: jnp.ndarray, other: jnp.ndarray,
                          y: jnp.ndarray, margin: float = 0.0,
                          reduction: str = "mean") -> jnp.ndarray:
    """torch.nn.CosineEmbeddingLoss.

    emb, other: [B, E]; y: [B] of +1 / -1.
    loss_i = 1 - cos(e_i, o_i)              if y_i == 1
           = max(0, cos(e_i, o_i) - margin) if y_i == -1
    reduction: 'mean' -> scalar; 'none' -> per-sample [B] (lets callers
    apply sample weights, e.g. masked eval batches).
    """
    cos = _cos(emb, other)
    pos = 1.0 - cos
    neg = jnp.maximum(0.0, cos - margin)
    per_sample = jnp.where(y > 0, pos, neg)
    if reduction == "none":
        return per_sample
    return jnp.mean(per_sample)


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Plain cosine similarity over the last axis (eval metric,
    reference src/ts_hear_test.py:140-141)."""
    return _cos(a, b)
