"""Name-dispatched loss registry (reference src/losses/LossFn.py).

Same names, same reshape semantics: (B, C, T) inputs are flattened to
(B*C, T) rows before the row-wise loss, then mean-reduced.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from lookoncetohear_tpu.losses.sdr import neg_sdr, pairwise_neg_sisdr
from lookoncetohear_tpu.losses.spectral import (L1_Mel,
                                                MultiResolutionMelSpecLoss)


def _rows(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(-1, x.shape[-1])


def _snr_sdsdr(est, gt):
    """elementwise max(SD-SDR, SNR) loss (reference
    scale_dependent_snr_loss.py:6-16)."""
    return jnp.mean(jnp.maximum(neg_sdr(est, gt, "sdsdr"),
                                neg_sdr(est, gt, "snr")))


def _fused(est, gt):
    """SI-SDR + SNR (reference fused_loss.py:6-16)."""
    return jnp.mean(neg_sdr(est, gt, "sisdr") + neg_sdr(est, gt, "snr"))


def _sisdr_with_sum(est, gt, noise_estimate, mixture):
    """SI-SDR + L1 mixture-consistency (reference
    sisdr_with_sum_loss.py:6-22). est/gt already row-flattened;
    noise_estimate/mixture arrive as (B, C, T)."""
    noise = _rows(noise_estimate)
    mix = _rows(mixture)
    return (jnp.mean(neg_sdr(est, gt, "sisdr"))
            + jnp.mean(jnp.abs(noise + est - mix)))


def _pit_sisdr(est, gt, est1, est2, gt1, gt2, reduce=True):
    """2-source PIT SI-SDR returning reordered estimates (reference
    sisdr_with_pit.py:7-30). est1/est2/gt1/gt2: (B, C, T).

    reduce=False returns the loss per sample [B] (mean over channels)
    instead of the scalar mean, for weighted/masked evaluation."""
    b, c, t = est1.shape
    e = jnp.stack([est1, est2], axis=2).reshape(b * c, 2, t)
    g = jnp.stack([gt1, gt2], axis=2).reshape(b * c, 2, t)
    pw = pairwise_neg_sisdr(e, g)  # [B*C, 2est, 2tgt]
    # Two permutations: identity (0->0,1->1) and swap.
    loss_id = pw[:, 0, 0] + pw[:, 1, 1]
    loss_sw = pw[:, 1, 0] + pw[:, 0, 1]
    swap = (loss_sw < loss_id)[:, None, None]
    reordered = jnp.where(swap, e[:, ::-1], e)
    per_sample = jnp.mean(
        jnp.minimum(loss_id, loss_sw).reshape(b, c), axis=1) / 2.0
    loss = jnp.mean(per_sample) if reduce else per_sample
    reordered = reordered.reshape(b, c, 2, t)
    return loss, reordered[:, :, 0], reordered[:, :, 1]


class LossFn:
    """Callable loss with the reference's (est, gt, **kwargs) contract
    (reference LossFn.py:12-56). est/gt: (B, C, T)."""

    def __init__(self, name: str = "snr", **kwargs: Any) -> None:
        self.name = name
        if name == "sisdr":
            self._fn = lambda e, g: jnp.mean(neg_sdr(e, g, "sisdr"))
        elif name == "snr":
            self._fn = lambda e, g: jnp.mean(neg_sdr(e, g, "snr"))
        elif name == "sdsdr":
            self._fn = lambda e, g: jnp.mean(neg_sdr(e, g, "sdsdr"))
        elif name == "snr_sdsdr":
            self._fn = _snr_sdsdr
        elif name == "sisdr_with_sum":
            self._fn = _sisdr_with_sum
        elif name == "fused":
            self._fn = _fused
        elif name == "pit_sisdr":
            self._fn = _pit_sisdr
        elif name == "mel":
            self._fn = MultiResolutionMelSpecLoss()
        elif name == "l1_mel":
            self._fn = L1_Mel()
        elif name == "cdpam":
            # Pretrained weights load iff $LOOKONCE_CDPAM_WEIGHTS (or
            # weights=...) points at a file (losses/cdpam.py —
            # reference perceptual_losses.py:7-17). As a TRAINING loss
            # an untrained random-net distance is perceptually
            # meaningless, so constructing without weights requires an
            # explicit allow_random=True opt-in here (metric/offline
            # use can instantiate CDPAM directly).
            from lookoncetohear_tpu.losses.cdpam import CDPAM
            allow_random = bool(kwargs.pop("allow_random", False))
            fn = CDPAM(**kwargs)
            if not fn.pretrained and not allow_random:
                raise ValueError(
                    "LossFn('cdpam') without pretrained weights: set "
                    "$LOOKONCE_CDPAM_WEIGHTS (or pass weights=...), or "
                    "opt in explicitly with allow_random=True to "
                    "optimize a random-net distance")
            self._fn = fn
        else:
            raise AssertionError(
                f"Invalid loss function used: Loss {name} not found")

    def __call__(self, est, gt, **kwargs):
        if est is not None:
            est = _rows(est)
        if gt is not None:
            gt = _rows(gt)
        if kwargs:
            out = self._fn(est, gt, **kwargs)
            if "gt1" in kwargs:
                return out  # (mean_loss, out1, out2)
            return out
        return self._fn(est, gt)
