"""SNR / SI-SDR family.

Two numeric conventions coexist in the reference and both are kept:

* torchmetrics convention (used by the training tasks for the loss and
  the SNRi/SI-SNRi metrics, reference src/ts_hear_embed_pl_module.py:
  8-10,49-56): `snr` does NOT zero-mean; `si_snr` zero-means.
* asteroid `SingleSrcNegSDR` convention (used by the pluggable loss
  zoo, reference src/losses/LossFn.py:15-22): zero-means both signals
  for every sdr_type, eps=1e-8 inside the ratio and the log.

All functions reduce over the last axis (time); leading axes are batch.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def snr(pred: jnp.ndarray, target: jnp.ndarray,
        zero_mean: bool = False) -> jnp.ndarray:
    """Signal-to-noise ratio in dB (torchmetrics signal_noise_ratio).

    snr = 10 log10( ||t||^2 / ||t - p||^2 ). Shapes [..., T] -> [...].
    """
    if zero_mean:
        pred = pred - jnp.mean(pred, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)
    num = jnp.sum(target ** 2, axis=-1)
    den = jnp.sum((target - pred) ** 2, axis=-1)
    return 10.0 * jnp.log10(num / (den + _EPS) + _EPS)


def si_sdr(pred: jnp.ndarray, target: jnp.ndarray,
           zero_mean: bool = True) -> jnp.ndarray:
    """Scale-invariant SDR in dB (torchmetrics SI-SDR/SI-SNR; the two
    are identical functions there). Shapes [..., T] -> [...]."""
    if zero_mean:
        pred = pred - jnp.mean(pred, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)
    alpha = (jnp.sum(pred * target, axis=-1, keepdims=True) + _EPS) / (
        jnp.sum(target ** 2, axis=-1, keepdims=True) + _EPS)
    s_target = alpha * target
    noise = pred - s_target
    return 10.0 * jnp.log10(
        (jnp.sum(s_target ** 2, axis=-1) + _EPS)
        / (jnp.sum(noise ** 2, axis=-1) + _EPS))


# torchmetrics' scale_invariant_signal_noise_ratio == SI-SDR(zero_mean).
si_snr = si_sdr


def snr_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """The TSE training loss: mean negative (non-scale-invariant) SNR
    (reference src/ts_hear_embed_pl_module.py:49-50,70)."""
    return -jnp.mean(snr(pred, target))


def neg_sdr(est: jnp.ndarray, target: jnp.ndarray,
            sdr_type: str = "snr", zero_mean: bool = True) -> jnp.ndarray:
    """asteroid SingleSrcNegSDR: negative SDR per row, [..., T] -> [...].

    sdr_type: 'snr' | 'sisdr' | 'sdsdr'.
    """
    if zero_mean:
        est = est - jnp.mean(est, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)
    if sdr_type in ("sisdr", "sdsdr"):
        dot = jnp.sum(est * target, axis=-1, keepdims=True)
        s_energy = jnp.sum(target ** 2, axis=-1, keepdims=True) + _EPS
        scaled_target = dot * target / s_energy
    else:
        scaled_target = target
    if sdr_type in ("sdsdr", "snr"):
        e_noise = est - target
    else:
        e_noise = est - scaled_target
    ratio = jnp.sum(scaled_target ** 2, axis=-1) / (
        jnp.sum(e_noise ** 2, axis=-1) + _EPS)
    return -10.0 * jnp.log10(ratio + _EPS)


def pairwise_neg_sisdr(est: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """asteroid PairwiseNegSDR('sisdr'): est/target [B, S, T] ->
    pairwise loss matrix [B, S_est, S_tgt]."""
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    target = target - jnp.mean(target, axis=-1, keepdims=True)
    # [B, S_est, 1, T] x [B, 1, S_tgt, T]
    e = est[:, :, None, :]
    t = target[:, None, :, :]
    dot = jnp.sum(e * t, axis=-1, keepdims=True)
    s_energy = jnp.sum(t ** 2, axis=-1, keepdims=True) + _EPS
    s_target = dot * t / s_energy
    e_noise = e - s_target
    ratio = jnp.sum(s_target ** 2, axis=-1) / (
        jnp.sum(e_noise ** 2, axis=-1) + _EPS)
    return -10.0 * jnp.log10(ratio + _EPS)
