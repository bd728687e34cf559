"""Multi-resolution spectral losses (the reference's auraloss-backed
perceptual losses, re-implemented in JAX).

Matches the structure of auraloss as configured at reference
src/losses/perceptual_losses.py:19-46:

* `MultiResolutionMelSpecLoss` — MultiResolutionSTFTLoss(fft 1024/2048/
  8192, hops 256/512/2048, mel scale with 128 bins @ 16 kHz,
  A-weighting perceptual prefilter): per resolution, spectral-
  convergence + log-magnitude L1 terms averaged.
* `L1_Mel` — SumAndDifferenceSTFTLoss(fft 64/128/256/1024, hops
  128/256/512/2048) on (L+R, L−R) of stereo pairs, plus waveform L1.

The CDPAM perceptual metric needs its pretrained network and therefore
lives behind an import gate in LossFn (not available offline).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from lookoncetohear_tpu.ops import stft as stft_ops

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Mel filterbank (librosa-compatible: slaney scale + slaney norm — the
# auraloss default)
# ---------------------------------------------------------------------------


def _hz_to_mel(f):
    f = np.asarray(f, dtype=np.float64)
    mel = f / (200.0 / 3.0)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3.0)
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz)
                    / logstep,
                    mel)


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f = m * (200.0 / 3.0)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3.0)
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    f)


@functools.lru_cache(maxsize=None)
def mel_filterbank(sr: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: float | None = None):
    """librosa.filters.mel equivalent (slaney, norm='slaney')."""
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax),
                                     n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2:n_mels + 2] - mel_pts[:n_mels])
    weights = weights * enorm[:, None]
    return jnp.asarray(weights.astype(np.float32))  # [n_mels, n_freqs]


# ---------------------------------------------------------------------------
# A-weighting prefilter (auraloss perceptual_weighting): applied as a
# frequency-domain magnitude weighting of the STFT.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def a_weighting(sr: int, n_fft: int):
    f = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    f = np.maximum(f, 1e-6)
    f2 = f ** 2
    ra = (12194.0 ** 2 * f2 ** 2) / (
        (f2 + 20.6 ** 2)
        * np.sqrt((f2 + 107.7 ** 2) * (f2 + 737.9 ** 2))
        * (f2 + 12194.0 ** 2))
    a_db = 20.0 * np.log10(ra) + 2.0
    w = 10.0 ** (a_db / 20.0)
    return jnp.asarray(w.astype(np.float32))  # [F]


def _stft_mag(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """|STFT| with centered framing: [..., T] -> [..., frames, F]."""
    spec = stft_ops.stft_center(x, n_fft, hop)
    return jnp.abs(spec)


def stft_loss(est: jnp.ndarray, gt: jnp.ndarray, n_fft: int, hop: int,
              mel_bins: int | None = None, sr: int = 16000,
              perceptual_weighting: bool = False) -> jnp.ndarray:
    """One resolution: spectral convergence + log-magnitude L1
    (auraloss STFTLoss default w_sc=1, w_log_mag=1)."""
    m_est = _stft_mag(est, n_fft, hop)
    m_gt = _stft_mag(gt, n_fft, hop)
    if perceptual_weighting:
        w = a_weighting(sr, n_fft)
        m_est = m_est * w
        m_gt = m_gt * w
    if mel_bins is not None:
        fb = mel_filterbank(sr, n_fft, mel_bins)
        m_est = jnp.einsum("...tf,mf->...tm", m_est, fb)
        m_gt = jnp.einsum("...tf,mf->...tm", m_gt, fb)
    sc = jnp.linalg.norm(m_gt - m_est) / (jnp.linalg.norm(m_gt) + _EPS)
    log_mag = jnp.mean(jnp.abs(jnp.log(m_gt + _EPS) - jnp.log(m_est + _EPS)))
    return sc + log_mag


def multi_resolution_stft_loss(
        est: jnp.ndarray, gt: jnp.ndarray,
        fft_sizes=(1024, 2048, 8192), hop_sizes=(256, 512, 2048),
        mel_bins: int | None = None, sr: int = 16000,
        perceptual_weighting: bool = False) -> jnp.ndarray:
    losses = [
        stft_loss(est, gt, n, h, mel_bins=mel_bins, sr=sr,
                  perceptual_weighting=perceptual_weighting)
        for n, h in zip(fft_sizes, hop_sizes)
    ]
    return jnp.mean(jnp.stack(losses))


class MultiResolutionMelSpecLoss:
    """auraloss MultiResolutionSTFTLoss(mel, 128 bins, A-weighted)
    as configured at reference perceptual_losses.py:19-29.
    est, gt: [B*C, T]."""

    def __call__(self, est, gt):
        return multi_resolution_stft_loss(
            est, gt, fft_sizes=(1024, 2048, 8192),
            hop_sizes=(256, 512, 2048), mel_bins=128, sr=16000,
            perceptual_weighting=True)


class L1_Mel:
    """auraloss SumAndDifferenceSTFTLoss + waveform L1 as configured at
    reference perceptual_losses.py:31-46. est, gt: [B*C, T] with C even
    (stereo pairs interleaved as in the reference's reshape)."""

    def __call__(self, est, gt):
        bc, t = est.shape
        e = est.reshape(-1, 2, t)
        g = gt.reshape(-1, 2, t)
        e_sum, e_dif = e[:, 0] + e[:, 1], e[:, 0] - e[:, 1]
        g_sum, g_dif = g[:, 0] + g[:, 1], g[:, 0] - g[:, 1]
        kw = dict(fft_sizes=(64, 128, 256, 1024),
                  hop_sizes=(128, 256, 512, 2048), sr=16000)
        l1 = 0.5 * (multi_resolution_stft_loss(e_sum, g_sum, **kw)
                    + multi_resolution_stft_loss(e_dif, g_dif, **kw))
        l2 = jnp.mean(jnp.abs(est - gt))
        return l1 + l2
