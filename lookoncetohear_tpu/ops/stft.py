"""STFT / iSTFT primitives, TPU-first.

Two distinct STFT conventions coexist in the reference and both are
reproduced here exactly:

1. **Filterbank STFT** (streaming separator): a free-standing analysis/
   synthesis filterbank equivalent to
   `asteroid_filterbanks.make_enc_dec('stft', n_filters=n_fft,
   kernel_size=n_fft, stride=stride)` as used at reference
   src/models/tfgridnet_realtime/tfgridnet_causal.py:131-135.
   Analysis = frame (no centering) + windowed real-DFT matrix;
   synthesis = transposed filterbank + overlap-add. On TPU both are
   plain matmuls over frames (MXU) — no FFT needed at these sizes
   (n_fft=192), and matmul keeps everything fusible under XLA.

2. **Centered STFT** (embedding net): equivalent to `torch.stft` with
   center=True, reflect padding, periodic Hann — the espnet
   STFTEncoder convention (reference src/models/tfgridnet_orig/
   stft.py:108-120).

The streaming-synthesis math (single-frame iSTFT + overlap-add with a
1-frame lookback) mirrors reference src/models/tfgridnet_orig/
stft_decoder.py:93-153 and tfgridnet_causal.py:126-129,269-273.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Filterbank construction (asteroid STFTFB semantics)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _stft_filterbank_np(n_fft: int, kernel_size: int, stride: int):
    """Build the (2*(n_fft//2+1), kernel_size) analysis filterbank.

    Matches asteroid_filterbanks.STFTFB: DFT-of-identity rows scaled by
    1 / (0.5 * sqrt(kernel_size * n_fft / stride)), DC and Nyquist rows
    divided by sqrt(2), all rows multiplied by the default
    sqrt-Hann window `np.hanning(kernel_size + 1)[:-1] ** 0.5`.
    """
    cutoff = n_fft // 2 + 1
    window = np.hanning(kernel_size + 1)[:-1] ** 0.5
    dft = np.fft.fft(np.eye(n_fft))
    dft = dft / (0.5 * np.sqrt(kernel_size * n_fft / stride))
    lpad = (n_fft - kernel_size) // 2
    dft = dft[:, lpad:lpad + kernel_size]
    filters = np.vstack([np.real(dft[:cutoff]), np.imag(dft[:cutoff])])
    filters[0, :] /= np.sqrt(2)
    filters[n_fft // 2, :] /= np.sqrt(2)
    filters = filters * window
    return filters.astype(np.float32)


def stft_filterbank(n_fft: int, kernel_size: int, stride: int) -> jnp.ndarray:
    """Analysis/synthesis filterbank matrix [2*(n_fft//2+1), kernel]."""
    return jnp.asarray(_stft_filterbank_np(n_fft, kernel_size, stride))


# ---------------------------------------------------------------------------
# Framing
# ---------------------------------------------------------------------------


def frame_signal(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """Split the last axis into overlapping frames.

    x: [..., N] -> [..., T, frame_len] with T = (N - frame_len)//hop + 1.
    Implemented as a gather with a static index matrix — XLA lowers this
    to an efficient strided load; frames then feed matmuls on the MXU.
    """
    n = x.shape[-1]
    t = (n - frame_len) // hop + 1
    idx = np.arange(t)[:, None] * hop + np.arange(frame_len)[None, :]
    return x[..., idx]


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Inverse of framing: sum overlapping frames.

    frames: [..., T, L] -> [..., (T-1)*hop + L].

    Decomposed into L//hop (+1) interleaved non-overlapping streams so
    the whole op is reshapes + at most ceil(L/hop) shifted adds — no
    scatter, fully fusible.
    """
    *batch, t, frame_len = frames.shape
    out_len = (t - 1) * hop + frame_len
    n_chunks = -(-frame_len // hop)  # ceil
    pad_frame = n_chunks * hop - frame_len
    if pad_frame:
        frames = jnp.pad(
            frames, [(0, 0)] * len(batch) + [(0, 0), (0, pad_frame)])
    # [..., T, n_chunks, hop]
    frames = frames.reshape(*batch, t, n_chunks, hop)
    out = jnp.zeros((*batch, out_len + n_chunks * hop), frames.dtype)
    for c in range(n_chunks):
        # stream c holds samples [t*hop + c*hop, t*hop + (c+1)*hop)
        stream = frames[..., :, c, :].reshape(*batch, t * hop)
        out = out.at[..., c * hop:c * hop + t * hop].add(stream)
    return out[..., :out_len]


# ---------------------------------------------------------------------------
# Filterbank encode / decode (streaming separator path)
# ---------------------------------------------------------------------------


def fb_encode(x: jnp.ndarray, n_fft: int, stride: int) -> jnp.ndarray:
    """Filterbank analysis.

    x: [..., N] audio -> [..., 2*(n_fft//2+1), T] stacked (real, imag)
    channels, matching the asteroid Encoder output layout consumed at
    reference tfgridnet_causal.py:229-233.
    """
    fb = stft_filterbank(n_fft, n_fft, stride).astype(x.dtype)  # [2F, K]
    frames = frame_signal(x, n_fft, stride)  # [..., T, K]
    spec = jnp.einsum("...tk,fk->...ft", frames, fb)
    return spec


def fb_encode_frames(frames: jnp.ndarray, n_fft: int, stride: int) -> jnp.ndarray:
    """Analysis on pre-framed audio: [..., T, K] -> [..., 2F, T]."""
    fb = stft_filterbank(n_fft, n_fft, stride).astype(frames.dtype)
    return jnp.einsum("...tk,fk->...ft", frames, fb)


def fb_decode(spec: jnp.ndarray, n_fft: int, stride: int) -> jnp.ndarray:
    """Filterbank synthesis (transposed conv == matmul + overlap-add).

    spec: [..., 2F, T] -> [..., (T-1)*stride + n_fft] audio.
    """
    fb = stft_filterbank(n_fft, n_fft, stride).astype(spec.dtype)  # [2F, K]
    frames = jnp.einsum("...ft,fk->...tk", spec, fb)
    return overlap_add(frames, stride)


def fb_decode_frame(spec_frame: jnp.ndarray, n_fft: int, stride: int) -> jnp.ndarray:
    """Single-frame synthesis: [..., 2F] -> [..., n_fft] (no OLA)."""
    fb = stft_filterbank(n_fft, n_fft, stride).astype(spec_frame.dtype)
    return jnp.einsum("...f,fk->...k", spec_frame, fb)


# ---------------------------------------------------------------------------
# Centered STFT (torch.stft / espnet STFTEncoder semantics)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _hann_periodic_np(win_length: int):
    n = np.arange(win_length)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(
        np.float32)


def hann_window(win_length: int) -> jnp.ndarray:
    """Periodic Hann — identical to torch.hann_window(win_length)."""
    return jnp.asarray(_hann_periodic_np(win_length))


def stft_center(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Centered STFT equivalent to torch.stft(center=True, hann,
    pad_mode='reflect', onesided=True).

    x: [..., N] -> complex [..., T, F] with T = N//hop + 1,
    F = n_fft//2 + 1. (Layout is frames-major like espnet's encoder
    output, reference src/models/tfgridnet_orig/stft.py:167-169.)
    """
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(x, n_fft, hop)  # [..., T, n_fft]
    frames = frames * hann_window(n_fft)
    return jnp.fft.rfft(frames, axis=-1)


def istft_center(spec: jnp.ndarray, n_fft: int, hop: int,
                 length: int | None = None) -> jnp.ndarray:
    """Inverse of `stft_center` (torch.istft equivalent): windowed
    irfft + overlap-add + window-envelope normalization + center trim."""
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)
    w = hann_window(n_fft)
    frames = frames * w
    out = overlap_add(frames, hop)
    t = spec.shape[-2]
    env_frames = jnp.broadcast_to(w * w, (t, n_fft))
    env = overlap_add(env_frames, hop)
    out = out / jnp.maximum(env, 1e-11)
    pad = n_fft // 2
    out = out[..., pad:]
    if length is not None:
        out = out[..., :length]
    return out
