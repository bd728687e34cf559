"""DSP core tests: filterbank STFT semantics, overlap-add, centered
STFT parity with torch.stft (the two conventions the models rely on).

This is the test pyramid base the reference lacked (SURVEY.md §4): the
reference's only numerical check was the espnet stft_decoder __main__
self-test; here the same invariants run under pytest.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lookoncetohear_tpu.ops import stft as stft_ops


def test_frame_overlap_add_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 1000)).astype(np.float32)
    frames = stft_ops.frame_signal(jnp.asarray(x), 64, 64)
    back = stft_ops.overlap_add(frames, 64)
    np.testing.assert_allclose(np.asarray(back), x[..., :back.shape[-1]],
                               rtol=1e-6, atol=1e-6)


def test_overlap_add_matches_naive():
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((5, 7, 192)).astype(np.float32)
    hop = 128
    out = np.asarray(stft_ops.overlap_add(jnp.asarray(frames), hop))
    t, l = 7, 192
    ref = np.zeros((5, (t - 1) * hop + l), np.float32)
    for i in range(t):
        ref[:, i * hop:i * hop + l] += frames[:, i]
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_filterbank_matches_asteroid_construction():
    """Independently verify the filterbank against a literal numpy
    transcription of the asteroid STFTFB recipe."""
    n_fft, stride = 192, 128
    fb = np.asarray(stft_ops.stft_filterbank(n_fft, n_fft, stride))
    assert fb.shape == (2 * (n_fft // 2 + 1), n_fft)
    window = np.hanning(n_fft + 1)[:-1] ** 0.5
    k = np.arange(n_fft // 2 + 1)[:, None]
    t = np.arange(n_fft)[None, :]
    scale = 0.5 * np.sqrt(n_fft * n_fft / stride)
    cos_rows = np.cos(2 * np.pi * k * t / n_fft) / scale
    sin_rows = -np.sin(2 * np.pi * k * t / n_fft) / scale
    cos_rows[0] /= np.sqrt(2)
    cos_rows[n_fft // 2] /= np.sqrt(2)
    expected = np.vstack([cos_rows, sin_rows]) * window
    np.testing.assert_allclose(fb, expected, rtol=1e-4, atol=1e-6)


def test_fb_encode_decode_shapes_and_streaming_consistency():
    """Decoding frame-by-frame with 1-frame lookback == decoding all
    frames at once (the streaming iSTFT recipe of the separator)."""
    n_fft, stride = 192, 128
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 2, n_fft + 9 * stride)).astype(np.float32)
    spec = stft_ops.fb_encode(jnp.asarray(x), n_fft, stride)
    assert spec.shape == (1, 2, n_fft + 2, 10)

    full = np.asarray(stft_ops.fb_decode(spec, n_fft, stride))
    # Streaming: prepend zero lookback frame, decode 2 frames per step,
    # keep [stride:2*stride) of each decode.
    lookback = jnp.zeros_like(spec[..., :1])
    buf = lookback
    outs = []
    for t in range(10):
        two = jnp.concatenate([buf, spec[..., t:t + 1]], axis=-1)
        dec = stft_ops.fb_decode(two, n_fft, stride)
        outs.append(np.asarray(dec[..., stride:2 * stride]))
        buf = spec[..., t:t + 1]
    streamed = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(streamed, full[..., :10 * stride],
                               rtol=1e-4, atol=1e-5)


def test_stft_center_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 800)).astype(np.float32)
    n_fft, hop = 128, 64
    ours = np.asarray(stft_ops.stft_center(jnp.asarray(x), n_fft, hop))
    ref = torch.stft(
        torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
        window=torch.hann_window(n_fft), center=True, return_complex=True,
    ).numpy()  # [B, F, T]
    ref = np.transpose(ref, (0, 2, 1))  # [B, T, F]
    np.testing.assert_allclose(ours.real, ref.real, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ours.imag, ref.imag, rtol=1e-4, atol=1e-4)


def test_istft_center_roundtrip():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    spec = stft_ops.stft_center(jnp.asarray(x), 128, 64)
    back = np.asarray(stft_ops.istft_center(spec, 128, 64, length=1024))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)
