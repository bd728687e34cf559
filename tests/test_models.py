"""Model-level tests.

The crown jewel is streaming-vs-full equivalence: scanning the
separator one 8 ms frame at a time (carrying the state pytree) must
produce bit-near-identical audio to the single full-utterance call.
The reference never wrote this test (SURVEY.md §4) although its whole
design depends on the property.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lookoncetohear_tpu.models.net import EmbedNet, Net
from lookoncetohear_tpu.models.offline_tfgridnet import EmbedTFGridNet

# Small configs for fast CPU tests; same structure as configs/tsh.json.
TSH_KW = dict(stft_chunk_size=32, stft_pad_size=16, embed_dim=32,
              num_ch=2, D=16, L=2, I=1, J=1, B=2, H=8,
              local_atten_len=10, use_attn=True, lookahead=True,
              chunk_causal=True)


@pytest.fixture(scope="module")
def tse_net():
    net = Net(**TSH_KW)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 2, 8 * 32)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((2, 1, 32)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x, emb)
    return net, params


def test_forward_shape(tse_net):
    net, params = tse_net
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 2, 500)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((2, 1, 32)).astype(np.float32))
    y = net.apply(params, x, emb)
    assert y.shape == (2, 2, 500)
    assert np.isfinite(np.asarray(y)).all()


def test_streaming_equals_full(tse_net):
    """Scan per-frame streaming == one full-utterance call."""
    net, params = tse_net
    rng = np.random.default_rng(2)
    b, m = 2, 2
    chunk, pad = TSH_KW["stft_chunk_size"], TSH_KW["stft_pad_size"]
    nfft = chunk + pad
    n_chunks = 12
    n = n_chunks * chunk
    x = rng.standard_normal((b, m, n)).astype(np.float32)
    emb = rng.standard_normal((b, 1, 32)).astype(np.float32)

    full = np.asarray(net.apply(params, jnp.asarray(x), jnp.asarray(emb)))

    # Streaming: the model consumes nfft-sample windows hopping by
    # `chunk` (the last window needs `pad` lookahead samples, zero
    # padded at the stream end like mod_pad does).
    xp = np.concatenate([x, np.zeros((b, m, pad), np.float32)], axis=-1)
    state = net.init_state(b)
    emb_j = jnp.asarray(emb[:, 0])
    step = jax.jit(lambda p, xc, e, s: net.apply(
        p, xc, e, s, method=Net.step))
    outs = []
    for c in range(n_chunks):
        window = jnp.asarray(xp[:, :, c * chunk:c * chunk + nfft])
        y, state = step(params, window, emb_j, state)
        outs.append(np.asarray(y))
    streamed = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(streamed, full, rtol=2e-4, atol=2e-5)


def test_streaming_scan_jit(tse_net):
    """Same equivalence but with lax.scan — the serving path compiles
    to ONE XLA program."""
    net, params = tse_net
    rng = np.random.default_rng(3)
    b, m = 2, 2
    chunk, pad = TSH_KW["stft_chunk_size"], TSH_KW["stft_pad_size"]
    nfft = chunk + pad
    n_chunks = 10
    n = n_chunks * chunk
    x = rng.standard_normal((b, m, n)).astype(np.float32)
    emb = rng.standard_normal((b, 32)).astype(np.float32)

    full = np.asarray(net.apply(
        params, jnp.asarray(x), jnp.asarray(emb[:, None])))

    xp = np.concatenate([x, np.zeros((b, m, pad), np.float32)], axis=-1)
    idx = np.arange(n_chunks)[:, None] * chunk + np.arange(nfft)[None, :]
    windows = jnp.asarray(xp[:, :, idx].transpose(2, 0, 1, 3))  # [T,B,M,nfft]

    def scan_fn(state, window):
        y, state = net.apply(params, window, jnp.asarray(emb), state,
                             method=Net.step)
        return state, y

    state = net.init_state(b)
    _, ys = jax.jit(lambda s, w: jax.lax.scan(scan_fn, s, w))(state, windows)
    streamed = np.asarray(ys).transpose(1, 2, 0, 3).reshape(b, 2, n)
    np.testing.assert_allclose(streamed, full, rtol=2e-4, atol=2e-5)


def test_embed_net_shapes():
    net = EmbedNet(embed_dim=32, num_ch=2, n_fft=32, stride=16,
                   num_blocks=2)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((3, 2, 400)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)
    emb = net.apply(params, x)
    assert emb.shape == (3, 32)
    assert np.isfinite(np.asarray(emb)).all()


def test_embed_net_scale_invariance_of_std_norm():
    """Input std-normalization makes the embedding scale-invariant."""
    net = EmbedNet(embed_dim=16, num_ch=2, n_fft=32, stride=16,
                   num_blocks=1)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 2, 300)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(1), x)
    e1 = np.asarray(net.apply(params, x))
    e2 = np.asarray(net.apply(params, x * 7.3))
    np.testing.assert_allclose(e1, e2, rtol=1e-4, atol=1e-5)
