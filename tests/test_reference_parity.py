"""FULL-MODEL checkpoint-conversion parity against the actual
reference networks (VERDICT.md Missing #2 / round-1 top gap).

The north-star requirement is that reference PyTorch checkpoints stay
loadable.  These tests import the reference's OWN model code from
/root/reference (tfgridnet_realtime/net.py + tfgridnet_causal.py and
tfgridnet_orig/tfgridnet.py, run via the shims in torch_shims.py),
randomly initialize it, export its state_dict through `convert.py`,
and assert the Flax models produce the same outputs — full utterance
AND a streamed pass with carried state.  Any key-naming, transpose,
gate-order or epsilon mistake anywhere in the converter or the Flax
forward shows up here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import torch_shims  # noqa: E402

from lookoncetohear_tpu.convert import (convert_embed_state_dict,  # noqa: E402
                                        convert_tse_state_dict)
from lookoncetohear_tpu.models.net import EmbedNet, Net  # noqa: E402

# Flagship geometry (configs/tsh.json model_params) — full size, so
# the test covers the exact shapes real checkpoints have.
TSH = dict(stft_chunk_size=128, stft_pad_size=64, embed_dim=256,
           num_ch=2, D=64, B=3, I=1, J=1, L=4, H=64,
           use_attn=True, lookahead=True, local_atten_len=50,
           chunk_causal=True)
EMBED = dict(embed_dim=256, num_ch=2, n_fft=128, stride=64, num_blocks=3)


def _tree_shapes(tree):
    return {jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


@pytest.fixture(scope="module")
def torch_tse():
    torch_shims.install()
    from src.models.tfgridnet_realtime.net import Net as TorchNet
    torch.manual_seed(0)
    net = TorchNet(**{k: v for k, v in TSH.items()}).eval()
    return net


@pytest.fixture(scope="module")
def torch_embed():
    torch_shims.install()
    from src.models.tfgridnet_orig.tfgridnet import \
        EmbedTFGridNet as TorchEmbed
    torch.manual_seed(1)
    return TorchEmbed(**EMBED).eval()


@pytest.mark.slow
def test_tse_parity_smoke(torch_tse):
    """SLOW-TIER parity smoke (ADVICE r3: the routine test budget must
    keep exercising the converter contract): converted reference
    state_dict == Flax output on a short 4-chunk utterance. The
    multi-minute full/streamed variants stay in the e2e tier."""
    rng = np.random.default_rng(7)
    n = 128 * 4
    x = rng.standard_normal((1, 2, n)).astype(np.float32)
    emb = rng.standard_normal((1, 1, 256)).astype(np.float32)
    with torch.no_grad():
        y_t = torch_tse(torch.from_numpy(x), torch.from_numpy(emb)).numpy()
    sd = {k: v.numpy() for k, v in torch_tse.state_dict().items()}
    params = convert_tse_state_dict(sd, n_layers=TSH["B"], use_attn=True)
    y_j = np.asarray(Net(**TSH).apply({"params": params}, jnp.asarray(x),
                                      jnp.asarray(emb)))
    np.testing.assert_allclose(y_j, y_t, rtol=1e-4, atol=1e-4)


@pytest.mark.e2e
def test_tse_full_model_parity(torch_tse):
    """Reference streaming separator state_dict -> convert.py -> Flax:
    identical full-utterance output."""
    rng = np.random.default_rng(0)
    n = 128 * 16  # 16 chunks
    x = rng.standard_normal((2, 2, n)).astype(np.float32)
    emb = rng.standard_normal((2, 1, 256)).astype(np.float32)

    with torch.no_grad():
        y_t = torch_tse(torch.from_numpy(x), torch.from_numpy(emb))
    y_t = y_t.numpy()

    sd = {k: v.numpy() for k, v in torch_tse.state_dict().items()}
    params = convert_tse_state_dict(sd, n_layers=TSH["B"], use_attn=True)

    jnet = Net(**TSH)
    ref_params = jnet.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]),
                           jnp.asarray(emb[:1]))["params"]
    assert _tree_shapes(params) == _tree_shapes(ref_params), \
        "converted param tree does not match the Flax model's"

    y_j = np.asarray(jnet.apply({"params": params}, jnp.asarray(x),
                                jnp.asarray(emb)))
    assert y_t.shape == y_j.shape == (2, 2, n)
    np.testing.assert_allclose(y_j, y_t, rtol=1e-4, atol=1e-4)


@pytest.mark.e2e
def test_tse_streamed_parity(torch_tse):
    """Converted params driven 8 ms at a time (carried state) still
    match the reference full-utterance output."""
    rng = np.random.default_rng(1)
    chunk, pad = TSH["stft_chunk_size"], TSH["stft_pad_size"]
    nfft = chunk + pad
    n_chunks = 12
    n = n_chunks * chunk
    x = rng.standard_normal((1, 2, n)).astype(np.float32)
    emb = rng.standard_normal((1, 1, 256)).astype(np.float32)

    with torch.no_grad():
        y_t = torch_tse(torch.from_numpy(x), torch.from_numpy(emb)).numpy()

    sd = {k: v.numpy() for k, v in torch_tse.state_dict().items()}
    params = {"params": convert_tse_state_dict(sd, n_layers=TSH["B"],
                                               use_attn=True)}
    jnet = Net(**TSH)
    xp = np.concatenate([x, np.zeros((1, 2, pad), np.float32)], axis=-1)
    state = jnet.init_state(1)
    emb_j = jnp.asarray(emb[:, 0])
    step = jax.jit(lambda p, xc, e, s: jnet.apply(
        p, xc, e, s, method=Net.step))
    outs = []
    for c in range(n_chunks):
        window = jnp.asarray(xp[:, :, c * chunk:c * chunk + nfft])
        y, state = step(params, window, emb_j, state)
        outs.append(np.asarray(y))
    streamed = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(streamed, y_t, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_embed_full_model_parity(torch_embed):
    """Reference EmbedTFGridNet (espnet trunk) state_dict ->
    convert.py -> Flax EmbedNet: identical d-vectors."""
    rng = np.random.default_rng(2)
    n = 4000  # 0.25 s -> T = 63 frames
    x = rng.standard_normal((2, 2, n)).astype(np.float32)

    with torch.no_grad():
        y_t = torch_embed(torch.from_numpy(x)).numpy()

    sd = {k: v.numpy() for k, v in torch_embed.state_dict().items()}
    params = convert_embed_state_dict(sd, n_layers=EMBED["num_blocks"])

    jnet = EmbedNet(**EMBED)
    ref_params = jnet.init(jax.random.PRNGKey(0),
                           jnp.asarray(x[:1]))["params"]
    assert _tree_shapes(params) == _tree_shapes(ref_params), \
        "converted param tree does not match the Flax model's"

    y_j = np.asarray(jnet.apply({"params": params}, jnp.asarray(x)))
    assert y_t.shape == y_j.shape == (2, 256)
    np.testing.assert_allclose(y_j, y_t, rtol=1e-4, atol=1e-4)
