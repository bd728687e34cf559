"""torch->JAX weight conversion: op-level numerical equivalence against
torch primitives, and full-tree conversion into both models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from lookoncetohear_tpu.convert import (_conv2d, _deconv2d, _t,
                                        convert_embed_state_dict,
                                        convert_tse_state_dict)
from lookoncetohear_tpu.ops.lstm import LSTMParams, lstm_apply


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


class TestOpEquivalence:
    def test_lstm_unidirectional(self):
        torch.manual_seed(0)
        m = torch.nn.LSTM(12, 16, 1, batch_first=True)
        x = torch.randn(3, 20, 12)
        with torch.no_grad():
            y_t, (h_t, c_t) = m(x)
        params = LSTMParams(
            w_ih=jnp.asarray(m.weight_ih_l0.detach().numpy()),
            w_hh=jnp.asarray(m.weight_hh_l0.detach().numpy()),
            b_ih=jnp.asarray(m.bias_ih_l0.detach().numpy()),
            b_hh=jnp.asarray(m.bias_hh_l0.detach().numpy()))
        y_j, (h_j, c_j) = lstm_apply(params, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_j), h_t[0].numpy(),
                                   atol=1e-5)

    def test_lstm_bidirectional(self):
        torch.manual_seed(1)
        m = torch.nn.LSTM(8, 10, 1, batch_first=True, bidirectional=True)
        x = torch.randn(2, 15, 8)
        with torch.no_grad():
            y_t, _ = m(x)
        fwd = LSTMParams(
            jnp.asarray(m.weight_ih_l0.detach().numpy()),
            jnp.asarray(m.weight_hh_l0.detach().numpy()),
            jnp.asarray(m.bias_ih_l0.detach().numpy()),
            jnp.asarray(m.bias_hh_l0.detach().numpy()))
        bwd = LSTMParams(
            jnp.asarray(m.weight_ih_l0_reverse.detach().numpy()),
            jnp.asarray(m.weight_hh_l0_reverse.detach().numpy()),
            jnp.asarray(m.bias_ih_l0_reverse.detach().numpy()),
            jnp.asarray(m.bias_hh_l0_reverse.detach().numpy()))
        y_f, _ = lstm_apply(fwd, jnp.asarray(x.numpy()))
        y_b, _ = lstm_apply(bwd, jnp.asarray(x.numpy()), reverse=True)
        y_j = jnp.concatenate([y_f, y_b], axis=-1)
        np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(),
                                   atol=1e-5)

    def test_conv2d_mapping(self):
        torch.manual_seed(2)
        m = torch.nn.Conv2d(4, 8, (3, 3), padding=(0, 1))
        x = torch.randn(2, 4, 12, 9)
        with torch.no_grad():
            y_t = m(x)
        from flax import linen as nn
        conv = nn.Conv(features=8, kernel_size=(3, 3),
                       padding=((0, 0), (1, 1)))
        params = {"kernel": jnp.asarray(_conv2d(m.weight.detach().numpy())),
                  "bias": jnp.asarray(m.bias.detach().numpy())}
        y_j = conv.apply({"params": params},
                         jnp.asarray(x.numpy()).transpose(0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(y_j.transpose(0, 3, 1, 2)), y_t.numpy(), atol=1e-4)

    def test_conv_transpose2d_mapping(self):
        """ConvTranspose2d(k=3, s=1, padding=(2,1)) == flax Conv with
        flipped/swapped kernel and padding ((0,0),(1,1)) — the deconv
        path of the streaming model."""
        torch.manual_seed(3)
        m = torch.nn.ConvTranspose2d(6, 4, (3, 3), padding=(2, 1))
        x = torch.randn(2, 6, 12, 9)  # [B, C, T+2, F]
        with torch.no_grad():
            y_t = m(x)  # [B, 4, 10, 9]
        from flax import linen as nn
        conv = nn.Conv(features=4, kernel_size=(3, 3),
                       padding=((0, 0), (1, 1)))
        params = {
            "kernel": jnp.asarray(_deconv2d(m.weight.detach().numpy())),
            "bias": jnp.asarray(m.bias.detach().numpy())}
        y_j = conv.apply({"params": params},
                         jnp.asarray(x.numpy()).transpose(0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(y_j.transpose(0, 3, 1, 2)), y_t.numpy(), atol=1e-4)

    def test_conv_transpose1d_mapping(self):
        torch.manual_seed(4)
        m = torch.nn.ConvTranspose1d(10, 6, 4, stride=1)
        x = torch.randn(3, 10, 20)
        with torch.no_grad():
            y_t = m(x)  # [3, 6, 23]
        from lookoncetohear_tpu.models.offline_tfgridnet import \
            ConvTranspose1dK
        mod = ConvTranspose1dK(out_features=6, k=4)
        params = {"weight": jnp.asarray(m.weight.detach().numpy()),
                  "bias": jnp.asarray(m.bias.detach().numpy())}
        y_j = mod.apply({"params": params},
                        jnp.asarray(x.numpy()).transpose(0, 2, 1))
        np.testing.assert_allclose(
            np.asarray(y_j.transpose(0, 2, 1)), y_t.numpy(), atol=1e-4)

    def test_linear_mapping(self):
        torch.manual_seed(5)
        m = torch.nn.Linear(7, 5)
        x = torch.randn(4, 7)
        want = m(x).detach().numpy()
        got = x.numpy() @ _t(m.weight.detach().numpy()) \
            + m.bias.detach().numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


def _fake_tse_state_dict(D=16, M=2, H=16, F=97, nh=2, S=2, E=64,
                         n_layers=2):
    """Random tensors with the reference streaming model's exact key
    names/shapes (tfgridnet_causal.py constructor)."""
    e_dim = int(np.ceil(512 / F))
    vd = D // nh
    rng = np.random.default_rng(0)

    def r(*s):
        return torch.tensor(rng.standard_normal(s).astype(np.float32))
    sd = {
        "model.tfgridnet.conv.0.weight": r(D, 2 * M, 3, 3),
        "model.tfgridnet.conv.0.bias": r(D),
        "model.tfgridnet.deconv.weight": r(D, S * 2, 3, 3),
        "model.tfgridnet.deconv.bias": r(S * 2),
        "model.tfgridnet.embed_to_feats_proj.0.weight": r(D * F, E),
        "model.tfgridnet.embed_to_feats_proj.0.bias": r(D * F),
        "model.tfgridnet.embed_to_feats_proj.1.weight": r(D * F),
        "model.tfgridnet.embed_to_feats_proj.1.bias": r(D * F),
    }
    for i in range(n_layers):
        b = f"model.tfgridnet.blocks.{i}"
        sd.update({
            f"{b}.intra_norm.norm.weight": r(D),
            f"{b}.intra_norm.norm.bias": r(D),
            f"{b}.inter_norm.norm.weight": r(D),
            f"{b}.inter_norm.norm.bias": r(D),
            f"{b}.intra_linear.weight": r(D, 2 * H),
            f"{b}.intra_linear.bias": r(D),
            f"{b}.inter_linear.weight": r(D, H),
            f"{b}.inter_linear.bias": r(D),
        })
        for rnn, bi in (("intra_rnn", True), ("inter_rnn", False)):
            sd.update({
                f"{b}.{rnn}.weight_ih_l0": r(4 * H, D),
                f"{b}.{rnn}.weight_hh_l0": r(4 * H, H),
                f"{b}.{rnn}.bias_ih_l0": r(4 * H),
                f"{b}.{rnn}.bias_hh_l0": r(4 * H),
            })
            if bi:
                sd.update({
                    f"{b}.{rnn}.weight_ih_l0_reverse": r(4 * H, D),
                    f"{b}.{rnn}.weight_hh_l0_reverse": r(4 * H, H),
                    f"{b}.{rnn}.bias_ih_l0_reverse": r(4 * H),
                    f"{b}.{rnn}.bias_hh_l0_reverse": r(4 * H),
                })
        for name, width in (("attn_conv_Q", e_dim), ("attn_conv_K", e_dim),
                            ("attn_conv_V", vd)):
            sd.update({
                f"{b}.{name}.0.weight": r(width * nh, D),
                f"{b}.{name}.0.bias": r(width * nh),
                f"{b}.{name}.1.weight": r(1),
                f"{b}.{name}.3.norm.weight": r(F * width),
                f"{b}.{name}.3.norm.bias": r(F * width),
            })
        sd.update({
            f"{b}.attn_concat_proj.0.weight": r(D, D),
            f"{b}.attn_concat_proj.0.bias": r(D),
            f"{b}.attn_concat_proj.1.weight": r(1),
            f"{b}.attn_concat_proj.3.norm.weight": r(F * D),
            f"{b}.attn_concat_proj.3.norm.bias": r(F * D),
        })
    return {k: v.numpy() for k, v in sd.items()}


class TestFullConversion:
    def test_tse_tree_loads_and_runs(self):
        from lookoncetohear_tpu.models.net import Net
        sd = _fake_tse_state_dict()
        params = convert_tse_state_dict(sd, n_layers=2)
        net = Net(embed_dim=64, stft_chunk_size=128, stft_pad_size=64,
                  num_ch=2, D=16, L=2, B=2, H=16, local_atten_len=10,
                  use_attn=True)
        ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 1600)),
                       jnp.zeros((1, 1, 64)))["params"]
        # structural identity with the randomly-initialized tree
        ref_flat = jax.tree_util.tree_map(lambda x: x.shape, ref)
        got_flat = jax.tree_util.tree_map(lambda x: x.shape, params)
        assert jax.tree_util.tree_structure(ref_flat) == \
            jax.tree_util.tree_structure(got_flat)
        assert ref_flat == got_flat
        out = net.apply({"params": params},
                        jnp.asarray(_rand(2, 2, 1600, seed=1)),
                        jnp.asarray(_rand(2, 1, 64, seed=2)))
        assert out.shape == (2, 2, 1600)
        assert np.isfinite(np.asarray(out)).all()

    def test_embed_tree_loads_and_runs(self):
        from lookoncetohear_tpu.models.net import EmbedNet
        D, M, H, E = 64, 2, 64, 64
        n_fft, F, nh = 64, 33, 4
        rng = np.random.default_rng(3)

        def r(*s):
            return rng.standard_normal(s).astype(np.float32)
        e_dim = int(np.ceil(512 / F))
        vd = D // nh
        sd = {
            "model.conv.0.weight": r(D, 2 * M, 3, 3),
            "model.conv.0.bias": r(D),
            "model.conv.1.weight": r(D),
            "model.conv.1.bias": r(D),
            "model.embed_proj.0.weight": r(E, F * D),
            "model.embed_proj.0.bias": r(E),
            "model.embed_proj.1.weight": r(E),
            "model.embed_proj.1.bias": r(E),
        }
        b = "model.blocks.0"
        in_ch = D * 4
        for rnn in ("intra_rnn", "inter_rnn"):
            for sfx in ("", "_reverse"):
                sd.update({
                    f"{b}.{rnn}.weight_ih_l0{sfx}": r(4 * H, in_ch),
                    f"{b}.{rnn}.weight_hh_l0{sfx}": r(4 * H, H),
                    f"{b}.{rnn}.bias_ih_l0{sfx}": r(4 * H),
                    f"{b}.{rnn}.bias_hh_l0{sfx}": r(4 * H),
                })
        for lin in ("intra_linear", "inter_linear"):
            sd[f"{b}.{lin}.weight"] = r(2 * H, D, 4)
            sd[f"{b}.{lin}.bias"] = r(D)
        for norm in ("intra_norm", "inter_norm"):
            sd[f"{b}.{norm}.gamma"] = r(1, D, 1, 1)
            sd[f"{b}.{norm}.beta"] = r(1, D, 1, 1)
        for h in range(nh):
            for name, w in ((f"attn_conv_Q_{h}", e_dim),
                            (f"attn_conv_K_{h}", e_dim),
                            (f"attn_conv_V_{h}", vd)):
                sd.update({
                    f"{b}.{name}.0.weight": r(w, D, 1, 1),
                    f"{b}.{name}.0.bias": r(w),
                    f"{b}.{name}.1.weight": r(1),
                    f"{b}.{name}.2.gamma": r(1, w, 1, F),
                    f"{b}.{name}.2.beta": r(1, w, 1, F),
                })
        sd.update({
            f"{b}.attn_concat_proj.0.weight": r(D, D, 1, 1),
            f"{b}.attn_concat_proj.0.bias": r(D),
            f"{b}.attn_concat_proj.1.weight": r(1),
            f"{b}.attn_concat_proj.2.gamma": r(1, D, 1, F),
            f"{b}.attn_concat_proj.2.beta": r(1, D, 1, F),
        })

        params = convert_embed_state_dict(sd, n_layers=1, n_head=nh)
        net = EmbedNet(embed_dim=E, num_ch=M, n_fft=n_fft, stride=32,
                       num_blocks=1)
        ref = net.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 2, 1600)))["params"]
        ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref)
        got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
        assert ref_shapes == got_shapes
        out = net.apply({"params": params},
                        jnp.asarray(_rand(2, 2, 1600, seed=5)))
        assert out.shape == (2, E)
        assert np.isfinite(np.asarray(out)).all()
