"""Torch shims for the external packages the reference models import.

The reference model files (reference src/models/tfgridnet_realtime/*,
src/models/tfgridnet_orig/*) depend on espnet2, asteroid_filterbanks,
torch_complex and librosa, none of which are installed here.  This
module registers minimal, re-derived implementations in `sys.modules`
so the ACTUAL reference model code can be imported and run (random
init, CPU) for full-model checkpoint-conversion parity tests
(tests/test_reference_parity.py, VERDICT.md Missing #2).

Everything here is re-derived from the published espnet2 / asteroid
semantics — the same spec `ops/stft.py`, `ops/norms.py` and
`models/offline_tfgridnet.py` were built from — not copied from
either project.  The asteroid filterbank shim intentionally shares
`_stft_filterbank_np` with `ops/stft.py` so the torch and JAX encode/
decode paths use bit-identical filters.

Only what the two models under test exercise is implemented:
  * `asteroid_filterbanks.make_enc_dec('stft', ...)` (streaming net
    enc/dec, reference tfgridnet_causal.py:131-135)
  * `espnet2...stft_encoder.STFTEncoder` (embed trunk input,
    torch.stft center=True/hann/reflect — reference
    tfgridnet_orig/stft.py:108-120 semantics)
  * `espnet2...tfgridnet_separator.TFGridNet` — the offline espnet
    separator the embedding net subclasses (module names match what
    `convert.convert_embed_state_dict` reads from real checkpoints)
  * small import-level stubs (AbsSeparator, complex_utils, get_layer,
    torch_complex, librosa, make_pad_mask).
"""

from __future__ import annotations

import math
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE = "/root/reference"


def _get_layer(l_name, library=nn):
    """espnet get_layer_from_string: case-insensitive torch.nn lookup."""
    match = [x for x in dir(library) if l_name.lower() == x.lower()]
    if len(match) != 1:
        raise NotImplementedError(f"ambiguous/unknown layer {l_name!r}")
    return getattr(library, match[0])


class _STFTEncoder(nn.Module):
    """espnet2 STFTEncoder: centered torch.stft, [B, N(, M)] ->
    complex [B, T(, M), F]."""

    def __init__(self, n_fft=512, win_length=None, hop_length=128,
                 window="hann", center=True, normalized=False,
                 onesided=True, use_builtin_complex=True):
        super().__init__()
        assert window == "hann" and center and onesided and not normalized
        self.n_fft = n_fft
        self.win_length = win_length or n_fft
        self.hop_length = hop_length

    def forward(self, input, ilens=None):
        multi = input.dim() == 3
        if multi:
            b, n, m = input.shape
            x = input.permute(0, 2, 1).reshape(b * m, n)
        else:
            x = input
        w = torch.hann_window(self.win_length, dtype=x.dtype,
                              device=x.device)
        s = torch.stft(x, self.n_fft, self.hop_length, self.win_length,
                       window=w, center=True, onesided=True,
                       return_complex=True)  # [BM, F, T]
        s = s.transpose(1, 2)  # [BM, T, F]
        if multi:
            s = s.reshape(b, m, s.shape[1], s.shape[2]).transpose(1, 2)
        flens = None if ilens is None else ilens // self.hop_length + 1
        return s, flens


class _STFTDecoderStub(nn.Module):
    """Import-level stub; the models under test never call espnet's
    decoder (the streaming net uses asteroid dec; the embed net's
    replacement local STFTDecoder is unused in its forward)."""

    def __init__(self, *args, **kwargs):
        super().__init__()

    def forward(self, *args, **kwargs):  # pragma: no cover
        raise NotImplementedError("espnet STFTDecoder stub")


class _LayerNormalization4D(nn.Module):
    """Per-channel norm over dim 1 of [B, C, T, F] (espnet)."""

    def __init__(self, input_dimension, eps=1e-5):
        super().__init__()
        self.gamma = nn.Parameter(torch.ones(1, input_dimension, 1, 1))
        self.beta = nn.Parameter(torch.zeros(1, input_dimension, 1, 1))
        self.eps = eps

    def forward(self, x):
        mu = x.mean(dim=1, keepdim=True)
        std = torch.sqrt(x.var(dim=1, unbiased=False, keepdim=True)
                         + self.eps)
        return (x - mu) / std * self.gamma + self.beta


class _LayerNormalization4DCF(nn.Module):
    """Joint (C, F) norm of [B, C, T, F] with [1,C,1,F] affine."""

    def __init__(self, input_dimension, eps=1e-5):
        super().__init__()
        assert len(input_dimension) == 2
        c, f = input_dimension
        self.gamma = nn.Parameter(torch.ones(1, c, 1, f))
        self.beta = nn.Parameter(torch.zeros(1, c, 1, f))
        self.eps = eps

    def forward(self, x):
        mu = x.mean(dim=(1, 3), keepdim=True)
        std = torch.sqrt(x.var(dim=(1, 3), unbiased=False, keepdim=True)
                         + self.eps)
        return (x - mu) / std * self.gamma + self.beta


class _GridNetBlock(nn.Module):
    """espnet2 offline GridNetBlock: unfold-k BiLSTMs over freq and
    time + full per-head time attention (the spec
    models/offline_tfgridnet.py re-implements in Flax)."""

    def __getitem__(self, key):
        return getattr(self, key)

    def __init__(self, emb_dim, emb_ks, emb_hs, n_freqs, hidden_channels,
                 n_head=4, approx_qk_dim=512, activation="prelu",
                 eps=1e-5):
        super().__init__()
        in_channels = emb_dim * emb_ks
        self.intra_norm = _LayerNormalization4D(emb_dim, eps=eps)
        self.intra_rnn = nn.LSTM(in_channels, hidden_channels, 1,
                                 batch_first=True, bidirectional=True)
        self.intra_linear = nn.ConvTranspose1d(
            hidden_channels * 2, emb_dim, emb_ks, stride=emb_hs)
        self.inter_norm = _LayerNormalization4D(emb_dim, eps=eps)
        self.inter_rnn = nn.LSTM(in_channels, hidden_channels, 1,
                                 batch_first=True, bidirectional=True)
        self.inter_linear = nn.ConvTranspose1d(
            hidden_channels * 2, emb_dim, emb_ks, stride=emb_hs)
        e = math.ceil(approx_qk_dim * 1.0 / n_freqs)
        assert emb_dim % n_head == 0
        for ii in range(n_head):
            self.add_module(f"attn_conv_Q_{ii}", nn.Sequential(
                nn.Conv2d(emb_dim, e, 1), _get_layer(activation)(),
                _LayerNormalization4DCF((e, n_freqs), eps=eps)))
            self.add_module(f"attn_conv_K_{ii}", nn.Sequential(
                nn.Conv2d(emb_dim, e, 1), _get_layer(activation)(),
                _LayerNormalization4DCF((e, n_freqs), eps=eps)))
            self.add_module(f"attn_conv_V_{ii}", nn.Sequential(
                nn.Conv2d(emb_dim, emb_dim // n_head, 1),
                _get_layer(activation)(),
                _LayerNormalization4DCF((emb_dim // n_head, n_freqs),
                                        eps=eps)))
        self.add_module("attn_concat_proj", nn.Sequential(
            nn.Conv2d(emb_dim, emb_dim, 1), _get_layer(activation)(),
            _LayerNormalization4DCF((emb_dim, n_freqs), eps=eps)))
        self.emb_dim = emb_dim
        self.emb_ks = emb_ks
        self.emb_hs = emb_hs
        self.n_head = n_head

    def forward(self, x):
        b, c, old_t, old_q = x.shape
        t = (math.ceil((old_t - self.emb_ks) / self.emb_hs) * self.emb_hs
             + self.emb_ks)
        q = (math.ceil((old_q - self.emb_ks) / self.emb_hs) * self.emb_hs
             + self.emb_ks)
        inp = F.pad(x, (0, q - old_q, 0, t - old_t))

        intra = self.intra_norm(inp)
        intra = intra.transpose(1, 2).contiguous().view(b * t, c, q)
        intra = F.unfold(intra[..., None], (self.emb_ks, 1),
                         stride=(self.emb_hs, 1))  # [BT, C*ks, -1]
        intra = intra.transpose(1, 2)
        intra, _ = self.intra_rnn(intra)
        intra = intra.transpose(1, 2)
        intra = self.intra_linear(intra)  # [BT, C, Q]
        intra = intra.view(b, t, c, q).transpose(1, 2).contiguous()
        intra = intra + inp

        inter = self.inter_norm(intra)
        inter = inter.permute(0, 3, 1, 2).contiguous().view(b * q, c, t)
        inter = F.unfold(inter[..., None], (self.emb_ks, 1),
                         stride=(self.emb_hs, 1))
        inter = inter.transpose(1, 2)
        inter, _ = self.inter_rnn(inter)
        inter = inter.transpose(1, 2)
        inter = self.inter_linear(inter)  # [BQ, C, T]
        inter = inter.view(b, q, c, t).permute(0, 2, 3, 1).contiguous()
        inter = inter + intra
        inter = inter[..., :old_t, :old_q]

        batch = inter
        all_q = [self[f"attn_conv_Q_{ii}"](batch)
                 for ii in range(self.n_head)]
        all_k = [self[f"attn_conv_K_{ii}"](batch)
                 for ii in range(self.n_head)]
        all_v = [self[f"attn_conv_V_{ii}"](batch)
                 for ii in range(self.n_head)]
        qh = torch.cat(all_q, dim=0)  # [B*nh, E, T, F] (head-major)
        kh = torch.cat(all_k, dim=0)
        vh = torch.cat(all_v, dim=0)

        qh = qh.transpose(1, 2).flatten(start_dim=2)  # [B', T, E*F]
        kh = kh.transpose(1, 2).flatten(start_dim=2)
        vh = vh.transpose(1, 2)  # [B', T, Cv, F]
        old_shape = vh.shape
        vh = vh.flatten(start_dim=2)  # [B', T, Cv*F]
        d = qh.shape[-1]
        attn = torch.matmul(qh, kh.transpose(1, 2)) / d ** 0.5
        attn = F.softmax(attn, dim=2)
        out = torch.matmul(attn, vh)  # [B', T, Cv*F]
        out = out.reshape(old_shape).transpose(1, 2)  # [B', Cv, T, F]
        cv = out.shape[1]
        out = out.view(self.n_head, b, cv, old_t, old_q)
        out = out.transpose(0, 1).contiguous().view(
            b, self.n_head * cv, old_t, old_q)
        out = self["attn_concat_proj"](out)
        return out + inter


class _EspnetTFGridNet(nn.Module):
    """espnet2.enh.separator.tfgridnet_separator.TFGridNet — module
    tree only; the reference subclasses override forward."""

    def __init__(self, input_dim, n_srcs=2, n_fft=128, stride=64,
                 window="hann", n_imics=1, n_layers=6,
                 lstm_hidden_units=192, attn_n_head=4,
                 attn_approx_qk_dim=512, emb_dim=48, emb_ks=4, emb_hs=1,
                 activation="prelu", eps=1.0e-5,
                 use_builtin_complex=False, ref_channel=-1):
        super().__init__()
        self.n_srcs = n_srcs
        self.n_layers = n_layers
        self.n_imics = n_imics
        assert n_fft % 2 == 0
        n_freqs = n_fft // 2 + 1
        self.n_freqs = n_freqs
        self.ref_channel = ref_channel
        self.emb_dim = emb_dim
        self.eps = eps
        self.enc = _STFTEncoder(n_fft, n_fft, stride, window=window,
                                use_builtin_complex=use_builtin_complex)
        self.dec = _STFTDecoderStub(n_fft, n_fft, stride, window=window)
        t_ksize = 3
        ks, padding = (t_ksize, 3), (t_ksize // 2, 1)
        self.conv = nn.Sequential(
            nn.Conv2d(2 * n_imics, emb_dim, ks, padding=padding),
            nn.GroupNorm(1, emb_dim, eps=eps))
        self.blocks = nn.ModuleList([
            _GridNetBlock(emb_dim, emb_ks, emb_hs, n_freqs,
                          lstm_hidden_units, n_head=attn_n_head,
                          approx_qk_dim=attn_approx_qk_dim,
                          activation=activation, eps=eps)
            for _ in range(n_layers)])
        self.deconv = nn.ConvTranspose2d(emb_dim, n_srcs * 2, ks,
                                         padding=padding)

    @property
    def num_spk(self):
        return self.n_srcs

    @staticmethod
    def pad2(input_tensor, target_len):
        return F.pad(input_tensor,
                     (0, target_len - input_tensor.shape[-1]))

    def forward(self, *args, **kwargs):  # pragma: no cover
        raise NotImplementedError(
            "shim provides the module tree; subclasses override forward")


def _make_enc_dec(fb_name, n_filters, kernel_size, stride,
                  window_type=None, **kwargs):
    """asteroid_filterbanks.make_enc_dec('stft', ...) — conv1d
    analysis / conv_transpose1d synthesis with the STFTFB filters.
    Shares the filter construction with ops/stft.py so torch and JAX
    paths are bit-identical."""
    assert fb_name == "stft"
    from lookoncetohear_tpu.ops.stft import _stft_filterbank_np
    filt = torch.from_numpy(
        _stft_filterbank_np(n_filters, kernel_size, stride).copy())

    class _Enc(nn.Module):
        def forward(self, x):
            shape = x.shape  # [..., N]
            y = F.conv1d(x.reshape(-1, 1, shape[-1]), filt[:, None, :],
                         stride=stride)
            return y.view(*shape[:-1], filt.shape[0], y.shape[-1])

    class _Dec(nn.Module):
        def forward(self, spec):
            shape = spec.shape  # [..., 2F, T]
            y = F.conv_transpose1d(
                spec.reshape(-1, filt.shape[0], shape[-1]),
                filt[:, None, :], stride=stride)
            return y.view(*shape[:-2], y.shape[-1])

    return _Enc(), _Dec()


def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install():
    """Register the shims in sys.modules and put /root/reference on
    sys.path (idempotent)."""
    if "espnet2" in sys.modules:
        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        return

    def new_complex_like(ref, real_imag):
        return torch.complex(real_imag[0], real_imag[1])

    def is_torch_complex_tensor(c):
        return isinstance(c, torch.Tensor) and torch.is_complex(c)

    def make_pad_mask(lengths, xs=None, length_dim=-1):
        lengths = torch.as_tensor(lengths)
        maxlen = int(lengths.max())
        return (torch.arange(maxlen)[None, :]
                >= lengths[:, None])

    class AbsSeparator(nn.Module):
        @property
        def num_spk(self):  # pragma: no cover
            raise NotImplementedError

    class AbsDecoder(nn.Module):
        pass

    class InversibleInterface:
        pass

    class ComplexTensor:  # torch_complex stub (import-level only)
        pass

    esp2 = _mod("espnet2")
    esp2.enh = _mod("espnet2.enh")
    _mod("espnet2.enh.decoder")
    _mod("espnet2.enh.decoder.stft_decoder", STFTDecoder=_STFTDecoderStub)
    _mod("espnet2.enh.decoder.abs_decoder", AbsDecoder=AbsDecoder)
    _mod("espnet2.enh.encoder")
    _mod("espnet2.enh.encoder.stft_encoder", STFTEncoder=_STFTEncoder)
    _mod("espnet2.enh.layers")
    _mod("espnet2.enh.layers.complex_utils",
         new_complex_like=new_complex_like,
         is_torch_complex_tensor=is_torch_complex_tensor,
         is_complex=is_torch_complex_tensor)
    _mod("espnet2.enh.separator")
    _mod("espnet2.enh.separator.abs_separator", AbsSeparator=AbsSeparator)
    _mod("espnet2.enh.separator.tfgridnet_separator",
         TFGridNet=_EspnetTFGridNet)
    _mod("espnet2.torch_utils")
    _mod("espnet2.torch_utils.get_layer_from_string", get_layer=_get_layer)
    _mod("espnet2.layers")
    _mod("espnet2.layers.inversible_interface",
         InversibleInterface=InversibleInterface)

    _mod("espnet")
    _mod("espnet.nets")
    _mod("espnet.nets.pytorch_backend")
    _mod("espnet.nets.pytorch_backend.nets_utils",
         make_pad_mask=make_pad_mask)

    _mod("asteroid_filterbanks", make_enc_dec=_make_enc_dec)

    tc = _mod("torch_complex", functional=None)
    tc.tensor = _mod("torch_complex.tensor", ComplexTensor=ComplexTensor)

    if "librosa" not in sys.modules:
        _mod("librosa")

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
