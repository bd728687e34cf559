"""Offline TF-GridNet (espnet semantics) and the binaural enrollment
("look once") embedding network.

The reference's embedding net subclasses espnet2's offline TFGridNet
separator (reference src/models/tfgridnet_orig/tfgridnet.py:88-127):
centered STFT -> Conv2d+GroupNorm -> N offline GridNet blocks
(unfold-k=4 BiLSTMs over freq and time, full multi-head time
attention) -> Linear(F*C -> 256) + LayerNorm -> mean over time.

This file re-implements that architecture TPU-first in Flax: the
k=4/stride-1 unfold becomes a stack of 4 shifted views feeding one
large LSTM matmul; ConvTranspose1d(k=4, s=1) becomes 4 shifted adds of
Dense projections; attention is one batched [B*heads, T, T] matmul
chain on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lookoncetohear_tpu.ops import stft as stft_ops
from lookoncetohear_tpu.ops.lstm import LSTM
from lookoncetohear_tpu.ops.norms import (EspnetLayerNorm4D,
                                          EspnetLayerNorm4DCF, GroupNorm1,
                                          LayerNorm, PReLU)
from lookoncetohear_tpu.models.streaming_tfgridnet import (TorchDense,
                                                           _torch_linear_init)


def _unfold_k(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """torch F.unfold with kernel (k,1), stride 1 on [B, C, L].

    Returns [B, L-k+1, C*k] with the (C, k) pair flattened
    channel-major (torch unfold layout)."""
    views = [x[:, :, i:x.shape[2] - k + 1 + i] for i in range(k)]
    stacked = jnp.stack(views, axis=2)  # [B, C, k, L-k+1]
    b, c, _, l = stacked.shape
    return stacked.reshape(b, c * k, l).transpose(0, 2, 1)


class ConvTranspose1dK(nn.Module):
    """torch ConvTranspose1d(in, out, kernel_size=k, stride=1) applied
    to [B, L, in] -> [B, L+k-1, out], as shifted adds of k Dense maps."""

    out_features: int
    k: int

    @nn.compact
    def __call__(self, x):
        b, l, in_f = x.shape
        init = _torch_linear_init(self.out_features * self.k)
        # torch weight: [in, out, k]
        weight = self.param("weight", init, (in_f, self.out_features, self.k))
        bias = self.param("bias", init, (self.out_features,))
        out_len = l + self.k - 1
        out = jnp.zeros((b, out_len, self.out_features), x.dtype)
        for i in range(self.k):
            out = out.at[:, i:i + l].add(x @ weight[:, :, i])
        return out + bias


class HeadConv1x1(nn.Module):
    """Conv2d(C_in, C_out, 1) + PReLU + espnet LN4DCF((C_out, F)) on
    [B, C, T, F] (espnet per-head attention projection)."""

    out_channels: int
    n_freqs: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        b, c, t, f = x.shape
        init = _torch_linear_init(c)
        kernel = self.param("kernel", init, (c, self.out_channels))
        bias = self.param("bias", init, (self.out_channels,))
        y = jnp.einsum("bctf,co->botf", x, kernel) + bias[None, :, None, None]
        y = PReLU(name="act")(y)
        y = EspnetLayerNorm4DCF(self.out_channels, f, eps=self.eps,
                                name="norm")(y)
        return y


class GridNetBlockOffline(nn.Module):
    """espnet2 GridNetBlock (offline, bidirectional, full attention).

    `remat_stages` checkpoints the three stages (intra-freq BiLSTM,
    inter-time BiLSTM, TxT attention) SEPARATELY, so during the block's
    backward only one stage's activations are live at a time. This is
    what lets the enrollment net train at the reference geometry
    (batch 8 x 5 s, configs/embed.json:94-97) inside 16 GB HBM — the
    unfold outputs alone are ~0.6 GB per stage at that shape. Stage
    remats use method-level nn.remat so parameter paths (and therefore
    reference-checkpoint conversion, convert.py) are unchanged."""

    emb_dim: int
    emb_ks: int
    emb_hs: int
    n_freqs: int
    hidden: int
    n_head: int = 4
    approx_qk_dim: int = 512
    eps: float = 1e-5
    remat_stages: bool = True

    @property
    def e_dim(self) -> int:
        return int(np.ceil(self.approx_qk_dim / self.n_freqs))

    def setup(self):
        c, k, h = self.emb_dim, self.emb_ks, self.hidden
        assert self.emb_hs == 1, "only stride-1 unfold supported"
        # the two unfold-BiLSTMs hold the block's largest activations
        # (xp/ys of every scan step, ~C*k widths over B*T rows); remat
        # them individually so the block backward recomputes each scan
        # instead of keeping both alive
        lstm_cls = nn.remat(LSTM)
        self.intra_norm = EspnetLayerNorm4D(c, eps=self.eps)
        self.intra_rnn = lstm_cls(c * k, h, bidirectional=True)
        self.intra_linear = ConvTranspose1dK(c, k)
        self.inter_norm = EspnetLayerNorm4D(c, eps=self.eps)
        self.inter_rnn = lstm_cls(c * k, h, bidirectional=True)
        self.inter_linear = ConvTranspose1dK(c, k)
        e, vd = self.e_dim, c // self.n_head
        self.attn_q = [HeadConv1x1(e, self.n_freqs, eps=self.eps)
                       for _ in range(self.n_head)]
        self.attn_k = [HeadConv1x1(e, self.n_freqs, eps=self.eps)
                       for _ in range(self.n_head)]
        self.attn_v = [HeadConv1x1(vd, self.n_freqs, eps=self.eps)
                       for _ in range(self.n_head)]
        self.attn_concat_proj = HeadConv1x1(c, self.n_freqs, eps=self.eps)

    def _intra(self, inp):
        """intra (frequency) BiLSTM stage: [B, C, T, F] -> same."""
        b, c, t, f = inp.shape
        k = self.emb_ks
        y = self.intra_norm(inp)  # [B, C, T, F]
        y = y.transpose(0, 2, 1, 3).reshape(b * t, c, f)  # [BT, C, F]
        y = _unfold_k(y, k)  # [BT, F-k+1, C*k]
        y, _ = self.intra_rnn(y)  # [BT, F-k+1, 2H]
        y = self.intra_linear(y)  # [BT, F, C]
        y = y.reshape(b, t, f, c).transpose(0, 3, 1, 2)  # [B, C, T, F]
        return y + inp

    def _inter(self, inp2):
        """inter (time) BiLSTM stage: [B, C, T, F] -> same."""
        b, c, t, f = inp2.shape
        k = self.emb_ks
        z = self.inter_norm(inp2)
        z = z.transpose(0, 3, 1, 2).reshape(b * f, c, t)  # [BF, C, T]
        z = _unfold_k(z, k)  # [BF, T-k+1, C*k]
        z, _ = self.inter_rnn(z)
        z = self.inter_linear(z)  # [BF, T, C]
        z = z.reshape(b, f, t, c).transpose(0, 3, 2, 1)  # [B, C, T, F]
        return z + inp2

    def _attn(self, z):
        """full multi-head time attention stage: [B, C, T, F] -> same."""
        b, c, t, f = z.shape
        e, nh = self.e_dim, self.n_head
        vd = c // nh
        qs = jnp.stack([m(z) for m in self.attn_q], axis=1)  # [B,nh,E,T,F]
        ks = jnp.stack([m(z) for m in self.attn_k], axis=1)
        vs = jnp.stack([m(z) for m in self.attn_v], axis=1)  # [B,nh,V,T,F]

        # espnet flattens [B', T, E, F] -> [B', T, E*F] (E-major)
        q = qs.transpose(0, 1, 3, 2, 4).reshape(b, nh, t, e * f)
        kk = ks.transpose(0, 1, 3, 2, 4).reshape(b, nh, t, e * f)
        v = vs.transpose(0, 1, 3, 2, 4).reshape(b, nh, t, vd * f)

        scores = jnp.einsum("bhtd,bhsd->bhts", q, kk) * float(1.0 / np.sqrt(e * f))
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v)  # [B,nh,T,V*F]
        out = out.reshape(b, nh, t, vd, f)
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, nh * vd, t, f)
        out = self.attn_concat_proj(out)  # [B, C, T, F]
        return out + z

    def __call__(self, x):
        """x: [B, C, T, F] -> [B, C, T, F]."""
        if self.remat_stages:
            intra = nn.remat(GridNetBlockOffline._intra)
            inter = nn.remat(GridNetBlockOffline._inter)
            attn = nn.remat(GridNetBlockOffline._attn)
            return attn(self, inter(self, intra(self, x)))
        return self._attn(self._inter(self._intra(x)))


class OfflineTFGridNetTrunk(nn.Module):
    """Shared trunk: centered STFT -> conv -> N offline blocks.

    Produces [B, C, T, F] features (std-normalization of the input is
    the caller's job, matching reference tfgridnet.py:109-110)."""

    n_fft: int = 128
    stride: int = 64
    n_imics: int = 2
    n_layers: int = 3
    lstm_hidden_units: int = 64
    attn_n_head: int = 4
    attn_approx_qk_dim: int = 512
    emb_dim: int = 64
    emb_ks: int = 4
    emb_hs: int = 1
    eps: float = 1e-5
    remat: bool = True  # see StreamingTFGridNet.remat

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    def setup(self):
        d = self.emb_dim
        self.conv = nn.Conv(
            features=d, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform"),
            bias_init=_torch_linear_init(2 * self.n_imics * 9))
        self.conv_norm = GroupNorm1(d, eps=self.eps)
        # remat at STAGE granularity inside each block (see
        # GridNetBlockOffline.remat_stages) rather than wrapping whole
        # blocks: stage boundaries [B, C, T, F] are cheap to store and
        # the backward never recomputes a stage twice.
        self.blocks = [
            GridNetBlockOffline(
                emb_dim=d, emb_ks=self.emb_ks, emb_hs=self.emb_hs,
                n_freqs=self.n_freqs, hidden=self.lstm_hidden_units,
                n_head=self.attn_n_head,
                approx_qk_dim=self.attn_approx_qk_dim, eps=self.eps,
                remat_stages=self.remat)
            for _ in range(self.n_layers)
        ]

    def __call__(self, x):
        """x: [B, M, N] audio (already std-normalized) -> [B,C,T,F]."""
        spec = stft_ops.stft_center(x, self.n_fft, self.stride)  # [B,M,T,F]
        batch = jnp.concatenate(
            [jnp.real(spec), jnp.imag(spec)], axis=1)  # [B, 2M, T, F]
        h = self.conv(batch.transpose(0, 2, 3, 1))  # NHWC
        h = h.transpose(0, 3, 1, 2)  # [B, D, T, F]
        h = self.conv_norm(h)
        for blk in self.blocks:
            h = blk(h)
        return h


class EmbedTFGridNet(nn.Module):
    """Binaural enrollment network -> 256-d speaker d-vector
    (reference tfgridnet_orig/tfgridnet.py:88-127)."""

    embed_dim: int = 256
    n_fft: int = 128
    stride: int = 64
    n_imics: int = 2
    n_layers: int = 3
    emb_dim: int = 64
    lstm_hidden_units: int = 64
    eps: float = 1e-5

    def setup(self):
        self.trunk = OfflineTFGridNetTrunk(
            n_fft=self.n_fft, stride=self.stride, n_imics=self.n_imics,
            n_layers=self.n_layers, emb_dim=self.emb_dim,
            lstm_hidden_units=self.lstm_hidden_units, eps=self.eps)
        f = self.n_fft // 2 + 1
        self.embed_proj_dense = TorchDense(self.embed_dim)
        self.embed_proj_norm = LayerNorm(self.embed_dim, eps=self.eps)

    def __call__(self, x):
        """x: [B, M, N] noisy binaural enrollment -> [B, embed_dim]."""
        # std over (samples, mics), unbiased — torch.std default
        # (reference tfgridnet.py:109-110).
        n = x.shape[1] * x.shape[2]
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.sum((x - mean) ** 2, axis=(1, 2), keepdims=True) / (n - 1)
        x = x / jnp.sqrt(var)
        h = self.trunk(x)  # [B, C, T, F]
        b, c, t, f = h.shape
        h = h.transpose(0, 2, 1, 3).reshape(b, t, c * f)
        h = self.embed_proj_norm(self.embed_proj_dense(h))  # [B, T, E]
        return jnp.mean(h, axis=1)
