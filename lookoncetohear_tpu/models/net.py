"""Public model wrappers with the reference's constructor/call
signatures.

`Net` mirrors reference src/models/tfgridnet_realtime/net.py:20-76
(mod-padding, lookahead pad, trim) around the streaming separator;
`EmbedNet` mirrors the enrollment model constructor of
reference src/models/tfgridnet_orig/tfgridnet.py:88-98.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from lookoncetohear_tpu.models.offline_tfgridnet import (EmbedTFGridNet,
                                                         OfflineTFGridNetTrunk)
from lookoncetohear_tpu.models.streaming_tfgridnet import (
    StreamingTFGridNet, init_stream_state)


def mod_pad(x: jnp.ndarray, chunk_size: int, pad: tuple[int, int]):
    """Pad the last axis to a whole number of chunks, then apply
    (left, right) extra padding (reference net.py:8-18)."""
    mod = 0
    if (x.shape[-1] % chunk_size) != 0:
        mod = chunk_size - (x.shape[-1] % chunk_size)
    widths = [(0, 0)] * (x.ndim - 1) + [(0, mod)]
    x = jnp.pad(x, widths)
    widths = [(0, 0)] * (x.ndim - 1) + [list(pad)]
    x = jnp.pad(x, widths)
    return x, mod


class Net(nn.Module):
    """Streaming TSE network (reference net.py `Net`).

    Config field names intentionally match the reference's
    `model_params` JSON schema (configs/tsh.json) so configs load
    unmodified: D=emb_dim, B=n_layers, L=attn heads, H=lstm hidden,
    I/J=emb_ks/emb_hs (must be 1 for the streaming variant).
    """

    stft_chunk_size: int = 160
    stft_pad_size: int = 120
    embed_dim: int = 256
    num_ch: int = 2
    D: int = 64
    B: int = 6
    I: int = 1
    J: int = 1
    L: int = 0
    H: int = 128
    use_attn: bool = False
    lookahead: bool = True
    local_atten_len: int = 100
    chunk_causal: bool = False
    num_src: int = 2
    # optional direction-of-arrival auxiliary head (the reference's
    # dir_loss task option, src/ts_hear_embed_pl_module.py:29-31,71-87,
    # whose model half is absent from the reference's committed code)
    dir_head: bool = False
    n_dir_bins: int = 33

    @property
    def nfft(self) -> int:
        return self.stft_chunk_size + self.stft_pad_size

    def setup(self):
        assert self.I == 1 and self.J == 1, \
            "streaming TF-GridNet uses emb_ks=emb_hs=1"
        self.tfgridnet = StreamingTFGridNet(
            n_srcs=self.num_src,
            n_fft=self.nfft,
            stride=self.stft_chunk_size,
            n_imics=self.num_ch,
            n_layers=self.B,
            lstm_hidden_units=self.H,
            attn_n_head=self.L,
            attn_approx_qk_dim=512,
            emb_dim=self.D,
            spk_emb_dim=self.embed_dim,
            local_atten_len=self.local_atten_len,
            use_attn=self.use_attn,
            chunk_causal=self.chunk_causal,
        )
        if self.dir_head:
            from lookoncetohear_tpu.models.streaming_tfgridnet import \
                TorchDense
            self.dir_proj = TorchDense(self.n_dir_bins)

    def _shifts_to_indices(self, shifts):
        """Map L/R cross-correlation shifts (±max_shift samples, the
        dataset's tgt_shift) to DoA bin indices in [0, n_dir_bins).
        Linear in shift (ITD) — our re-specification of the head the
        reference's dir_loss option expects but never committed."""
        max_shift = 16
        s = jnp.clip(shifts, -max_shift, max_shift)
        idx = jnp.round((s + max_shift) * (self.n_dir_bins - 1)
                        / (2 * max_shift))
        return idx.astype(jnp.int32)

    def init_state(self, batch_size: int, dtype=jnp.float32,
                   kv_dtype=None):
        return init_stream_state(
            batch_size, n_srcs=self.num_src, n_fft=self.nfft,
            n_imics=self.num_ch, n_layers=self.B,
            lstm_hidden_units=self.H, attn_n_head=self.L,
            attn_approx_qk_dim=512, emb_dim=self.D,
            local_atten_len=self.local_atten_len,
            use_attn=self.use_attn, dtype=dtype, kv_dtype=kv_dtype)

    def predict(self, x, embed, state, pad: bool = True):
        """x: [B, M, N']; embed: [B, E]. Returns (y [B, S, N'], state).

        With pad=True, x is mod-padded to whole chunks plus the
        `stft_pad_size` lookahead; the decoded audio is trimmed back so
        len(out) == len(in) (reference net.py:54-66).
        """
        n_in = x.shape[-1]
        if pad:
            pad_size = (0, self.stft_pad_size) if self.lookahead else (0, 0)
            x, _ = mod_pad(x, chunk_size=self.stft_chunk_size, pad=pad_size)
        y, next_state = self.tfgridnet(x, embed, state)
        if pad:
            # tfgridnet emits T*stride = n_in + mod samples (the
            # reference's decode-then-trim of lookahead, net.py:61-65);
            # trim the mod padding back off.
            y = y[..., :n_in]
        return y, next_state

    def __call__(self, x, embeds, state=None, pad: bool = True,
                 dir: bool = False):
        """x: [B, M, N]; embeds: [B, n_enroll, E] (first enrollment is
        used, reference net.py:68-76). Returns separated [B, S, N],
        plus per-frame DoA logits [B, T, n_dir_bins] when dir=True."""
        embeds = embeds[:, 0]
        if state is None:
            state = self.init_state(x.shape[0], x.dtype)
        if dir:
            assert self.dir_head, "construct Net with dir_head=True"
            n_in = x.shape[-1]
            pad_size = (0, self.stft_pad_size) if self.lookahead \
                else (0, 0)
            xp, _ = mod_pad(x, chunk_size=self.stft_chunk_size,
                            pad=pad_size)
            y, _, feats = self.tfgridnet(xp, embeds, state,
                                         return_features=True)
            y = y[..., :n_in]
            # [B, D, T, F] -> per-frame logits via freq-mean + Dense
            h = jnp.mean(feats, axis=3).transpose(0, 2, 1)  # [B, T, D]
            return y, self.dir_proj(h)
        y, _ = self.predict(x, embeds, state, pad)
        return y

    def step(self, x_chunk, embed, state):
        """One 8 ms streaming step: x_chunk [B, M, nfft] is the current
        chunk plus lookahead context; returns ([B, S, chunk], state)."""
        y, state = self.tfgridnet(x_chunk, embed, state)
        return y, state


class EmbedNet(nn.Module):
    """Enrollment network wrapper with the reference constructor
    signature (configs/embed.json model_params)."""

    embed_dim: int = 256
    num_ch: int = 2
    n_fft: int = 128
    stride: int = 64
    num_blocks: int = 3

    def setup(self):
        self.net = EmbedTFGridNet(
            embed_dim=self.embed_dim, n_fft=self.n_fft, stride=self.stride,
            n_imics=self.num_ch, n_layers=self.num_blocks)

    def __call__(self, x):
        """x: [B, M, N] noisy binaural enrollment -> [B, embed_dim]."""
        return self.net(x)


class OfflineSeparatorNet(nn.Module):
    """Offline 2-source separator (reference tfgridnet_orig
    `Net`, used by PIT separation experiments). Returns masks applied
    through the trunk's features; full iSTFT synthesis path."""

    num_ch: int = 1
    n_fft: int = 128
    stride: int = 64
    num_blocks: int = 6
    n_srcs: int = 2

    def setup(self):
        self.trunk = OfflineTFGridNetTrunk(
            n_fft=self.n_fft, stride=self.stride, n_imics=self.num_ch,
            n_layers=self.num_blocks, lstm_hidden_units=64)
        from lookoncetohear_tpu.models.streaming_tfgridnet import \
            _torch_linear_init
        self.deconv = nn.Conv(
            features=self.n_srcs * 2, kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=_torch_linear_init(self.n_srcs * 2 * 9),
            bias_init=_torch_linear_init(self.n_srcs * 2 * 9))

    def __call__(self, x):
        """x: [B, M, N] -> [B, n_srcs, N]."""
        import jax.numpy as jnp
        from lookoncetohear_tpu.ops import stft as stft_ops
        n = x.shape[1] * x.shape[2]
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.sum((x - mean) ** 2, axis=(1, 2), keepdims=True) / (n - 1)
        std = jnp.sqrt(var)
        xn = x / std
        h = self.trunk(xn)  # [B, C, T, F]
        y = self.deconv(h.transpose(0, 2, 3, 1))  # [B, T, F, 2S]
        b, t, f, _ = y.shape
        y = y.transpose(0, 3, 1, 2).reshape(b, self.n_srcs, 2, t, f)
        spec = y[:, :, 0] + 1j * y[:, :, 1]  # [B, S, T, F]
        audio = stft_ops.istft_center(
            spec, self.n_fft, self.stride, length=x.shape[-1])
        return audio * std
