"""Streaming causal TF-GridNet separator (Flax), TPU-native.

Functionally equivalent to the reference's streaming separator
(reference src/models/tfgridnet_realtime/tfgridnet_causal.py): STFT
filterbank encoder -> causal Conv2d -> N x GridNet blocks (intra-freq
BiLSTM, inter-time uni-LSTM with carried state, causal windowed
attention with K/V ring buffers) -> transposed conv -> streaming iSTFT
with 1-frame overlap-add lookback. Speaker conditioning multiplies a
projected 256-d d-vector into the features before block 1
(tfgridnet_causal.py:249-252).

TPU-first design:
  * The whole model is a pure function of (params, x, embedding,
    state) -> (y, state); `state` is an explicit pytree — the same
    function serves full-utterance training (T frames at once, banded
    chunked attention) and 8 ms streaming steps (T=1 under
    `jax.lax.scan`).
  * All sequence ops are batched matmuls; the only sequential scan is
    the inter-time LSTM recurrence.
  * No Python control flow depends on data — everything jits to a
    single XLA program.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lookoncetohear_tpu.ops import attention as att_ops
from lookoncetohear_tpu.ops import stft as stft_ops
from lookoncetohear_tpu.ops.lstm import LSTM
from lookoncetohear_tpu.ops.norms import LayerNorm, PReLU


def _mxu_norms_enabled() -> bool:
    """Serving micro-optimization: compute the attention section's
    LayerNorm statistics as MXU dots against constant 0/1 head-segment
    matrices in the flat [B, D] projection-native layout
    (ops/norms.py flat_head_layer_norm), instead of VPU reductions
    over [B, T, F, nh, dim] views whose tiny minor axis lane-pads to
    128 (~21x wasted vector work for the e_dim=6 Q/K heads — PERF.md
    round-2 layout probes). Numerically equal up to f32 reassociation
    (tests/test_serve.py::TestMXUNorms). Kill switch:
    LOOKONCE_MXU_NORMS=0."""
    return os.environ.get("LOOKONCE_MXU_NORMS", "1") != "0"


def _fused_qkv_enabled() -> bool:
    """Serving micro-optimization: compute the three Q/K/V projections
    of a streaming step as ONE matmul on the concatenated kernels
    (column-independent, so numerically identical per projection).
    Saves two HBM reads of the block input plus two dispatches per
    block per 8 ms step. Kill switch: LOOKONCE_FUSED_QKV=0."""
    return os.environ.get("LOOKONCE_FUSED_QKV", "1") != "0"


def _torch_linear_init(in_features):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    for both kernel and bias."""
    bound = 1.0 / np.sqrt(in_features)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class TorchDense(nn.Module):
    """Dense with torch.nn.Linear's default initializer."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        init = _torch_linear_init(in_f)
        kernel = self.param("kernel", init, (in_f, self.features))
        bias = self.param("bias", init, (self.features,))
        return x @ kernel + bias


class AttnProjection(nn.Module):
    """Linear -> PReLU -> LayerNorm(flattened F*D) used for Q/K/V and
    the output projection of the attention (reference
    tfgridnet_causal.py:351-396)."""

    out_features: int  # per-frame projection width (e.g. E*n_head)
    norm_features: int  # LayerNorm width after head split/flatten

    def setup(self):
        self.dense = TorchDense(self.out_features)
        self.act = PReLU()
        self.norm = LayerNorm(self.norm_features)

    def project(self, x):
        """x: [B, T, F, C] -> [B, T, F, out_features] (pre-norm)."""
        return self.act(self.dense(x))

    def normalize(self, x):
        return self.norm(x)

    def normalize_native(self, y5):
        """Per-head LayerNorm WITHOUT the head-major transpose.

        y5: [B, T, F, nh, dim] (projection-native). Numerically equal
        to `normalize` applied to the [B, nh, T, F*dim] relayout: the
        norm is over (F, dim) per (B, T, head), with the shared
        [F*dim] scale/bias indexed (f, d). Keeping the projection's
        layout is what makes the v2 int8 serving path relayout-free
        (ops/attention.py 'v2' note)."""
        b, t, f, nh, dim = y5.shape
        if self.is_initializing():
            # init trace: run the head-major form once so the compact
            # LayerNorm creates its params (identical numerics)
            y = y5.transpose(0, 3, 1, 2, 4).reshape(b, nh, t, f * dim)
            y = self.normalize(y)
            return y.reshape(b, nh, t, f, dim).transpose(0, 2, 3, 1, 4)
        mu = jnp.mean(y5, axis=(2, 4), keepdims=True)
        var = jnp.var(y5, axis=(2, 4), keepdims=True)
        yn = (y5 - mu) / jnp.sqrt(var + self.norm.eps)
        scale = self.norm.variables["params"]["scale"].reshape(f, dim)
        bias = self.norm.variables["params"]["bias"].reshape(f, dim)
        return yn * scale[None, None, :, None, :] \
            + bias[None, None, :, None, :]

    def normalize_flat(self, y_flat, f: int, n_head: int, dim: int):
        """Per-head LayerNorm directly on the flat (f, head, dim)
        serving layout [B, f*n_head*dim] — same math as
        `normalize_native`, statistics via MXU segment dots
        (ops/norms.py flat_head_layer_norm) so no tiny-minor-axis
        tensor is materialized."""
        from lookoncetohear_tpu.ops.norms import (flat_head_layer_norm,
                                                  head_segment_matrix)
        sc = self.norm.variables["params"]["scale"].reshape(f, 1, dim)
        bi = self.norm.variables["params"]["bias"].reshape(f, 1, dim)
        sc = jnp.broadcast_to(sc, (f, n_head, dim)).reshape(-1)
        bi = jnp.broadcast_to(bi, (f, n_head, dim)).reshape(-1)
        seg = head_segment_matrix(f * n_head * dim, n_head, dim)
        return flat_head_layer_norm(y_flat, seg, float(f * dim), sc,
                                    bi, self.norm.eps)


class GridNetBlockStreaming(nn.Module):
    """One streaming GridNet block (reference tfgridnet_causal.py:
    297-590)."""

    emb_dim: int
    n_freqs: int
    hidden: int
    n_head: int = 4
    approx_qk_dim: int = 512
    local_atten_len: int = 50
    use_attn: bool = True
    chunk_causal: bool = True
    eps: float = 1e-5

    @property
    def e_dim(self) -> int:
        return int(np.ceil(self.approx_qk_dim / self.n_freqs))

    @property
    def v_dim(self) -> int:
        return self.emb_dim // self.n_head

    def setup(self):
        c, h = self.emb_dim, self.hidden
        f, e, vd, nh = self.n_freqs, self.e_dim, self.v_dim, self.n_head
        self.intra_norm = LayerNorm(c, eps=self.eps)
        self.intra_rnn = LSTM(c, h, bidirectional=True)
        self.intra_linear = TorchDense(c)
        self.inter_norm = LayerNorm(c, eps=self.eps)
        self.inter_rnn = LSTM(c, h)
        self.inter_linear = TorchDense(c)
        if self.use_attn:
            self.attn_q = AttnProjection(e * nh, f * e)
            self.attn_k = AttnProjection(e * nh, f * e)
            self.attn_v = AttnProjection(vd * nh, f * vd)
            self.attn_proj = AttnProjection(c, f * c)

    def init_state(self, batch_size: int, dtype=jnp.float32,
                   kv_dtype=None) -> Dict[str, Any]:
        f, h, w = self.n_freqs, self.hidden, self.local_atten_len
        nh, e, vd = self.n_head, self.e_dim, self.v_dim
        kv_dtype = dtype if kv_dtype is None else kv_dtype
        state = {
            "h": jnp.zeros((batch_size, f, h), dtype),
            "c": jnp.zeros((batch_size, f, h), dtype),
        }
        if self.use_attn and kv_dtype == jnp.int8:
            # v2 projection-native int8 ring: flat (f, h, d) slots +
            # per-(row, slot, head) scales (ops/attention.py 'v2').
            # Write-first, padded to ceil(W/8)*8 physical slots so the
            # TPU kernel's aliased 8-slot-window write has a legal
            # block shape; dead slots and slot `pos` are masked in
            # the softmax (ring_attend_int8_native).
            wp = ((w + 7) // 8) * 8
            state["k_buf"] = jnp.zeros(
                (batch_size, wp, f * nh * e), jnp.int8)
            state["v_buf"] = jnp.zeros(
                (batch_size, wp, f * nh * vd), jnp.int8)
            state["k_scale"] = jnp.zeros(
                (batch_size, wp, nh), jnp.float32)
            state["v_scale"] = jnp.zeros(
                (batch_size, wp, nh), jnp.float32)
            state["pos"] = jnp.zeros((), jnp.int32)
        elif self.use_attn:
            state["k_buf"] = jnp.zeros((batch_size, nh, w - 1, f * e),
                                       kv_dtype)
            state["v_buf"] = jnp.zeros((batch_size, nh, w - 1, f * vd),
                                       kv_dtype)
            state["pos"] = jnp.zeros((), jnp.int32)
        return state

    def _heads(self, proj: AttnProjection, x, dim):
        """Project + split heads + per-head (F*dim) LayerNorm.

        x: [B, T, F, C] -> [B, nh, T, F*dim]."""
        b, t, f, _ = x.shape
        y = proj.project(x)  # [B, T, F, dim*nh]
        y = y.reshape(b, t, f, self.n_head, dim)
        y = y.transpose(0, 3, 1, 2, 4).reshape(b, self.n_head, t, f * dim)
        return proj.normalize(y)

    def project_qkv(self, z):
        """z: [B, T, F, C] -> per-head normalized (q, k, v), each
        [B, nh, T, F*dim] (dim = e_dim for q/k, v_dim for v)."""
        q = self._heads(self.attn_q, z, self.e_dim)
        k = self._heads(self.attn_k, z, self.e_dim)
        v = self._heads(self.attn_v, z, self.v_dim)
        return q, k, v

    def output_projection(self, out):
        """Merged-heads attention output [B, T, F, nh*v_dim] ->
        pre-residual [B, T, F, C] (Linear + PReLU + LayerNorm over
        the flattened (F*C) frame)."""
        b, t, f, _ = out.shape
        c = self.emb_dim
        p = self.attn_proj.project(out)  # [B, T, F, C]
        p = self.attn_proj.normalize(p.reshape(b, t, f * c))
        return p.reshape(b, t, f, c)

    def attention_section(self, z, state):
        """The full t==1 streaming attention sub-graph: QKV projection
        + per-head norms + ring attention + single-slot ring write +
        output projection. z: [B, 1, F, C] -> (pre-residual p
        [B, 1, F, C], new_state with updated attention keys).

        Exposed as its own method so serving kernels and perf probes
        address exactly this section (the remaining serving-RTF gap,
        PERF.md round 2)."""
        b, t, f, c = z.shape
        assert t == 1, "attention_section is the streaming (t==1) path"
        nh, e, vd, w = self.n_head, self.e_dim, self.v_dim, \
            self.local_atten_len
        new_state = dict(state)
        pos = state["pos"]

        if state["k_buf"].dtype == jnp.int8:
            # v2 projection-native int8 path (ops/attention.py 'v2'
            # note): slots stored exactly as the projections emit them
            # — no head transpose, per-(row, slot, head) scales, and
            # the ring write fused into the attention op (aliased
            # in-kernel on TPU, dynamic_update_slice on CPU).
            def heads_native(proj, x, dim):
                y = proj.project(x)  # [B, 1, F, dim*nh]
                y = y.reshape(b, 1, f, nh, dim)
                return proj.normalize_native(y)

            if _fused_qkv_enabled() and not self.is_initializing():
                # ONE [C, 2*E*nh + V*nh] matmul instead of three dots
                # that each re-read z (see _fused_qkv_enabled);
                # per-projection PReLU slopes broadcast over their
                # column segments, then per-head norms on the slices —
                # numerically identical to the three-dot path.
                projs = (self.attn_q, self.attn_k, self.attn_v)
                widths = (e * nh, e * nh, vd * nh)
                kern = jnp.concatenate(
                    [p.dense.variables["params"]["kernel"]
                     for p in projs], axis=1)
                bias = jnp.concatenate(
                    [p.dense.variables["params"]["bias"]
                     for p in projs])
                alpha = jnp.concatenate(
                    [jnp.broadcast_to(
                        p.act.variables["params"]["alpha"], (wdt,))
                     for p, wdt in zip(projs, widths)])
                # no casts: keep the unfused path's dtype promotion
                y = z @ kern + bias
                y = jnp.where(y >= 0, y, alpha * y)
                if _mxu_norms_enabled():
                    # per-head LayerNorms straight on the flat serving
                    # layout: stats ride the MXU, and the lane-padded
                    # [B, 1, F, nh, 6] views never exist
                    qn = self.attn_q.normalize_flat(
                        y[..., :e * nh].reshape(b, f * nh * e),
                        f, nh, e)
                    kn = self.attn_k.normalize_flat(
                        y[..., e * nh:2 * e * nh].reshape(
                            b, f * nh * e), f, nh, e)
                    vn = self.attn_v.normalize_flat(
                        y[..., 2 * e * nh:].reshape(b, f * nh * vd),
                        f, nh, vd)
                else:
                    yq = y[..., :e * nh].reshape(b, 1, f, nh, e)
                    yk = y[..., e * nh:2 * e * nh].reshape(
                        b, 1, f, nh, e)
                    yv = y[..., 2 * e * nh:].reshape(b, 1, f, nh, vd)
                    qn = self.attn_q.normalize_native(yq).reshape(
                        b, f * nh * e)
                    kn = self.attn_k.normalize_native(yk).reshape(
                        b, f * nh * e)
                    vn = self.attn_v.normalize_native(yv).reshape(
                        b, f * nh * vd)
            else:
                qn = heads_native(self.attn_q, z, e).reshape(
                    b, f * nh * e)
                kn = heads_native(self.attn_k, z, e).reshape(
                    b, f * nh * e)
                vn = heads_native(self.attn_v, z, vd).reshape(
                    b, f * nh * vd)
            (out, new_state["k_buf"], new_state["k_scale"],
             new_state["v_buf"], new_state["v_scale"],
             new_state["pos"]) = att_ops.ring_attend_int8_native(
                qn, kn, vn, state["k_buf"], state["k_scale"],
                state["v_buf"], state["v_scale"], pos, f=f, n_head=nh,
                w=self.local_atten_len)
            # native out columns are already (f, head*vd) == the
            # merged-head channel order
            out = out.reshape(b, 1, f, nh * vd)
            if _mxu_norms_enabled() and not self.is_initializing():
                # output projection with its (F*C)-row LayerNorm in
                # the flat layout (ones-dot statistics on the MXU)
                from lookoncetohear_tpu.ops.norms import flat_layer_norm
                c = self.emb_dim
                p = self.attn_proj.project(out)       # [B, 1, F, C]
                pn = flat_layer_norm(
                    p.reshape(b, f * c),
                    self.attn_proj.norm.variables["params"]["scale"],
                    self.attn_proj.norm.variables["params"]["bias"],
                    self.attn_proj.norm.eps)
                return pn.reshape(b, 1, f, c), new_state
            return self.output_projection(out), new_state

        q, k, v = self.project_qkv(z)
        qf = q.reshape(b * nh, f * e)
        kf = k.reshape(b * nh, f * e)
        vf = v.reshape(b * nh, f * vd)
        k_buf = state["k_buf"].reshape(b * nh, w - 1, f * e)
        v_buf = state["v_buf"].reshape(b * nh, w - 1, f * vd)
        # Single-slot ring writes are issued DIRECTLY on the carried
        # 4-D state arrays (no reshape between the carry and its
        # dynamic_update_slice) so XLA aliases the scan carry in
        # place; a reshape in the write path forces a full
        # ~25 MB/block buffer copy every 8 ms step.
        out = att_ops.ring_attend(qf, kf, vf, k_buf, v_buf)
        kvdt = state["k_buf"].dtype
        new_state["k_buf"] = jax.lax.dynamic_update_slice_in_dim(
            state["k_buf"],
            kf.reshape(b, nh, 1, f * e).astype(kvdt), pos, axis=2)
        new_state["v_buf"] = jax.lax.dynamic_update_slice_in_dim(
            state["v_buf"],
            vf.reshape(b, nh, 1, f * vd).astype(kvdt), pos, axis=2)
        new_state["pos"] = (pos + 1) % (w - 1)
        out = out.reshape(b, nh, 1, f, vd)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, 1, f, nh * vd)
        return self.output_projection(out), new_state

    def __call__(self, x, state):
        """x: [B, C, T, F]; returns ([B, C, T, F], new_state)."""
        b, c, t, f = x.shape
        nh = self.n_head

        # --- intra-frequency bidirectional RNN -------------------------
        # t == 1 is the streaming step: opt into the fused Pallas scan
        # (inference-only); full utterances keep the lax.scan path for
        # autodiff.
        inp = x.transpose(0, 2, 3, 1)  # [B, T, F, C]
        # t == 1 serving: channel-LayerNorm statistics as ones-column
        # MXU dots on [B*F, C] rows instead of VPU lane reductions
        # (same trick as the attention-section norms; see
        # _mxu_norms_enabled)
        flat_ln = (t == 1 and _mxu_norms_enabled()
                   and not self.is_initializing())
        if flat_ln:
            from lookoncetohear_tpu.ops.norms import flat_layer_norm
            y = flat_layer_norm(
                inp.reshape(b * f, c),
                self.intra_norm.variables["params"]["scale"],
                self.intra_norm.variables["params"]["bias"],
                self.intra_norm.eps).reshape(b, t, f, c)
        else:
            y = self.intra_norm(inp)
        y = y.reshape(b * t, f, c)
        y, _ = self.intra_rnn(y, fused=(t == 1))  # [B*T, F, 2H]
        y = self.intra_linear(y)
        y = y.reshape(b, t, f, c) + inp

        # --- inter-time causal RNN (carried h/c) -----------------------
        inp2 = y
        if flat_ln:
            from lookoncetohear_tpu.ops.norms import flat_layer_norm
            z = flat_layer_norm(
                y.reshape(b * f, c),
                self.inter_norm.variables["params"]["scale"],
                self.inter_norm.variables["params"]["bias"],
                self.inter_norm.eps).reshape(b, t, f, c)
        else:
            z = self.inter_norm(y)  # [B, T, F, C]
        z = z.transpose(0, 2, 1, 3).reshape(b * f, t, c)
        h0 = state["h"].reshape(b * f, self.hidden)
        c0 = state["c"].reshape(b * f, self.hidden)
        z, (h_t, c_t) = self.inter_rnn(z, h0, c0)
        new_state = dict(state)
        new_state["h"] = h_t.reshape(b, f, self.hidden)
        new_state["c"] = c_t.reshape(b, f, self.hidden)
        z = self.inter_linear(z)  # [B*F, T, C]
        z = z.reshape(b, f, t, c).transpose(0, 2, 1, 3) + inp2

        if not self.use_attn:
            return z.transpose(0, 3, 1, 2), new_state

        if t == 1:
            # streaming step: the whole attention sub-graph (incl. the
            # reshape-free single-slot ring writes and optional int8
            # K/V) lives in attention_section
            p, attn_state = self.attention_section(z, new_state)
            out = z + p
            return out.transpose(0, 3, 1, 2), attn_state

        # --- causal windowed attention (full-utterance paths) ----------
        e, vd, w = self.e_dim, self.v_dim, self.local_atten_len
        q, k, v = self.project_qkv(z)  # [B, nh, T, F*dim]

        qf = q.reshape(b * nh, t, f * e)
        kf = k.reshape(b * nh, t, f * e)
        vf = v.reshape(b * nh, t, f * vd)
        k_buf = state["k_buf"].reshape(b * nh, w - 1, f * e)
        v_buf = state["v_buf"].reshape(b * nh, w - 1, f * vd)

        nk = nvb = None
        if self.chunk_causal:
            assert state["k_buf"].dtype != jnp.int8, \
                "int8 K/V is a streaming-step (t==1) serving feature"
            out, nk, nvb = att_ops.local_attention(
                qf, kf, vf, w, k_buf.astype(qf.dtype),
                v_buf.astype(vf.dtype))
            nk = nk.astype(state["k_buf"].dtype)
            nvb = nvb.astype(state["v_buf"].dtype)
        else:
            # offline fallback: triangular band mask over REAL
            # positions only (no zero ghost keys before the stream
            # start) — reference tfgridnet_causal.py:456-487
            out = att_ops.causal_banded_attention_full(qf, kf, vf, w)
            hist_k = jnp.concatenate(
                [k_buf.astype(qf.dtype), kf], axis=1)
            hist_v = jnp.concatenate(
                [v_buf.astype(vf.dtype), vf], axis=1)
            nk = hist_k[:, -(w - 1):].astype(state["k_buf"].dtype)
            nvb = hist_v[:, -(w - 1):].astype(state["v_buf"].dtype)
            # full pass leaves a time-ordered buffer; cursor 0 points
            # at the oldest slot, so subsequent ring steps stay correct
            new_state["pos"] = jnp.zeros((), jnp.int32)
        if nk is not None:  # full-chunk paths rewrite the whole buffer
            new_state["k_buf"] = nk.reshape(b, nh, w - 1, f * e)
            new_state["v_buf"] = nvb.reshape(b, nh, w - 1, f * vd)

        # Merge heads back to channels: channel = head * v_dim + v
        out = out.reshape(b, nh, t, f, vd)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, t, f, nh * vd)

        out = z + self.output_projection(out)
        return out.transpose(0, 3, 1, 2), new_state


def init_stream_state(batch_size: int, *, n_srcs: int, n_fft: int,
                      n_imics: int, n_layers: int, lstm_hidden_units: int,
                      attn_n_head: int, attn_approx_qk_dim: int,
                      emb_dim: int, local_atten_len: int, use_attn: bool,
                      t_ksize: int = 3, istft_lookback: int = 1,
                      dtype=jnp.float32, kv_dtype=None) -> Dict[str, Any]:
    """Zero streaming-state pytree for the separator — a pure function
    of the config, callable anywhere (reference init_buffers,
    tfgridnet_causal.py:173-186). kv_dtype optionally stores the K/V
    ring buffers (the bulk of the state) at lower precision."""
    f = n_fft // 2 + 1
    h, w, nh = lstm_hidden_units, local_atten_len, attn_n_head
    e = int(np.ceil(attn_approx_qk_dim / f))
    vd = emb_dim // nh if nh else emb_dim
    kv_dtype = dtype if kv_dtype is None else kv_dtype

    def block_state():
        s = {
            "h": jnp.zeros((batch_size, f, h), dtype),
            "c": jnp.zeros((batch_size, f, h), dtype),
        }
        if use_attn and kv_dtype == jnp.int8:
            # v2 projection-native layout: write-first ring padded to
            # ceil(W/8)*8 slots (ops/attention.py
            # ring_attend_int8_native)
            wp = ((w + 7) // 8) * 8
            s["k_buf"] = jnp.zeros(
                (batch_size, wp, f * nh * e), jnp.int8)
            s["v_buf"] = jnp.zeros(
                (batch_size, wp, f * nh * vd), jnp.int8)
            s["k_scale"] = jnp.zeros(
                (batch_size, wp, nh), jnp.float32)
            s["v_scale"] = jnp.zeros(
                (batch_size, wp, nh), jnp.float32)
            s["pos"] = jnp.zeros((), jnp.int32)
        elif use_attn:
            s["k_buf"] = jnp.zeros((batch_size, nh, w - 1, f * e),
                                   kv_dtype)
            s["v_buf"] = jnp.zeros((batch_size, nh, w - 1, f * vd),
                                   kv_dtype)
            s["pos"] = jnp.zeros((), jnp.int32)
        return s

    return {
        "conv_buf": jnp.zeros(
            (batch_size, 2 * n_imics, t_ksize - 1, f), dtype),
        "deconv_buf": jnp.zeros(
            (batch_size, emb_dim, t_ksize - 1, f), dtype),
        "istft_buf": jnp.zeros(
            (batch_size, n_srcs, 2 * f, istft_lookback), dtype),
        "blocks": [block_state() for _ in range(n_layers)],
    }


class StreamingTFGridNet(nn.Module):
    """Top-level streaming separator (reference tfgridnet_causal.py:
    52-294)."""

    n_srcs: int = 2
    n_fft: int = 192
    stride: int = 128
    n_imics: int = 2
    n_layers: int = 3
    lstm_hidden_units: int = 64
    attn_n_head: int = 4
    attn_approx_qk_dim: int = 512
    emb_dim: int = 64
    spk_emb_dim: int = 256
    local_atten_len: int = 50
    use_attn: bool = True
    chunk_causal: bool = True
    eps: float = 1e-5
    t_ksize: int = 3
    # rematerialize each block under autodiff: full-utterance training
    # otherwise holds every LSTM scan step's activations for backward
    # (~tens of GB at batch 8 x 5 s); recompute trades that for FLOPs
    # (jax.checkpoint, SURVEY 'HBM bandwidth' guidance)
    remat: bool = True

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def istft_lookback(self) -> int:
        return 1  # 1 + (pad-1)//pad for any pad >= 1

    def setup(self):
        d, f = self.emb_dim, self.n_freqs
        # Input causal conv: torch Conv2d(2M, D, (3,3), padding=(0,1));
        # time-causality comes from the 2-frame conv_buf prefix.
        self.conv = nn.Conv(
            features=d, kernel_size=(self.t_ksize, 3),
            padding=((0, 0), (1, 1)),
            kernel_init=nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform"),
            bias_init=_torch_linear_init(2 * self.n_imics * self.t_ksize * 3))
        block_cls = nn.remat(GridNetBlockStreaming) if self.remat \
            else GridNetBlockStreaming
        self.blocks = [
            block_cls(
                emb_dim=d, n_freqs=f, hidden=self.lstm_hidden_units,
                n_head=self.attn_n_head,
                approx_qk_dim=self.attn_approx_qk_dim,
                local_atten_len=self.local_atten_len,
                use_attn=self.use_attn, chunk_causal=self.chunk_causal,
                eps=self.eps)
            for i in range(self.n_layers)
        ]
        self.embed_proj_dense = TorchDense(d * f)
        self.embed_proj_norm = LayerNorm(d * f, eps=self.eps)
        # Deconv: torch ConvTranspose2d(D, n_srcs*2, (3,3),
        # padding=(t_ksize-1, 1)) == VALID conv with flipped kernel and
        # freq padding 1 after prepending the 2-frame deconv_buf.
        # torch ConvTranspose2d init uses fan_in = C_out * kh * kw.
        deconv_init = _torch_linear_init(self.n_srcs * 2 * self.t_ksize * 3)
        self.deconv = nn.Conv(
            features=self.n_srcs * 2, kernel_size=(self.t_ksize, 3),
            padding=((0, 0), (1, 1)),
            kernel_init=deconv_init, bias_init=deconv_init)

    def init_state(self, batch_size: int, dtype=jnp.float32,
                   kv_dtype=None) -> Dict[str, Any]:
        """Zero streaming state (reference init_buffers,
        tfgridnet_causal.py:173-186)."""
        return init_stream_state(
            batch_size, n_srcs=self.n_srcs, n_fft=self.n_fft,
            n_imics=self.n_imics, n_layers=self.n_layers,
            lstm_hidden_units=self.lstm_hidden_units,
            attn_n_head=self.attn_n_head,
            attn_approx_qk_dim=self.attn_approx_qk_dim,
            emb_dim=self.emb_dim, local_atten_len=self.local_atten_len,
            use_attn=self.use_attn, t_ksize=self.t_ksize,
            istft_lookback=self.istft_lookback, dtype=dtype,
            kv_dtype=kv_dtype)

    def __call__(self, x, spk_embedding, state, return_features=False):
        """Process audio through the separator.

        Args:
          x: [B, M, N] multi-channel audio; N must be a whole number of
            frames: N = n_fft + (T-1)*stride for T >= 1.
          spk_embedding: [B, spk_emb_dim] target-speaker d-vector.
          state: streaming state pytree from `init_state` (or a
            previous call).

        Returns:
          (audio [B, n_srcs, T*stride], new_state). As in the
          reference (tfgridnet_causal.py:269-273), the output is
          delayed by `istft_lookback*stride` relative to the input and
          the synthesis tail beyond T*stride is carried in the state.
        """
        b, m, n = x.shape
        f = self.n_freqs

        # ---- encoder: filterbank STFT --------------------------------
        spec = stft_ops.fb_encode(x, self.n_fft, self.stride)  # [B,M,2F,T]
        real = spec[:, :, :f, :]
        imag = spec[:, :, f:, :]
        batch = jnp.concatenate([real, imag], axis=1)  # [B, 2M, F, T]
        batch = batch.transpose(0, 1, 3, 2)  # [B, 2M, T, F]
        t = batch.shape[2]

        new_state = dict(state)

        # ---- causal input conv ---------------------------------------
        padded = jnp.concatenate([state["conv_buf"], batch], axis=2)
        new_state["conv_buf"] = padded[:, :, -(self.t_ksize - 1):, :]
        # flax Conv expects NHWC: [B, T+2, F, 2M]
        h = self.conv(padded.transpose(0, 2, 3, 1))  # [B, T, F, D]
        h = h.transpose(0, 3, 1, 2)  # [B, D, T, F]

        # ---- speaker conditioning (FiLM-by-multiplication) -----------
        emb = self.embed_proj_norm(self.embed_proj_dense(spk_embedding))
        emb = emb.reshape(b, self.emb_dim, f)[:, :, None, :]  # [B,D,1,F]

        # ---- GridNet blocks ------------------------------------------
        block_states = list(state["blocks"])
        for i, blk in enumerate(self.blocks):
            if i == 1:
                h = h * emb
            h, block_states[i] = blk(h, block_states[i])
        new_state["blocks"] = block_states

        # ---- causal deconv -------------------------------------------
        features = h  # [B, D, T, F] pre-deconv features (aux heads)
        padded = jnp.concatenate([state["deconv_buf"], h], axis=2)
        new_state["deconv_buf"] = padded[:, :, -(self.t_ksize - 1):, :]
        y = self.deconv(padded.transpose(0, 2, 3, 1))  # [B,T,F,2*n_srcs]
        y = y.transpose(0, 3, 1, 2)  # [B, 2*n_srcs, T, F]
        y = y.reshape(b, self.n_srcs, 2, t, f)
        y = y.transpose(0, 1, 2, 4, 3)  # [B, S, 2, F, T]
        y = jnp.concatenate([y[:, :, 0], y[:, :, 1]], axis=2)  # [B,S,2F,T]

        # ---- streaming iSTFT with lookback ---------------------------
        y = jnp.concatenate([state["istft_buf"], y], axis=3)
        new_state["istft_buf"] = y[..., -self.istft_lookback:]
        audio = stft_ops.fb_decode(y, self.n_fft, self.stride)
        audio = audio[..., self.istft_lookback * self.stride:]
        # Keep a whole number of hops; the synthesis tail of the last
        # frame ((n_fft - stride) samples) is completed by future
        # frames via istft_buf. The reference keeps the full ragged
        # decode and trims outside (net.py:61); we trim to T*stride
        # here which matches after Net's outer trim.
        audio = audio[..., :t * self.stride]
        if return_features:
            return audio, new_state, features
        return audio, new_state
