"""Pallas TPU kernel: fused streaming banded-attention step.

One 8 ms step attends the current frame's query against a W-slot K/V
ring buffer (reference semantics at tfgridnet_causal.py:553-574). The
jnp path materializes the concatenated [B, W, D] K/V and the [B, W]
attention weights in HBM between ops; this kernel fuses
scores -> softmax -> weighted-V into a single VMEM-resident pass, so
K/V history is read from HBM exactly once and nothing else
round-trips.

Blocking: 8 (batch*head) rows per program (the f32 sublane quantum);
the W and D dims ride whole in VMEM (W=50, D<=776 -> ~1.5 MB/block).
The reductions are row-parallel broadcast-multiply-reduce on the VPU —
a batched GEMV has no MXU-friendly shape at N=1, so bandwidth, not
FLOPs, is the budget, and single-pass fusion is exactly what wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BB = 8  # rows per program (f32 sublane count)


def _attn_step_kernel(q_ref, kt_ref, vt_ref, kbuf_ref, vbuf_ref,
                      out_ref, *, scale: float):
    # compute in f32: Mosaic's layout inference rejects sub-32-bit
    # shape casts (bf16 [BB,D]->[BB,1,D]), and the accumulations want
    # f32 anyway; inputs/outputs stay in the caller's dtype in HBM
    q = q_ref[:, :].astype(jnp.float32)  # [BB, Dk]
    kbuf = kbuf_ref[:, :, :].astype(jnp.float32)
    vbuf = vbuf_ref[:, :, :].astype(jnp.float32)
    # scores: [BB, W-1] history + [BB] current frame
    s_hist = jnp.sum(kbuf * q[:, None, :], axis=-1) * scale
    s_cur = jnp.sum(kt_ref[:, :].astype(jnp.float32) * q,
                    axis=-1) * scale  # [BB]
    m = jnp.maximum(jnp.max(s_hist, axis=-1), s_cur)  # [BB]
    e_hist = jnp.exp(s_hist - m[:, None])  # [BB, W-1]
    e_cur = jnp.exp(s_cur - m)  # [BB]
    denom = jnp.sum(e_hist, axis=-1) + e_cur  # [BB]
    out = jnp.sum(e_hist[:, :, None] * vbuf, axis=1)
    out = out + e_cur[:, None] * vt_ref[:, :].astype(jnp.float32)
    out_ref[:, :] = (out / denom[:, None]).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "update_buffers"))
def attention_step_pallas(q_t: jnp.ndarray, k_t: jnp.ndarray,
                          v_t: jnp.ndarray, k_buf: jnp.ndarray,
                          v_buf: jnp.ndarray,
                          interpret: bool = False,
                          update_buffers: bool = True):
    """Same contract as ops.attention.local_attention_step:
    q_t/k_t [B, Dk], v_t [B, Dv], k_buf [B, W-1, Dk],
    v_buf [B, W-1, Dv] -> (out [B, Dv], new_k_buf, new_v_buf).
    With update_buffers=False the input buffers are returned untouched
    (the ring-buffer caller does its own single-slot write)."""
    b, dk = q_t.shape
    dv = v_t.shape[-1]
    wm1 = k_buf.shape[1]
    scale = float(1.0 / np.sqrt(dk))

    pad = (-b) % _BB
    if pad:
        q_p = jnp.pad(q_t, ((0, pad), (0, 0)))
        k_p = jnp.pad(k_t, ((0, pad), (0, 0)))
        v_p = jnp.pad(v_t, ((0, pad), (0, 0)))
        kb_p = jnp.pad(k_buf, ((0, pad), (0, 0), (0, 0)))
        vb_p = jnp.pad(v_buf, ((0, pad), (0, 0), (0, 0)))
    else:
        q_p, k_p, v_p, kb_p, vb_p = q_t, k_t, v_t, k_buf, v_buf
    bp = b + pad

    out = pl.pallas_call(
        functools.partial(_attn_step_kernel, scale=scale),
        grid=(bp // _BB,),
        in_specs=[
            pl.BlockSpec((_BB, dk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, dk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, dv), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, wm1, dk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, wm1, dv), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BB, dv), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, dv), q_t.dtype),
        interpret=interpret,
    )(q_p, k_p, v_p, kb_p, vb_p)
    out = out[:b]

    if not update_buffers:
        return out, k_buf, v_buf
    new_k = jnp.concatenate([k_buf[:, 1:], k_t[:, None]], axis=1)
    new_v = jnp.concatenate([v_buf[:, 1:], v_t[:, None]], axis=1)
    return out, new_k, new_v


def _attn_step_int8_kernel(q_ref, kt_ref, vt_ref, kbuf_ref, ks_ref,
                           vbuf_ref, vs_ref, out_ref, *, scale: float):
    q = q_ref[:, :].astype(jnp.float32)  # [BB, Dk]
    k8 = kbuf_ref[:, :, :].astype(jnp.float32)  # [BB, W-1, Dk]
    s_hist = jnp.sum(k8 * q[:, None, :], axis=-1)
    s_hist = s_hist * ks_ref[:, :].astype(jnp.float32) * scale
    s_cur = jnp.sum(kt_ref[:, :].astype(jnp.float32) * q,
                    axis=-1) * scale  # [BB]
    m = jnp.maximum(jnp.max(s_hist, axis=-1), s_cur)
    e_h = jnp.exp(s_hist - m[:, None])
    e_c = jnp.exp(s_cur - m)
    denom = jnp.sum(e_h, axis=-1) + e_c
    w = e_h * vs_ref[:, :].astype(jnp.float32)  # fold per-slot V scales
    out = jnp.sum(w[:, :, None] * vbuf_ref[:, :, :].astype(jnp.float32),
                  axis=1)
    out = out + e_c[:, None] * vt_ref[:, :].astype(jnp.float32)
    out_ref[:, :] = (out / denom[:, None]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_rows"))
def attention_step_int8_pallas(q_t, k_t, v_t, k_buf, k_scale, v_buf,
                               v_scale, interpret: bool = False,
                               block_rows: int = 64):
    """Fused scores->softmax->weighted-V over an int8 K/V ring buffer
    with per-slot scales (contract of ops.attention.
    local_attention_step_ring_int8, compute part only — the caller does
    the single-slot buffer write). Large row blocks: few grid programs
    = few serialized DMA waves (same lever that won 3.6x on the LSTM
    kernel)."""
    b, dk = q_t.shape
    dv = v_t.shape[-1]
    wm1 = k_buf.shape[1]
    scale = float(1.0 / np.sqrt(dk))
    bb = min(block_rows, b)

    pad = (-b) % bb
    if pad:
        q_t = jnp.pad(q_t, ((0, pad), (0, 0)))
        k_t = jnp.pad(k_t, ((0, pad), (0, 0)))
        v_t = jnp.pad(v_t, ((0, pad), (0, 0)))
        k_buf = jnp.pad(k_buf, ((0, pad), (0, 0), (0, 0)))
        k_scale = jnp.pad(k_scale, ((0, pad), (0, 0)))
        v_buf = jnp.pad(v_buf, ((0, pad), (0, 0), (0, 0)))
        v_scale = jnp.pad(v_scale, ((0, pad), (0, 0)))
    bp = b + pad

    out = pl.pallas_call(
        functools.partial(_attn_step_int8_kernel, scale=scale),
        grid=(bp // bb,),
        in_specs=[
            pl.BlockSpec((bb, dk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, dk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, dv), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, wm1, dk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, wm1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, wm1, dv), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, wm1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, dv), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, dv), q_t.dtype),
        interpret=interpret,
    )(q_t, k_t, v_t, k_buf, k_scale, v_buf, v_scale)
    return out[:b]


def pallas_enabled() -> bool:
    """Opt-in (LOOKONCE_PALLAS=1) and TPU-only. Measured on v5e, the
    XLA batched-GEMV path matches this kernel inside the full step
    (both are HBM-bound on the K/V read), so the kernel is kept as an
    alternative path rather than the default."""
    import os
    if not os.environ.get("LOOKONCE_PALLAS"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
