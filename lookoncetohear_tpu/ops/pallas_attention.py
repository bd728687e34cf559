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
    q = q_ref[:, :]  # [BB, Dk]
    # scores: [BB, W-1] history + [BB] current frame
    s_hist = jnp.sum(kbuf_ref[:, :, :] * q[:, None, :], axis=-1) * scale
    s_cur = jnp.sum(kt_ref[:, :] * q, axis=-1) * scale  # [BB]
    m = jnp.maximum(jnp.max(s_hist, axis=-1), s_cur)  # [BB]
    e_hist = jnp.exp(s_hist - m[:, None])  # [BB, W-1]
    e_cur = jnp.exp(s_cur - m)  # [BB]
    denom = jnp.sum(e_hist, axis=-1) + e_cur  # [BB]
    out = jnp.sum(e_hist[:, :, None] * vbuf_ref[:, :, :], axis=1)
    out = out + e_cur[:, None] * vt_ref[:, :]
    out_ref[:, :] = out / denom[:, None]


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
