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


# --- projection-native ("v2") int8 ring STEP kernel ---------------------
#
# The serving-scan winner (round 3). Measured failure modes this
# design dodges, in order of discovery (PERF.md round 3):
#   1. XLA fallback inside the scan: layout assignment satisfies the
#      ring dots ({2,1,0}, d minor) AND the slot-write DUS (which
#      wants a slot-contiguous layout) by RELAYOUT-COPYING every
#      block's ring buffers (~27 MB) every 8 ms step.
#   2. Pure-consumer kernel + XLA DUS: the custom-call pins {2,1,0}
#      but the DUS still prefers slot-contiguous, so the carry keeps
#      a conflicting layout and the copies remain.
#   3. In-kernel single-slot aliased write: a (bb, 1, D) output block
#      is rejected (the slot dim must be divisible by 8 or equal W),
#      and manual HBM DMA trips a Mosaic memref_slice limitation on
#      this toolchain.
# Resolution: the ring is padded to W_PHYS = ceil(W/8)*8 slots and the
# kernel writes the 8-slot WINDOW containing `pos` through the normal
# output pipeline — a legal (bb, 8, D) block whose index map reads the
# scalar-prefetched cursor — with input_output_aliases donating the
# ring, so the 7 untouched window slots are rewritten with their own
# just-read values and everything else is untouched memory. The kernel
# is the ring's ONLY reader and writer: one {2,1,0} layout everywhere,
# no copies, ~27 MB read + ~4 MB window write per block per step.
# Softmax masks both the dead padding slots (index >= W) and slot
# `pos` (the just-written current frame, which instead participates
# at full precision via the separate current term — ring attention is
# slot-order-invariant, so numerics equal the attend-then-write form).


def _ring_v2_step_kernel(pos_ref, q_ref, kt_ref, vt_ref, ks_ref,
                         vs_ref, kbuf_ref, vbuf_ref,
                         out_ref, kwin_ref, kscw_ref, vwin_ref,
                         vscw_ref, *, f: int, n_head: int,
                         w_real: int, w_chunk: int, mxu_dot: bool):
    bb, dk = q_ref.shape
    dv = vt_ref.shape[1]
    wp = ks_ref.shape[1]                   # physical slots (padded)
    e = dk // (f * n_head)
    inv = float(1.0 / np.sqrt(f * e))
    segk = _head_segments(dk, f, n_head)   # [DK, nh]
    segv = _head_segments(dv, f, n_head)   # [DV, nh]
    pos = pos_ref[0]

    q = q_ref[:, :].astype(jnp.float32)
    kt = kt_ref[:, :].astype(jnp.float32)
    vt = vt_ref[:, :].astype(jnp.float32)

    # scores over the ring; w_chunk bounds the f32 temporaries (one
    # whole-ring chunk measured fastest at the serving shape).
    # mxu_dot: contract d with a BATCHED dot against the
    # segment-masked Q operand (the XLA fallback's exact form,
    # ops/attention.py ring_attend_int8_native) in bf16 with f32
    # accumulation — no ring-sized elementwise product temporary;
    # int8 -> bf16 is exact, q rounds to 8-bit mantissa (well inside
    # the int8 ring's own quantization error).
    if mxu_dot:
        qseg16 = (q[:, :, None] * segk[None, :, :]).astype(
            jnp.bfloat16)                          # [bb, DK, nh]
    parts = []
    for w0 in range(0, wp, w_chunk):
        wc = min(w_chunk, wp - w0)
        if mxu_dot:
            kb16 = kbuf_ref[:, pl.ds(w0, wc), :].astype(jnp.bfloat16)
            parts.append(jax.lax.dot_general(
                kb16, qseg16, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32))
        else:
            kb = kbuf_ref[:, pl.ds(w0, wc), :].astype(jnp.float32)
            prod = kb * q[:, None, :]              # [bb, wc, DK]
            parts.append(jax.lax.dot(prod.reshape(bb * wc, dk),
                                     segk).reshape(bb, wc, n_head))
    s4 = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    s4 = s4 * ks_ref[:, :, :] * inv                # [bb, WP, nh]
    # mask the dead padding slots and slot `pos` (just-written
    # current frame — the precise s_cur term below covers it)
    widx = jax.lax.broadcasted_iota(jnp.int32, (bb, wp, n_head), 1)
    s4 = jnp.where((widx == pos) | (widx >= w_real), -jnp.inf, s4)
    s_cur = jax.lax.dot(kt * q, segk) * inv        # [bb, nh]

    m = jnp.maximum(jnp.max(s4, axis=1), s_cur)
    e_h = jnp.exp(s4 - m[:, None, :])              # [bb, WP, nh]
    e_c = jnp.exp(s_cur - m)                       # [bb, nh]
    den = jnp.sum(e_h, axis=1) + e_c
    wgt = e_h * vs_ref[:, :, :]                    # [bb, WP, nh]

    outv = vt * (e_c @ segv.T)                     # [bb, DV]
    if mxu_dot:
        # G[b,h,d] = sum_w wgt[b,w,h] * V8[b,w,d] as one batched dot
        # contracting the slot axis (4x the needed FLOPs — free on
        # the MXU), then a tiny head-segment collapse; replaces a
        # ring-sized weight-expansion temporary + a slot-axis VPU
        # reduction per chunk.
        g = jnp.zeros((bb, n_head, dv), jnp.float32)
        wgt16 = wgt.astype(jnp.bfloat16)
        for w0 in range(0, wp, w_chunk):
            wc = min(w_chunk, wp - w0)
            vb16 = vbuf_ref[:, pl.ds(w0, wc), :].astype(jnp.bfloat16)
            g = g + jax.lax.dot_general(
                wgt16[:, w0:w0 + wc, :], vb16,
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        outv = outv + jnp.sum(g * segv.T[None, :, :], axis=1)
    else:
        for w0 in range(0, wp, w_chunk):
            wc = min(w_chunk, wp - w0)
            vb = vbuf_ref[:, pl.ds(w0, wc), :].astype(jnp.float32)
            wexp = jax.lax.dot(
                wgt[:, w0:w0 + wc, :].reshape(bb * wc, n_head),
                segv.T).reshape(bb, wc, dv)
            outv = outv + jnp.sum(vb * wexp, axis=1)
    outv = outv / (den @ segv.T)
    out_ref[:, :] = outv.astype(out_ref.dtype)

    # ---- quantize the current frame + window write ----------------
    # Per-head amax via the 0/1 segment columns — no lane-splitting
    # reshapes (Mosaic rejects [bb, D] -> [bb, F, nh*dim] casts).
    def quant(x_s, seg):
        ax = jnp.abs(x_s)                          # [bb, d_flat]
        amax = [jnp.max(ax * seg[:, h][None, :], axis=-1)[:, None]
                for h in range(n_head)]
        amax = jnp.concatenate(amax, axis=1)       # [bb, nh]
        sc = jnp.maximum(amax, 1e-12) / 127.0
        lane_sc = sc @ seg.T                       # [bb, d_flat]
        q8 = jnp.clip(jnp.round(x_s / lane_sc), -127, 127)
        return q8, sc                              # q8 kept f32

    k8f, k_sc = quant(kt, segk)
    v8f, v_sc = quant(vt, segv)
    wstart = (pos // 8) * 8
    loc = pos - wstart                             # 0..7 within window
    w8 = jax.lax.broadcasted_iota(jnp.int32, (bb, 8, 1), 1)
    hit = w8 == loc
    # the select runs in f32 (Mosaic rejects sub-32-bit [bb, D] ->
    # [bb, 1, D] broadcasts); int8 <-> f32 round-trips exactly in
    # [-127, 127], so the untouched window slots are bit-preserved
    kwin_ref[:, :, :] = jnp.where(
        hit, k8f[:, None, :],
        kbuf_ref[:, pl.ds(wstart, 8), :].astype(jnp.float32)
    ).astype(jnp.int8)
    vwin_ref[:, :, :] = jnp.where(
        hit, v8f[:, None, :],
        vbuf_ref[:, pl.ds(wstart, 8), :].astype(jnp.float32)
    ).astype(jnp.int8)
    kscw_ref[:, :, :] = jnp.where(
        hit, k_sc[:, None, :], ks_ref[:, pl.ds(wstart, 8), :])
    vscw_ref[:, :, :] = jnp.where(
        hit, v_sc[:, None, :], vs_ref[:, pl.ds(wstart, 8), :])


@functools.partial(
    jax.jit, static_argnames=("f", "n_head", "w_real", "block_rows",
                              "w_chunk", "interpret", "mxu_dot"))
def ring_attend_int8_step_pallas(q_t, k_t, v_t, k_buf, k_scale,
                                 v_buf, v_scale, pos, *, f: int,
                                 n_head: int, w_real: int,
                                 block_rows: int = 16,
                                 w_chunk: int = 0,
                                 interpret: bool = False,
                                 mxu_dot: bool = False):
    """Full v2 int8 ring step (contract of
    ops.attention.ring_attend_int8_native on the padded ring):
    quantize -> aliased 8-slot-window write -> masked scores ->
    softmax -> weighted V, one auto-pipelined Pallas kernel. The ring
    arrays hold ceil(w_real/8)*8 physical slots; `pos` cycles mod
    w_real. Returns (out, new_k_buf, new_k_scale, new_v_buf,
    new_v_scale, new_pos)."""
    b, dk = q_t.shape
    dv = v_t.shape[-1]
    wp = k_buf.shape[1]
    nh = k_scale.shape[-1]
    assert wp % 8 == 0 and wp >= w_real, (wp, w_real)
    bb = min(block_rows, b)
    if w_chunk <= 0:
        w_chunk = wp                              # one whole-ring chunk
    pad = (-b) % bb
    if pad:
        q_t = jnp.pad(q_t, ((0, pad), (0, 0)))
        k_t = jnp.pad(k_t, ((0, pad), (0, 0)))
        v_t = jnp.pad(v_t, ((0, pad), (0, 0)))
        k_buf = jnp.pad(k_buf, ((0, pad), (0, 0), (0, 0)))
        k_scale = jnp.pad(k_scale, ((0, pad), (0, 0), (0, 0)))
        v_buf = jnp.pad(v_buf, ((0, pad), (0, 0), (0, 0)))
        v_scale = jnp.pad(v_scale, ((0, pad), (0, 0), (0, 0)))
    bp = b + pad

    kernel = functools.partial(_ring_v2_step_kernel, f=f,
                               n_head=n_head, w_real=w_real,
                               w_chunk=w_chunk, mxu_dot=mxu_dot)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    win = lambda i, p: (i, p[0] // 8, 0)
    out, nkb, nks, nvb, nvs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bp // bb,),
            in_specs=[
                pl.BlockSpec((bb, dk), lambda i, p: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, dk), lambda i, p: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, dv), lambda i, p: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, wp, nh), lambda i, p: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, wp, nh), lambda i, p: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, wp, dk), lambda i, p: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, wp, dv), lambda i, p: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bb, dv), lambda i, p: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, 8, dk), win,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, 8, nh), win,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, 8, dv), win,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, 8, nh), win,
                             memory_space=pltpu.VMEM),
            ]),
        out_shape=[
            jax.ShapeDtypeStruct((bp, dv), q_t.dtype),
            jax.ShapeDtypeStruct((bp, wp, dk), jnp.int8),
            jax.ShapeDtypeStruct((bp, wp, nh), jnp.float32),
            jax.ShapeDtypeStruct((bp, wp, dv), jnp.int8),
            jax.ShapeDtypeStruct((bp, wp, nh), jnp.float32),
        ],
        # args: 0=pos, 1=q, 2=kt, 3=vt, 4=k_scale, 5=v_scale,
        #       6=k_buf, 7=v_buf
        input_output_aliases={6: 1, 4: 2, 7: 3, 5: 4},
        # Mosaic's stack allocator keeps every unrolled w-chunk's f32
        # temporaries live at once; the true high-water mark fits v5e
        # VMEM comfortably, so raise the per-kernel cap instead of
        # serializing chunks (the whole-ring chunk is the measured
        # fastest configuration).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(pos_arr, q_t, k_t, v_t, k_scale.astype(jnp.float32),
      v_scale.astype(jnp.float32), k_buf, v_buf)
    if pad:
        out = out[:b]
        nkb, nks = nkb[:b], nks[:b]
        nvb, nvs = nvb[:b], nvs[:b]
    posj = jnp.asarray(pos)
    return out, nkb, nks, nvb, nvs, (posj + 1) % w_real


# --- head-segment helper (shared by the v2 consumer kernel) -----------


def _head_segments(d_flat: int, f: int, n_head: int):
    """[D, nh] 0/1 matrix: column d belongs to head (d % (nh*dim))
    // dim, for flat (f, h, d) column order."""
    per_f = d_flat // f
    dim = per_f // n_head
    col = jax.lax.broadcasted_iota(jnp.int32, (d_flat, n_head), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (d_flat, n_head), 1)
    return ((col % per_f) // dim == head).astype(jnp.float32)


def pallas_enabled() -> bool:
    """Opt-in (LOOKONCE_PALLAS=1) and TPU-only. Measured on v5e, the
    XLA batched-GEMV path matches this kernel inside the full step
    (both are HBM-bound on the K/V read), so the kernel is kept as an
    alternative path rather than the default."""
    import os
    if not os.environ.get("LOOKONCE_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def attn_int8_consumer_pallas_enabled() -> bool:
    """Gate for the v2 int8 ring STEP kernel
    (ring_attend_int8_step_pallas): default-ON on real TPUs, where
    being the ring's only reader+writer pins the serving scan's
    carry layout and removes ~27 MB/block/step of XLA relayout
    copies (PERF.md round 3 — the change that took serving RTF from
    0.148 to 0.097); off on CPU; disabled by the LOOKONCE_NO_PALLAS
    kill switch (same as the fused BiLSTM)."""
    import os
    if os.environ.get("LOOKONCE_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def attn_int8_pallas_enabled() -> bool:
    """Gate for the v1-layout fused int8 attention kernel
    (attention_step_int8_pallas, used by ring_attend_int8): OPT-IN
    (LOOKONCE_ATTN_INT8_PALLAS=1) and TPU-only. The serving path
    uses the v2 step kernel instead (default-on via
    attn_int8_consumer_pallas_enabled).

    Summary of the kernel knobs:
      LOOKONCE_PALLAS=1            opt IN to the f32/bf16 attention kernel
      LOOKONCE_ATTN_INT8_PALLAS=1  opt IN to the v1 fused int8 kernel
      LOOKONCE_NO_PALLAS=1         opt OUT of all fused kernels (incl.
                                   the default-on fused BiLSTM and the
                                   v2 int8 ring step kernel)
      LOOKONCE_ATTN_BLOCK_ROWS / LOOKONCE_ATTN_WCHUNK
                                   v2 step-kernel blocking overrides
                                   (defaults 16 / whole-ring — the
                                   measured winners)
    """
    import os
    if os.environ.get("LOOKONCE_NO_PALLAS"):
        return False
    if not os.environ.get("LOOKONCE_ATTN_INT8_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
