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


# --- projection-native ("v2") fused int8 section kernel -----------------
#
# Layout rationale (ops/attention.py "v2" note + PERF.md roofline): the
# r2 kernel reduced scores over a 582-wide LANE axis — the measured
# ~16 GB/s pathology of this chip — and the model paid a
# [B,T,F,nh,dim] -> [B,nh,T,F*dim] relayout per projection per step.
# Here every ring slot is stored exactly as the projections emit it
# (flat (f, h, d) columns), the big reductions run over W/F via tiny
# MXU segment matmuls (lane-segment sums become dot(segments)), and
# the ring buffers stay in HBM: each 8 ms step DMA-reads the W-1 slots
# once, slab-by-slab double-buffered, and DMA-writes only the ONE new
# slot back through input/output aliasing — read 26.8 MB, write
# ~0.6 MB, nothing else round-trips.


def _head_segments(d_flat: int, f: int, n_head: int):
    """[D, nh] 0/1 matrix: column d belongs to head (d % (nh*dim))
    // dim, for flat (f, h, d) column order."""
    per_f = d_flat // f
    dim = per_f // n_head
    col = jax.lax.broadcasted_iota(jnp.int32, (d_flat, n_head), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (d_flat, n_head), 1)
    return ((col % per_f) // dim == head).astype(jnp.float32)


def _section_kernel(pos_ref, q_ref, kt_ref, vt_ref, ks_ref, vs_ref,
                    kbuf_hbm, vbuf_hbm,
                    out_ref, ksc_ref, vsc_ref, kbuf_out, vbuf_out,
                    kslab, vslab, k8_ref, v8_ref, sems, wsems, *,
                    f: int, n_head: int, bb: int, w_chunk: int):
    b, dk = q_ref.shape
    dv = vt_ref.shape[1]
    w1 = ks_ref.shape[1]
    e = dk // (f * n_head)
    inv = float(1.0 / np.sqrt(f * e))
    n_slabs = b // bb
    segk = _head_segments(dk, f, n_head)   # [DK, nh]
    segv = _head_segments(dv, f, n_head)   # [DV, nh]
    pos = pos_ref[0]

    def rdma(kind, slot, slab):
        src = (kbuf_hbm if kind == 0 else vbuf_hbm)
        dst = (kslab if kind == 0 else vslab)
        return pltpu.make_async_copy(
            src.at[pl.ds(slab * bb, bb)], dst.at[slot],
            sems.at[kind, slot])

    rdma(0, 0, 0).start()
    rdma(1, 0, 0).start()

    def slab_body(s, _):
        slot = jax.lax.rem(s, 2)
        nxt = jax.lax.rem(s + 1, 2)

        @pl.when(s + 1 < n_slabs)
        def _():
            rdma(0, nxt, s + 1).start()
            rdma(1, nxt, s + 1).start()

        rdma(0, slot, s).wait()
        rdma(1, slot, s).wait()

        row = pl.ds(s * bb, bb)
        q_s = q_ref[row, :].astype(jnp.float32)      # [bb, DK]
        kt_s = kt_ref[row, :].astype(jnp.float32)
        vt_s = vt_ref[row, :].astype(jnp.float32)    # [bb, DV]

        # ---- scores over the ring, chunked along W ------------------
        parts = []
        for w0 in range(0, w1, w_chunk):
            wc = min(w_chunk, w1 - w0)
            kb = kslab[slot, :, pl.ds(w0, wc), :].astype(jnp.float32)
            prod = kb * q_s[:, None, :]              # [bb, wc, DK]
            parts.append(
                jax.lax.dot(prod.reshape(bb * wc, dk), segk)
                .reshape(bb, wc, n_head))
        s4 = jnp.concatenate(parts, axis=1)          # [bb, W1, nh]
        s4 = s4 * ks_ref[row, :, :] * inv
        s_cur = jax.lax.dot(kt_s * q_s, segk) * inv  # [bb, nh]

        m = jnp.maximum(jnp.max(s4, axis=1), s_cur)
        e_h = jnp.exp(s4 - m[:, None, :])            # [bb, W1, nh]
        e_c = jnp.exp(s_cur - m)                     # [bb, nh]
        den = jnp.sum(e_h, axis=1) + e_c
        wgt = e_h * vs_ref[row, :, :]                # [bb, W1, nh]

        # ---- weighted V, chunked along W ----------------------------
        outv = e_c @ segv.T * 0.0                    # [bb, DV] zeros
        for w0 in range(0, w1, w_chunk):
            wc = min(w_chunk, w1 - w0)
            vb = vslab[slot, :, pl.ds(w0, wc), :].astype(jnp.float32)
            wexp = jax.lax.dot(
                wgt[:, w0:w0 + wc, :].reshape(bb * wc, n_head),
                segv.T).reshape(bb, wc, dv)
            outv = outv + jnp.sum(vb * wexp, axis=1)
        outv = outv + vt_s * (e_c @ segv.T)
        outv = outv / (den @ segv.T)
        out_ref[row, :] = outv.astype(out_ref.dtype)

        # ---- quantize the new slot + aliased ring write -------------
        def quant(x_s, d_flat, seg):
            # per-head amax WITHOUT lane-splitting reshapes (Mosaic
            # rejects [bb, D] -> [bb, F, nh*dim] shape casts): mask
            # the flat row with each head's 0/1 segment column and
            # max over all lanes
            ax = jnp.abs(x_s)                        # [bb, d_flat]
            amax = []
            for h in range(n_head):
                amax.append(jnp.max(ax * seg[:, h][None, :],
                                    axis=-1)[:, None])
            amax = jnp.concatenate(amax, axis=1)     # [bb, nh]
            sc = jnp.maximum(amax, 1e-12) / 127.0
            lane_sc = sc @ seg.T                     # [bb, d_flat]
            q8 = jnp.clip(jnp.round(x_s / lane_sc), -127, 127)
            return q8.astype(jnp.int8), sc

        k8, k_sc = quant(kt_s, dk, segk)
        v8, v_sc = quant(vt_s, dv, segv)
        k8_ref[slot] = k8
        v8_ref[slot] = v8
        # scales leave as small [B, nh] outputs; the wrapper does the
        # slot write in XLA (50 KB — avoids dynamic middle-dim VMEM
        # stores, the least-supported construct this kernel would
        # otherwise need)
        ksc_ref[row, :] = k_sc
        vsc_ref[row, :] = v_sc
        kw = pltpu.make_async_copy(
            k8_ref.at[slot], kbuf_out.at[pl.ds(s * bb, bb), pos],
            wsems.at[0, slot])
        vw = pltpu.make_async_copy(
            v8_ref.at[slot], vbuf_out.at[pl.ds(s * bb, bb), pos],
            wsems.at[1, slot])
        kw.start()
        vw.start()
        # small (~70 KB) writes: wait in place so the parity scratch
        # is free for slab s+2 (reads stay double-buffered — they are
        # the 26.8 MB that matters)
        kw.wait()
        vw.wait()
        return 0

    jax.lax.fori_loop(0, n_slabs, slab_body, 0)


@functools.partial(
    jax.jit, static_argnames=("f", "n_head", "block_rows", "w_chunk",
                              "interpret"))
def attention_section_int8_pallas(q_t, k_t, v_t, k_buf, k_scale,
                                  v_buf, v_scale, pos, *, f: int,
                                  n_head: int, block_rows: int = 8,
                                  w_chunk: int = 7,
                                  interpret: bool = False):
    """Fused v2 int8 ring attention step (contract of
    ops.attention.ring_attend_int8_native, Pallas TPU): scores ->
    softmax -> weighted-V -> quantize -> single-slot ring write, with
    the int8 ring buffers HBM-resident and aliased in place."""
    b, dk = q_t.shape
    dv = v_t.shape[-1]
    w1 = k_buf.shape[1]
    bb = min(block_rows, b)
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

    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    kernel = functools.partial(_section_kernel, f=f, n_head=n_head,
                               bb=bb, w_chunk=w_chunk)
    nh = k_scale.shape[-1]
    out, ksc, vsc, nkb, nvb = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pos
            pl.BlockSpec(memory_space=pltpu.VMEM),   # q
            pl.BlockSpec(memory_space=pltpu.VMEM),   # k_t
            pl.BlockSpec(memory_space=pltpu.VMEM),   # v_t
            pl.BlockSpec(memory_space=pltpu.VMEM),   # k_scale
            pl.BlockSpec(memory_space=pltpu.VMEM),   # v_scale
            pl.BlockSpec(memory_space=pltpu.HBM),    # k_buf
            pl.BlockSpec(memory_space=pltpu.HBM),    # v_buf
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # out
            pl.BlockSpec(memory_space=pltpu.VMEM),   # new-slot k scale
            pl.BlockSpec(memory_space=pltpu.VMEM),   # new-slot v scale
            pl.BlockSpec(memory_space=pltpu.HBM),    # new k_buf
            pl.BlockSpec(memory_space=pltpu.HBM),    # new v_buf
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, dv), q_t.dtype),
            jax.ShapeDtypeStruct((bp, nh), jnp.float32),
            jax.ShapeDtypeStruct((bp, nh), jnp.float32),
            jax.ShapeDtypeStruct((bp, w1, dk), jnp.int8),
            jax.ShapeDtypeStruct((bp, w1, dv), jnp.int8),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, bb, w1, dk), jnp.int8),   # kslab
            pltpu.VMEM((2, bb, w1, dv), jnp.int8),   # vslab
            pltpu.VMEM((2, bb, dk), jnp.int8),       # k8 write buf
            pltpu.VMEM((2, bb, dv), jnp.int8),       # v8 write buf
            pltpu.SemaphoreType.DMA((2, 2)),         # read sems
            pltpu.SemaphoreType.DMA((2, 2)),         # write sems
        ],
        input_output_aliases={6: 3, 7: 4},
        interpret=interpret,
    )(pos_arr, q_t, k_t, v_t,
      k_scale.astype(jnp.float32), v_scale.astype(jnp.float32),
      k_buf, v_buf)
    if pad:
        out, ksc, vsc = out[:b], ksc[:b], vsc[:b]
        nkb, nvb = nkb[:b], nvb[:b]
        k_scale, v_scale = k_scale[:b], v_scale[:b]
    # the scale arrays' single-slot write happens here in XLA (50 KB);
    # the kernel only writes the big int8 buffers via aliased DMA
    posj = jnp.asarray(pos)
    nks = jax.lax.dynamic_update_slice_in_dim(
        k_scale.astype(jnp.float32), ksc[:, None], posj, axis=1)
    nvs = jax.lax.dynamic_update_slice_in_dim(
        v_scale.astype(jnp.float32), vsc[:, None], posj, axis=1)
    return out, nkb, nks, nvb, nvs, (posj + 1) % w1


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


def attn_int8_pallas_enabled() -> bool:
    """Gate for the fused int8 attention section kernel: OPT-IN
    (LOOKONCE_ATTN_INT8_PALLAS=1) and TPU-only.

    Measured round 3 (perf/attn_path_breakdown.py): the projection-
    native v2 LAYOUT is what matters — the plain-XLA v2 ring step
    streams at ~600 GB/s effective (0.045 ms/block incl. quantize +
    slot write), already at this chip's ceiling, so XLA is the
    default. The fused kernel remains for experimentation; its
    manual-DMA form additionally trips a Mosaic limitation
    (memref_slice on (8,128)-tiled HBM refs) on this toolchain.

    Summary of the kernel knobs:
      LOOKONCE_PALLAS=1            opt IN to the f32/bf16 attention kernel
      LOOKONCE_ATTN_INT8_PALLAS=1  opt IN to the fused int8 section kernel
      LOOKONCE_NO_PALLAS=1         opt OUT of all fused kernels
                                   (incl. the default-on fused BiLSTM)
    """
    import os
    if os.environ.get("LOOKONCE_NO_PALLAS"):
        return False
    if not os.environ.get("LOOKONCE_ATTN_INT8_PALLAS"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
