"""Causal local (banded) attention.

The streaming TF-GridNet attends with a strictly local causal window:
each time frame's query attends to exactly `window` key/value slots
[t-window+1, t], where slots before the start of the stream are
*zero* keys/values (score contribution 0, not -inf) — that is the
semantics of the reference's zero-initialized K/V ring buffers
(reference tfgridnet_causal.py:408-427,553-574).

The reference materializes the band with `unfold`, duplicating K/V
`window`x in memory (tfgridnet_causal.py:429-454). TPU-first we
instead use the two-chunk trick: split time into chunks of size W,
attend each query chunk to [previous chunk ++ own chunk] with a band
mask. Memory is O(T * 2W) scores instead of O(T * W * D) duplicated
keys, and every op is a batched matmul on the MXU.

`local_attention_step` is the O(1)-state streaming form used inside
`lax.scan`: a GEMV of the current query against a [window] ring
buffer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def local_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    window: int,
                    k_buf: jnp.ndarray | None = None,
                    v_buf: jnp.ndarray | None = None):
    """Banded causal attention over full sequences.

    Args:
      q: [B, T, Dk] queries (already scaled-normed as the model wants).
      k: [B, T, Dk] keys.
      v: [B, T, Dv] values.
      window: band width W; query t sees keys [t-W+1, t].
      k_buf / v_buf: optional [B, W-1, D*] carried context prepended
        before t=0 (zeros when absent — stream start).

    Returns:
      (out [B, T, Dv], new_k_buf [B, W-1, Dk], new_v_buf [B, W-1, Dv])
    """
    b, t, dk = q.shape
    dv = v.shape[-1]
    w = window
    scale = float(1.0 / np.sqrt(dk))

    if k_buf is None:
        k_buf = jnp.zeros((b, w - 1, dk), k.dtype)
    if v_buf is None:
        v_buf = jnp.zeros((b, w - 1, dv), v.dtype)

    # History including carried context, aligned so that global key
    # position of hist[:, i] is i - (w - 1).
    k_hist = jnp.concatenate([k_buf, k], axis=1)  # [B, W-1+T, Dk]
    v_hist = jnp.concatenate([v_buf, v], axis=1)

    new_k_buf = k_hist[:, -(w - 1):]
    new_v_buf = v_hist[:, -(w - 1):]

    # Pad T to a multiple of W; pad keys on the right too (the band
    # mask guarantees padded keys are never visible to valid queries).
    nc = -(-t // w)
    pad_t = nc * w - t
    qp = jnp.pad(q, ((0, 0), (0, pad_t), (0, 0)))
    # Keys: leading w-1 context + T + right pad; prepend 1 extra zero
    # so that chunked history starts exactly one chunk before chunk 0.
    kp = jnp.pad(k_hist, ((0, 0), (1, pad_t), (0, 0)))
    vp = jnp.pad(v_hist, ((0, 0), (1, pad_t), (0, 0)))

    qc = qp.reshape(b, nc, w, dk)
    kc = kp.reshape(b, nc + 1, w, dk)
    vc = vp.reshape(b, nc + 1, w, dv)

    # Two consecutive key chunks per query chunk: [B, nc, 2W, D]
    k2 = jnp.concatenate([kc[:, :-1], kc[:, 1:]], axis=2)
    v2 = jnp.concatenate([vc[:, :-1], vc[:, 1:]], axis=2)

    scores = jnp.einsum("bnwd,bnxd->bnwx", qc, k2) * scale
    # Query i (within chunk) is at concat position W + i; its band is
    # concat positions [i + 1, W + i].
    i_idx = np.arange(w)[:, None]
    x_idx = np.arange(2 * w)[None, :]
    band = (x_idx >= i_idx + 1) & (x_idx <= w + i_idx)
    scores = jnp.where(jnp.asarray(band), scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bnwx,bnxd->bnwd", attn, v2)
    out = out.reshape(b, nc * w, dv)[:, :t]
    return out, new_k_buf, new_v_buf


def local_attention_step(q_t: jnp.ndarray, k_t: jnp.ndarray,
                         v_t: jnp.ndarray,
                         k_buf: jnp.ndarray, v_buf: jnp.ndarray):
    """One streaming step of the banded attention.

    Args:
      q_t/k_t/v_t: [B, D*] current frame's projections.
      k_buf: [B, W-1, Dk], v_buf: [B, W-1, Dv] ring buffers.

    Returns (out [B, Dv], new_k_buf, new_v_buf).
    """
    dk = q_t.shape[-1]
    scale = float(1.0 / np.sqrt(dk))
    k_all = jnp.concatenate([k_buf, k_t[:, None]], axis=1)  # [B, W, Dk]
    v_all = jnp.concatenate([v_buf, v_t[:, None]], axis=1)
    scores = jnp.einsum("bd,bwd->bw", q_t, k_all) * scale
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bw,bwd->bd", attn, v_all)
    return out, k_all[:, 1:], v_all[:, 1:]


def ring_attend(q_t: jnp.ndarray, k_t: jnp.ndarray, v_t: jnp.ndarray,
                k_buf: jnp.ndarray, v_buf: jnp.ndarray) -> jnp.ndarray:
    """Compute-only streaming attention over ring history + current
    frame: softmax over the W-1 (unordered) buffer slots plus k_t/v_t.
    The caller owns the single-slot buffer write (issue it directly on
    the CARRIED state array, reshape-free, so XLA aliases it in
    place)."""
    from lookoncetohear_tpu.ops.pallas_attention import (
        attention_step_pallas, pallas_enabled)
    cdt = q_t.dtype
    if pallas_enabled() and k_buf.dtype == cdt:
        out, _, _ = attention_step_pallas(q_t, k_t, v_t, k_buf, v_buf,
                                          update_buffers=False)
        return out
    dk = q_t.shape[-1]
    scale = float(1.0 / np.sqrt(dk))
    k_all = jnp.concatenate([k_buf.astype(cdt), k_t[:, None]], axis=1)
    v_all = jnp.concatenate([v_buf.astype(cdt), v_t[:, None]], axis=1)
    scores = jnp.einsum("bd,bwd->bw", q_t, k_all) * scale
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bw,bwd->bd", attn, v_all)


def local_attention_step_ring(q_t: jnp.ndarray, k_t: jnp.ndarray,
                              v_t: jnp.ndarray,
                              k_buf: jnp.ndarray, v_buf: jnp.ndarray,
                              pos: jnp.ndarray):
    """Streaming step with a CIRCULAR ring buffer.

    Numerically identical to `local_attention_step` (softmax attention
    over an unordered window is permutation-invariant), but the buffer
    update writes ONE slot via dynamic_update_slice instead of
    rewriting all W-1 slots — the shift-concat update's full-buffer
    write is the dominant HBM traffic of the serving step. `pos` is a
    scalar int32 write cursor shared across the batch (resets zero the
    buffer, so cursor phase is irrelevant per stream).

    k_buf/v_buf may be stored in a lower precision (e.g. bfloat16);
    scores/values are computed in the q/v compute dtype.

    NOTE: the model's streaming path uses `ring_attend` + its own
    update on the carried 4-D state (see streaming_tfgridnet.py); this
    flat-buffer wrapper remains for op-level tests and external use.
    """
    out = ring_attend(q_t, k_t, v_t, k_buf, v_buf)
    w = k_buf.shape[1]
    new_k = jax.lax.dynamic_update_slice_in_dim(
        k_buf, k_t[:, None].astype(k_buf.dtype), pos, axis=1)
    new_v = jax.lax.dynamic_update_slice_in_dim(
        v_buf, v_t[:, None].astype(v_buf.dtype), pos, axis=1)
    new_pos = (pos + 1) % w
    return out, new_k, new_v, new_pos


def quantize_rows(x: jnp.ndarray):
    """Symmetric per-row int8 quantization over the last axis.

    x: [..., D] -> (q8 [..., D] int8, scale [...] f32) with
    x ~= q8 * scale."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                  -127, 127).astype(jnp.int8)
    return q8, scale


def ring_attend_int8(q_t, k_t, v_t, k_buf, k_scale, v_buf, v_scale):
    """Compute-only streaming attention over an int8-quantized K/V
    ring (W-1 history slots int8 + one f32 scale per (row, slot) —
    quarter the mandatory HBM read of f32, half of bf16). The current
    frame's k_t/v_t participate at full compute precision; the caller
    quantizes them once (`quantize_rows`) for its own buffer write.

      q_t/k_t: [B, Dk], v_t: [B, Dv] (compute dtype)
      k_buf: [B, W-1, Dk] int8, k_scale: [B, W-1] f32
      v_buf: [B, W-1, Dv] int8, v_scale: [B, W-1] f32
    Returns out [B, Dv].
    """
    from lookoncetohear_tpu.ops.pallas_attention import \
        attn_int8_pallas_enabled
    cdt = q_t.dtype
    dk = q_t.shape[-1]
    scale = float(1.0 / np.sqrt(dk))
    if attn_int8_pallas_enabled():
        # fused single-pass kernel (scores+softmax+weighted-V in VMEM)
        from lookoncetohear_tpu.ops.pallas_attention import \
            attention_step_int8_pallas
        return attention_step_int8_pallas(q_t, k_t, v_t, k_buf,
                                          k_scale, v_buf, v_scale)
    # dequantize-in-consumer: the int8->compute convert and the
    # per-slot scale fold into the reduction (XLA fuses them), so
    # HBM sees only the int8 bytes
    s_hist = jnp.einsum("bd,bwd->bw", q_t, k_buf.astype(cdt))
    s_hist = s_hist * k_scale.astype(cdt)
    s_cur = jnp.sum(q_t * k_t, axis=-1)  # [B]
    scores = jnp.concatenate([s_hist, s_cur[:, None]], axis=1) * scale
    attn = jax.nn.softmax(scores, axis=-1)  # [B, W]
    w_hist = attn[:, :-1] * v_scale.astype(cdt)  # fold scale in
    out = jnp.einsum("bw,bwd->bd", w_hist, v_buf.astype(cdt))
    return out + attn[:, -1:] * v_t


def local_attention_step_ring_int8(q_t, k_t, v_t, k_buf, k_scale,
                                   v_buf, v_scale, pos):
    """`ring_attend_int8` + flat-buffer single-slot ring write (the
    model issues the write on its carried 4-D state instead; this
    wrapper serves op-level tests and external callers).

    Returns (out [B, Dv], new_k_buf, new_k_scale, new_v_buf,
    new_v_scale, new_pos).
    """
    out = ring_attend_int8(q_t, k_t, v_t, k_buf, k_scale, v_buf,
                           v_scale)
    w = k_buf.shape[1]
    k8, ks = quantize_rows(k_t)
    v8, vs = quantize_rows(v_t)
    new_k = jax.lax.dynamic_update_slice_in_dim(
        k_buf, k8[:, None], pos, axis=1)
    new_v = jax.lax.dynamic_update_slice_in_dim(
        v_buf, v8[:, None], pos, axis=1)
    new_ks = jax.lax.dynamic_update_slice_in_dim(
        k_scale, ks[:, None].astype(k_scale.dtype), pos, axis=1)
    new_vs = jax.lax.dynamic_update_slice_in_dim(
        v_scale, vs[:, None].astype(v_scale.dtype), pos, axis=1)
    new_pos = (pos + 1) % w
    return out, new_k, new_ks, new_v, new_vs, new_pos


# --- projection-native ("v2") int8 ring layout --------------------------
#
# The round-2 int8 ring stored K/V head-major ([B*nh, W-1, F*dim]),
# which forced (a) a [B, T, F, nh, dim] -> [B, nh, T, F*dim] transpose
# of every projection every step and (b) kernels whose score reduction runs
# over the 582-wide LANE axis — measured at ~16 GB/s on this chip
# (PERF.md roofline). v2 stores each ring slot exactly as the
# projection emits it — flat (f, h, d) columns, [B, W-1, F*nh*dim] —
# so no transpose ever happens and kernels reduce over F on the
# SUBLANE axis with per-head lane segments handled by tiny matmuls.
# Quantization scales are per (row, slot, head): [B, W-1, nh].


def quantize_slot_native(x: jnp.ndarray, f: int, n_head: int):
    """Symmetric per-(row, head) int8 quantization of a projection-
    native slot. x: [B, F*nh*dim], column order (f, h, d) ->
    (q8 int8 same shape, scale [B, nh] f32)."""
    b, dflat = x.shape
    dim = dflat // (f * n_head)
    x4 = x.astype(jnp.float32).reshape(b, f, n_head, dim)
    amax = jnp.max(jnp.abs(x4), axis=(1, 3))  # [B, nh]
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q8 = jnp.clip(jnp.round(x4 / scale[:, None, :, None]), -127, 127)
    return q8.astype(jnp.int8).reshape(b, dflat), scale


def ring_attend_int8_native(q_t, k_t, v_t, k_buf, k_scale, v_buf,
                            v_scale, pos, *, f: int, n_head: int,
                            w: int = 0):
    """W-slot WRITE-FIRST streaming int8 ring attention in the
    projection-native layout, on a slot-PADDED ring.

      q_t/k_t: [B, F*nh*E], v_t: [B, F*nh*V]  (compute dtype, flat
        (f, h, d) column order — what the per-head-normalized
        projections emit, reshape-free)
      k_buf: [B, WP, F*nh*E] int8, k_scale: [B, WP, nh] f32
      v_buf: [B, WP, F*nh*V] int8, v_scale: [B, WP, nh] f32
        where WP = ceil(w/8)*8 physical slots (padding lets the TPU
        kernel write its aliased 8-slot window with a legal block)
      pos: scalar int32 ring cursor (the slot written THIS step),
        cycling mod w
      w: the REAL attention window (reference local_atten_len,
        tfgridnet_causal.py:553-574); defaults to WP when omitted

    Each step quantizes the current frame and writes it into slot
    `pos` (replacing the oldest frame) BEFORE attending; attention
    then runs over the updated ring with slot `pos` and the dead
    padding slots EXCLUDED from the softmax — the current frame
    instead participates at full precision via the separate
    current-frame term. Ring attention has no positional weighting,
    so this equals the attend-then-write (w-1)-slot form numerically;
    the point is the dataflow: the TPU kernel
    (ring_attend_int8_step_pallas) is the ring's only reader AND
    writer, which kills the ~27 MB/block/step relayout copies XLA
    otherwise inserts between the slot-write DUS and the attention
    dots (PERF.md round 3).

    Returns (out [B, F*nh*V], new_k_buf, new_k_scale, new_v_buf,
    new_v_scale, new_pos). This XLA form is the CPU fallback and the
    numerics reference.
    """
    from lookoncetohear_tpu.ops.pallas_attention import (
        attn_int8_consumer_pallas_enabled,
        ring_attend_int8_step_pallas)

    cdt = q_t.dtype
    b, dk = q_t.shape
    dv = v_t.shape[-1]
    wp = k_buf.shape[1]
    if w <= 0:
        w = wp
    e = dk // (f * n_head)
    vd = dv // (f * n_head)
    scale = float(1.0 / np.sqrt(dk // n_head))

    if attn_int8_consumer_pallas_enabled():
        import os
        return ring_attend_int8_step_pallas(
            q_t, k_t, v_t, k_buf, k_scale.astype(jnp.float32),
            v_buf, v_scale.astype(jnp.float32), pos,
            f=f, n_head=n_head, w_real=w,
            block_rows=int(os.environ.get(
                "LOOKONCE_ATTN_BLOCK_ROWS", "16")),
            w_chunk=int(os.environ.get("LOOKONCE_ATTN_WCHUNK", "0")),
            # batched bf16 MXU dots instead of ring-sized f32
            # elementwise temporaries (opt-in until chip-measured;
            # see _ring_v2_step_kernel mxu_dot)
            mxu_dot=os.environ.get(
                "LOOKONCE_ATTN_MXU_DOT", "0") == "1")

    # ---- XLA fallback: write first (quantize + single-slot DUS on
    # the carried arrays, no reshape between carry and update) ------
    k8, ks = quantize_slot_native(k_t, f, n_head)
    v8, vs = quantize_slot_native(v_t, f, n_head)
    new_k = jax.lax.dynamic_update_slice_in_dim(
        k_buf, k8[:, None], pos, axis=1)
    new_v = jax.lax.dynamic_update_slice_in_dim(
        v_buf, v8[:, None], pos, axis=1)
    new_ks = jax.lax.dynamic_update_slice_in_dim(
        k_scale, ks[:, None].astype(k_scale.dtype), pos, axis=1)
    new_vs = jax.lax.dynamic_update_slice_in_dim(
        v_scale, vs[:, None].astype(v_scale.dtype), pos, axis=1)
    new_pos = (pos + 1) % w

    # LAYOUT-STABILITY CONTRACT (measured, PERF.md round 3): read the
    # ring buffers only in their native flat [B, WP, D] layout:
    #   scores: ONE dot contracting the native minor axis d, with the
    #     0/1 head-segment mask folded into the tiny Q operand;
    #   values: out[b,d] = sum_h segv[h,d] * (sum_w wgt[b,w,h] *
    #     V8[b,w,d]) — G[b,h,d] for ALL heads with a single dot
    #     contracting the major axis w (4x the needed FLOPs, but MXU
    #     FLOPs are free and V8 streams once, layout-native), then a
    #     tiny segment-mask collapse. Head-batched einsums here cost
    #     ~27 MB of relayout copies per block per 8 ms step.
    segk = jnp.asarray(
        np.repeat(np.tile(np.eye(n_head, dtype=np.float32),
                          (f, 1)), e, axis=0), cdt)  # [dk, nh]
    qseg = q_t[:, :, None] * segk[None]              # [B, dk, nh]
    s4 = jax.lax.dot_general(
        new_k.astype(cdt), qseg,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))))  # [B, WP, nh]
    s4 = s4 * new_ks.astype(cdt) * scale
    # exclude slot `pos` (just-written current frame — the precise
    # current term below covers it) and any dead padding slots
    widx = jax.lax.broadcasted_iota(jnp.int32, (b, wp, n_head), 1)
    s4 = jnp.where((widx == pos) | (widx >= w), -jnp.inf, s4)
    s_cur = jnp.einsum("bd,bdh->bh", k_t, qseg) * scale
    m = jnp.maximum(jnp.max(s4, axis=1), s_cur)  # [B, nh]
    e_h = jnp.exp(s4 - m[:, None, :])
    e_c = jnp.exp(s_cur - m)
    den = jnp.sum(e_h, axis=1) + e_c  # [B, nh]
    wgt = e_h * new_vs.astype(cdt)  # [B, WP, nh]
    segv = jnp.asarray(
        np.repeat(np.tile(np.eye(n_head, dtype=np.float32),
                          (f, 1)), vd, axis=0), cdt)  # [dv, nh]
    g = jax.lax.dot_general(
        wgt, new_v.astype(cdt),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))))  # [B, nh, dv]
    out = jnp.sum(g * segv.T[None], axis=1)  # [B, dv]
    out = out.reshape(b, f, n_head, vd)
    out = out + e_c[:, None, :, None] * v_t.reshape(b, f, n_head, vd)
    out = out / den[:, None, :, None]
    out = out.reshape(b, dv)
    return out, new_k, new_ks, new_v, new_vs, new_pos


def causal_banded_attention_full(q, k, v, window):
    """Full (offline) causal attention with band `window`, softmax over
    only the in-band *real* positions (mask semantics of reference
    tfgridnet_causal.py:456-487, used when chunk_causal streaming
    buffers are absent). q/k/v: [B, T, D]."""
    t = q.shape[1]
    dk = q.shape[-1]
    scores = jnp.einsum("btd,bsd->bts", q, k) * float(1.0 / np.sqrt(dk))
    i = np.arange(t)[:, None]
    j = np.arange(t)[None, :]
    mask = (j <= i) & (j > i - window)
    scores = jnp.where(jnp.asarray(mask), scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bts,bsd->btd", attn, v)
