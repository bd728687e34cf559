"""LSTM cells as `lax.scan` recurrences with PyTorch-compatible
parameterization.

Parameter layout matches torch.nn.LSTM exactly (gate order i, f, g, o;
`w_ih [4H, I]`, `w_hh [4H, H]`, two bias vectors) so reference
checkpoints convert weight-for-weight (north-star requirement, see
/root/repo/BASELINE.md). The input projection for *all* timesteps is
hoisted out of the scan into one large matmul (MXU-friendly); only the
[*, H] x [H, 4H] recurrent matmul stays inside the scan step.

Used for the intra-frequency BiLSTM and inter-time uni-LSTM of the
GridNet blocks (reference src/models/tfgridnet_realtime/
tfgridnet_causal.py:336-349,504-538).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class LSTMParams(NamedTuple):
    w_ih: jnp.ndarray  # [4H, I]
    w_hh: jnp.ndarray  # [4H, H]
    b_ih: jnp.ndarray  # [4H]
    b_hh: jnp.ndarray  # [4H]


def _chunk_len(t: int, min_len: int = 256) -> int | None:
    """Pick a time-chunk length for gradient-checkpointed scans.

    Long scans store O(T) per-step residuals for backward; chunking the
    scan (outer scan over chunks, inner rematted scan) cuts that to
    O(T/S) chunk-boundary carries + one chunk's residuals, the standard
    sqrt(T) checkpointing trade. Returns the smallest divisor of `t`
    >= sqrt(t) (so shapes stay static), or None when t < min_len (not
    worth the recompute) or t is awkwardly prime.

    LOOKONCE_FLAT_SCAN=1 disables chunking entirely (profiling knob:
    measures the remat recompute cost, perf/train_step_bench.py)."""
    import os
    if t < min_len or os.environ.get("LOOKONCE_FLAT_SCAN"):
        return None
    s = int(np.ceil(np.sqrt(t)))
    for cand in range(s, t // 2 + 1):
        if t % cand == 0:
            return cand
    return None


def _chunked_scan(step, carry0, xs, reverse: bool = False):
    """lax.scan with sqrt(T) gradient checkpointing over time.

    Equivalent numerics to a flat scan; backward recomputes one chunk
    at a time instead of storing every step's residuals. Used by the
    full-utterance training paths (the offline blocks' T~1250-step
    inter scans were the embed net's OOM driver at reference geometry)."""
    t = xs.shape[0]
    chunk = _chunk_len(t)
    if chunk is None:
        return jax.lax.scan(step, carry0, xs, reverse=reverse)
    n = t // chunk
    xs_c = xs.reshape((n, chunk) + xs.shape[1:])

    @jax.remat
    def chunk_fn(carry, xc):
        return jax.lax.scan(step, carry, xc, reverse=reverse)

    carry, ys = jax.lax.scan(chunk_fn, carry0, xs_c, reverse=reverse)
    return carry, ys.reshape((t,) + ys.shape[2:])


def _lstm_scan(x_proj: jnp.ndarray, w_hh_t: jnp.ndarray,
               h0: jnp.ndarray, c0: jnp.ndarray, hidden: int,
               reverse: bool = False):
    """Scan the recurrent part.

    x_proj: [B, T, 4H] (input projection + both biases already added)
    w_hh_t: [H, 4H]; h0, c0: [B, H].
    Returns (ys [B, T, H], (hT, cT)).
    """

    # remat the step: backward stores only the per-step (h, c) carries
    # and recomputes the gate nonlinearities — the i/f/g/o activations
    # are 4H wide per step and dominate scan-backward memory otherwise
    @jax.remat
    def step(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh_t  # [B, 4H]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    xs = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 4H]
    (h_t, c_t), ys = _chunked_scan(step, (h0, c0), xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1), (h_t, c_t)


def lstm_apply(params: LSTMParams, x: jnp.ndarray,
               h0: jnp.ndarray | None = None,
               c0: jnp.ndarray | None = None,
               reverse: bool = False):
    """Run a single-direction LSTM over x [B, T, I].

    Returns (outputs [B, T, H], (hT [B, H], cT [B, H])).
    """
    b = x.shape[0]
    hidden = params.w_hh.shape[1]
    x_proj = x @ params.w_ih.T + (params.b_ih + params.b_hh)
    # carries follow the compute dtype (params may be wider than the
    # input, e.g. f32 params under a bf16 activation stream)
    if h0 is None:
        h0 = jnp.zeros((b, hidden), x_proj.dtype)
    if c0 is None:
        c0 = jnp.zeros((b, hidden), x_proj.dtype)
    return _lstm_scan(x_proj, params.w_hh.T,
                      h0.astype(x_proj.dtype), c0.astype(x_proj.dtype),
                      hidden, reverse=reverse)


def lstm_apply_bidir(fwd: LSTMParams, bwd: LSTMParams, x: jnp.ndarray,
                     fused: bool = False):
    """Bidirectional LSTM as ONE fused scan.

    Instead of two T-step scans (forward + reverse), both directions
    ride a single scan with a leading direction axis — the reverse
    direction consumes the time-flipped input. Halves the number of
    sequential loop iterations, which dominates latency for the short
    per-frame frequency scans of the streaming step (T=F=97).

    fused=True additionally runs the recurrence as one Pallas TPU
    program (ops/pallas_lstm.py) — inference-only (no VJP); the
    streaming step enables it, training keeps the lax.scan path.

    x: [B, T, I] -> (y [B, T, 2H], ((hT_f, hT_b), (cT_f, cT_b))).
    """
    b, t, _ = x.shape
    hidden = fwd.w_hh.shape[1]
    xp_f = x @ fwd.w_ih.T + (fwd.b_ih + fwd.b_hh)
    xp_b = x[:, ::-1] @ bwd.w_ih.T + (bwd.b_ih + bwd.b_hh)
    w_hh = jnp.stack([fwd.w_hh.T, bwd.w_hh.T], axis=0)  # [2, H, 4H]
    # [T, 2, B, 4H], direction 1 time-flipped
    xp = jnp.stack([xp_f, xp_b], axis=0).transpose(2, 0, 1, 3)

    from lookoncetohear_tpu.ops.pallas_lstm import (bilstm_scan_pallas,
                                                    lstm_pallas_enabled)
    if fused and lstm_pallas_enabled():
        ys, c_t = bilstm_scan_pallas(xp, w_hh)
        ys = ys.astype(x.dtype)
        h_t = ys[-1].astype(x.dtype)  # [2, B, H]
        c_t = c_t.astype(x.dtype)
    else:
        # carries/emissions are [2B, *]: folding the direction axis
        # into batch keeps the minor two dims large so the per-step
        # residuals tile onto TPU (8,128) lanes pad-free (a [T,2,B,H]
        # stack pads the size-2 axis 4x). The step itself is rematted:
        # backward stores only (h, c) per step, not the 4H gates.
        xp2 = xp.reshape(xp.shape[0], 2 * b, 4 * hidden)

        @jax.remat
        def step(carry, xt):
            h, c = carry  # [2B, H]
            rec = jnp.einsum("dbh,dhg->dbg", h.reshape(2, b, hidden),
                             w_hh).reshape(2 * b, 4 * hidden)
            gates = xt + rec
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((2 * b, hidden), xp.dtype)
        (h_t2, c_t2), ys2 = _chunked_scan(step, (h0, h0), xp2)
        h_t = h_t2.reshape(2, b, hidden)
        c_t = c_t2.reshape(2, b, hidden)
        ys = ys2.reshape(ys2.shape[0], 2, b, hidden)
    # ys: [T, 2, B, H] -> forward as-is, backward time-flipped back
    y = jnp.concatenate(
        [ys[:, 0].swapaxes(0, 1), ys[:, 1].swapaxes(0, 1)[:, ::-1]],
        axis=-1)
    return y, ((h_t[0], h_t[1]), (c_t[0], c_t[1]))


def lstm_step(params: LSTMParams, x_t: jnp.ndarray,
              h: jnp.ndarray, c: jnp.ndarray):
    """One LSTM timestep for streaming: x_t [B, I], h/c [B, H]."""
    gates = x_t @ params.w_ih.T + (params.b_ih + params.b_hh) \
        + h @ params.w_hh.T
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class LSTM(nn.Module):
    """Single-layer LSTM module (torch.nn.LSTM parameter conventions).

    `bidirectional=True` concatenates forward and reverse outputs
    (reverse direction sees the sequence back-to-front, like torch).
    """

    in_features: int
    hidden_features: int
    bidirectional: bool = False

    def _direction_params(self, suffix: str) -> LSTMParams:
        h, i = self.hidden_features, self.in_features
        bound = 1.0 / (h ** 0.5)
        init = _uniform_init(bound)
        return LSTMParams(
            w_ih=self.param(f"w_ih{suffix}", init, (4 * h, i)),
            w_hh=self.param(f"w_hh{suffix}", init, (4 * h, h)),
            b_ih=self.param(f"b_ih{suffix}", init, (4 * h,)),
            b_hh=self.param(f"b_hh{suffix}", init, (4 * h,)),
        )

    @nn.compact
    def __call__(self, x, h0=None, c0=None, *, step: bool = False,
                 fused: bool = False):
        """x: [B, T, I] (or [B, I] when step=True).

        Returns (y, (hT, cT)); y is [B, T, H*dirs] ([B, H] for step).
        `fused` opts the bidirectional path into the inference-only
        Pallas scan kernel.
        """
        fwd = self._direction_params("_l0")
        if step:
            assert not self.bidirectional
            h, c = lstm_step(fwd, x, h0, c0)
            return h, (h, c)
        if not self.bidirectional:
            return lstm_apply(fwd, x, h0, c0)
        bwd = self._direction_params("_l0_reverse")
        return lstm_apply_bidir(fwd, bwd, x, fused=fused)
