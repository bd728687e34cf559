"""Fused Pallas BiLSTM scan vs the lax.scan reference path."""

import numpy as np
import jax
import jax.numpy as jnp

from lookoncetohear_tpu.ops.lstm import LSTM, LSTMParams, lstm_apply
from lookoncetohear_tpu.ops.pallas_lstm import bilstm_scan_pallas


def _params(rng, i, h):
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)
    return LSTMParams(w_ih=r(4 * h, i), w_hh=r(4 * h, h),
                      b_ih=r(4 * h), b_hh=r(4 * h))


def test_bilstm_kernel_matches_scan():
    rng = np.random.default_rng(0)
    b, t, i, h = 12, 97, 64, 64  # streaming shapes (incl. batch pad)
    fwd, bwd = _params(rng, i, h), _params(rng, i, h)
    x = jnp.asarray(rng.standard_normal((b, t, i)), jnp.float32)

    y_f, _ = lstm_apply(fwd, x)
    y_b, _ = lstm_apply(bwd, x, reverse=True)
    want = jnp.concatenate([y_f, y_b], axis=-1)

    xp_f = x @ fwd.w_ih.T + (fwd.b_ih + fwd.b_hh)
    xp_b = x[:, ::-1] @ bwd.w_ih.T + (bwd.b_ih + bwd.b_hh)
    xp = jnp.stack([xp_f, xp_b], axis=0).transpose(2, 0, 1, 3)
    w_hh = jnp.stack([fwd.w_hh.T, bwd.w_hh.T], axis=0)
    ys, c_t = bilstm_scan_pallas(xp, w_hh, interpret=True)
    got = jnp.concatenate(  # ys: [T, 2, B, H]
        [ys[:, 0].swapaxes(0, 1), ys[:, 1].swapaxes(0, 1)[:, ::-1]],
        axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)
    # final cell states match the scan path's (fixes the r1 trap where
    # the fused path returned c_t = h_t)
    _, (_, cf) = lstm_apply(fwd, x)
    _, (_, cb) = lstm_apply(bwd, x, reverse=True)
    np.testing.assert_allclose(np.asarray(c_t[0]), np.asarray(cf),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_t[1]), np.asarray(cb),
                               atol=2e-5)


def test_module_fused_flag_cpu_fallback():
    """On CPU the fused flag silently keeps the scan path — outputs
    identical with and without it."""
    lstm = LSTM(16, 16, bidirectional=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 20, 16)), jnp.float32)
    params = lstm.init(jax.random.PRNGKey(0), x)
    y1, _ = lstm.apply(params, x)
    y2, _ = lstm.apply(params, x, fused=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               atol=1e-6)


def test_bidir_single_scan_matches_two_scans():
    """The fused single-scan bidirectional path == two independent
    directional scans (the pre-optimization formulation)."""
    rng = np.random.default_rng(2)
    b, t, i, h = 3, 15, 8, 8
    fwd, bwd = _params(rng, i, h), _params(rng, i, h)
    x = jnp.asarray(rng.standard_normal((b, t, i)), jnp.float32)
    from lookoncetohear_tpu.ops.lstm import lstm_apply_bidir
    got, _ = lstm_apply_bidir(fwd, bwd, x)
    y_f, _ = lstm_apply(fwd, x)
    y_b, _ = lstm_apply(bwd, x, reverse=True)
    want = jnp.concatenate([y_f, y_b], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)
