"""LSTM parity with torch.nn.LSTM (gate order, bidirectional
semantics, carried state) — prerequisite for loading reference
checkpoints."""

import numpy as np
import pytest

import jax.numpy as jnp

from lookoncetohear_tpu.ops.lstm import LSTMParams, lstm_apply, lstm_step

torch = pytest.importorskip("torch")


def _make_torch_lstm(i, h, bidirectional=False, seed=0):
    torch.manual_seed(seed)
    return torch.nn.LSTM(i, h, 1, batch_first=True,
                         bidirectional=bidirectional)


def _params_from_torch(m, reverse=False):
    sfx = "_reverse" if reverse else ""
    return LSTMParams(
        w_ih=jnp.asarray(getattr(m, f"weight_ih_l0{sfx}").detach().numpy()),
        w_hh=jnp.asarray(getattr(m, f"weight_hh_l0{sfx}").detach().numpy()),
        b_ih=jnp.asarray(getattr(m, f"bias_ih_l0{sfx}").detach().numpy()),
        b_hh=jnp.asarray(getattr(m, f"bias_hh_l0{sfx}").detach().numpy()),
    )


def test_forward_lstm_matches_torch():
    i, h, b, t = 12, 16, 3, 20
    m = _make_torch_lstm(i, h)
    x = np.random.default_rng(0).standard_normal((b, t, i)).astype(np.float32)
    with torch.no_grad():
        ref, (h_t, c_t) = m(torch.from_numpy(x))
    params = _params_from_torch(m)
    ours, (h_o, c_o) = lstm_apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_o), h_t[0].numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_o), c_t[0].numpy(),
                               rtol=1e-5, atol=1e-5)


def test_forward_lstm_with_initial_state():
    i, h, b, t = 8, 8, 2, 10
    m = _make_torch_lstm(i, h, seed=1)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((b, t, i)).astype(np.float32)
    h0 = rng.standard_normal((b, h)).astype(np.float32)
    c0 = rng.standard_normal((b, h)).astype(np.float32)
    with torch.no_grad():
        ref, _ = m(torch.from_numpy(x),
                   (torch.from_numpy(h0[None]), torch.from_numpy(c0[None])))
    params = _params_from_torch(m)
    ours, _ = lstm_apply(params, jnp.asarray(x), jnp.asarray(h0),
                         jnp.asarray(c0))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_bidirectional_matches_torch():
    i, h, b, t = 10, 12, 2, 15
    m = _make_torch_lstm(i, h, bidirectional=True, seed=2)
    x = np.random.default_rng(2).standard_normal((b, t, i)).astype(np.float32)
    with torch.no_grad():
        ref, _ = m(torch.from_numpy(x))
    fwd = _params_from_torch(m)
    bwd = _params_from_torch(m, reverse=True)
    y_f, _ = lstm_apply(fwd, jnp.asarray(x))
    y_b, _ = lstm_apply(bwd, jnp.asarray(x), reverse=True)
    ours = np.concatenate([np.asarray(y_f), np.asarray(y_b)], axis=-1)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-5)


def test_step_equals_scan():
    i, h, b, t = 6, 7, 2, 9
    m = _make_torch_lstm(i, h, seed=3)
    params = _params_from_torch(m)
    x = np.random.default_rng(3).standard_normal((b, t, i)).astype(np.float32)
    full, (h_t, c_t) = lstm_apply(params, jnp.asarray(x))
    hh = jnp.zeros((b, h))
    cc = jnp.zeros((b, h))
    outs = []
    for k in range(t):
        hh, cc = lstm_step(params, jnp.asarray(x[:, k]), hh, cc)
        outs.append(np.asarray(hh))
    np.testing.assert_allclose(np.stack(outs, 1), np.asarray(full),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hh), np.asarray(h_t),
                               rtol=1e-5, atol=1e-5)
