"""Banded local attention: chunked implementation vs a literal O(T*W)
reference, and streaming-step vs full equivalence."""

import numpy as np

import jax.numpy as jnp

from lookoncetohear_tpu.ops import attention as att


def _naive_banded(q, k, v, w, k_buf=None, v_buf=None):
    """Literal semantics: each query t softmaxes over exactly w slots
    [t-w+1, t]; out-of-stream slots are zero keys/values (or carried
    buffer content)."""
    b, t, dk = q.shape
    dv = v.shape[-1]
    if k_buf is None:
        k_buf = np.zeros((b, w - 1, dk), np.float32)
        v_buf = np.zeros((b, w - 1, dv), np.float32)
    k_hist = np.concatenate([k_buf, k], axis=1)
    v_hist = np.concatenate([v_buf, v], axis=1)
    out = np.zeros((b, t, dv), np.float32)
    for tt in range(t):
        ks = k_hist[:, tt:tt + w]  # [B, w, dk]
        vs = v_hist[:, tt:tt + w]
        scores = np.einsum("bd,bwd->bw", q[:, tt], ks) / np.sqrt(dk)
        scores = scores - scores.max(-1, keepdims=True)
        e = np.exp(scores)
        p = e / e.sum(-1, keepdims=True)
        out[:, tt] = np.einsum("bw,bwd->bd", p, vs)
    return out


def test_chunked_matches_naive():
    rng = np.random.default_rng(0)
    b, t, dk, dv, w = 2, 23, 5, 4, 7
    q = rng.standard_normal((b, t, dk)).astype(np.float32)
    k = rng.standard_normal((b, t, dk)).astype(np.float32)
    v = rng.standard_normal((b, t, dv)).astype(np.float32)
    out, nk, nv = att.local_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), w)
    ref = _naive_banded(q, k, v, w)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    # Ring buffers hold the last w-1 keys/values.
    np.testing.assert_allclose(np.asarray(nk), k[:, -(w - 1):],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nv), v[:, -(w - 1):],
                               rtol=1e-6, atol=1e-6)


def test_chunked_with_carried_buffers():
    rng = np.random.default_rng(1)
    b, t, d, w = 1, 11, 6, 5
    q = rng.standard_normal((b, t, d)).astype(np.float32)
    k = rng.standard_normal((b, t, d)).astype(np.float32)
    v = rng.standard_normal((b, t, d)).astype(np.float32)
    kb = rng.standard_normal((b, w - 1, d)).astype(np.float32)
    vb = rng.standard_normal((b, w - 1, d)).astype(np.float32)
    out, _, _ = att.local_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), w,
        jnp.asarray(kb), jnp.asarray(vb))
    ref = _naive_banded(q, k, v, w, kb, vb)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_streaming_steps_match_full():
    rng = np.random.default_rng(2)
    b, t, d, w = 3, 17, 8, 6
    q = rng.standard_normal((b, t, d)).astype(np.float32)
    k = rng.standard_normal((b, t, d)).astype(np.float32)
    v = rng.standard_normal((b, t, d)).astype(np.float32)
    full, _, _ = att.local_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), w)
    kb = jnp.zeros((b, w - 1, d))
    vb = jnp.zeros((b, w - 1, d))
    outs = []
    for tt in range(t):
        o, kb, vb = att.local_attention_step(
            jnp.asarray(q[:, tt]), jnp.asarray(k[:, tt]),
            jnp.asarray(v[:, tt]), kb, vb)
        outs.append(np.asarray(o))
    np.testing.assert_allclose(np.stack(outs, 1), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_window_exceeds_sequence():
    rng = np.random.default_rng(3)
    b, t, d, w = 1, 4, 3, 10
    q = rng.standard_normal((b, t, d)).astype(np.float32)
    k = rng.standard_normal((b, t, d)).astype(np.float32)
    v = rng.standard_normal((b, t, d)).astype(np.float32)
    out, _, _ = att.local_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), w)
    ref = _naive_banded(q, k, v, w)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_offline_fallback_model_runs():
    """chunk_causal=False: triangular-masked full attention path
    (reference tfgridnet_causal.py:456-487) compiles and runs."""
    import jax
    from lookoncetohear_tpu.models.net import Net
    net = Net(embed_dim=16, stft_chunk_size=32, stft_pad_size=16,
              num_ch=2, D=8, L=2, B=1, H=8, local_atten_len=6,
              use_attn=True, lookahead=True, chunk_causal=False)
    x = jnp.zeros((1, 2, 320))
    e = jnp.zeros((1, 1, 16))
    params = net.init(jax.random.PRNGKey(0), x, e)
    y = net.apply(params, x, e)
    assert y.shape == (1, 2, 320)
    assert np.isfinite(np.asarray(y)).all()


import jax


def test_full_causal_matches_banded_inside_window():
    """For T <= window with no history, banded-chunked attention and
    the triangular full attention differ only in zero-ghost keys; with
    window > T both see the same real keys for the final query."""
    rng = np.random.default_rng(9)
    b, t, d = 2, 6, 8
    q = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    full = att.causal_banded_attention_full(q, k, v, window=t)
    # last query in the banded form attends [t-w+1, t] incl. ghosts;
    # compute manually over the real keys only for comparison
    scores = (q[:, -1:] @ jnp.swapaxes(k, 1, 2)) / np.sqrt(d)
    attn = jax.nn.softmax(scores, -1)
    want = attn @ v
    np.testing.assert_allclose(np.asarray(full[:, -1:]),
                               np.asarray(want), atol=1e-5)


class TestInt8Ring:
    """int8-quantized K/V ring buffer (serving memory optimization,
    quarter the HBM floor of f32 — PERF.md)."""

    def _drive(self, steps=13, b=4, dk=8, dv=6, w=6, seed=11):
        rng = np.random.default_rng(seed)
        q = rng.standard_normal((steps, b, dk)).astype(np.float32)
        k = rng.standard_normal((steps, b, dk)).astype(np.float32)
        v = rng.standard_normal((steps, b, dv)).astype(np.float32)
        return q, k, v, b, dk, dv, w

    def test_matches_f32_ring_within_quant_tol(self):
        q, k, v, b, dk, dv, w = self._drive()
        kb32 = jnp.zeros((b, w - 1, dk))
        vb32 = jnp.zeros((b, w - 1, dv))
        kb8 = jnp.zeros((b, w - 1, dk), jnp.int8)
        vb8 = jnp.zeros((b, w - 1, dv), jnp.int8)
        ks = jnp.zeros((b, w - 1))
        vs = jnp.zeros((b, w - 1))
        p32 = jnp.zeros((), jnp.int32)
        p8 = jnp.zeros((), jnp.int32)
        for t in range(q.shape[0]):
            o32, kb32, vb32, p32 = att.local_attention_step_ring(
                jnp.asarray(q[t]), jnp.asarray(k[t]), jnp.asarray(v[t]),
                kb32, vb32, p32)
            o8, kb8, ks, vb8, vs, p8 = \
                att.local_attention_step_ring_int8(
                    jnp.asarray(q[t]), jnp.asarray(k[t]),
                    jnp.asarray(v[t]), kb8, ks, vb8, vs, p8)
            err = np.abs(np.asarray(o8) - np.asarray(o32)).max()
            ref = np.abs(np.asarray(o32)).max() + 1e-9
            assert err / ref < 0.03, (t, err / ref)

    def test_dequantized_buffer_tracks_history(self):
        q, k, v, b, dk, dv, w = self._drive(steps=5, w=6)
        kb8 = jnp.zeros((b, w - 1, dk), jnp.int8)
        vb8 = jnp.zeros((b, w - 1, dv), jnp.int8)
        ks = jnp.zeros((b, w - 1))
        vs = jnp.zeros((b, w - 1))
        pos = jnp.zeros((), jnp.int32)
        for t in range(5):
            _, kb8, ks, vb8, vs, pos = \
                att.local_attention_step_ring_int8(
                    jnp.asarray(q[t]), jnp.asarray(k[t]),
                    jnp.asarray(v[t]), kb8, ks, vb8, vs, pos)
        deq = np.asarray(kb8, np.float32) * np.asarray(ks)[..., None]
        np.testing.assert_allclose(deq[:, 0], k[0], atol=2e-2)
        np.testing.assert_allclose(deq[:, 4], k[4], atol=2e-2)

    def test_pallas_kernel_matches_xla_path(self):
        """Fused int8 kernel (interpret mode) == dequantize-in-consumer
        XLA formulation."""
        from lookoncetohear_tpu.ops.pallas_attention import (
            attention_step_int8_pallas)
        rng = np.random.default_rng(12)
        b, dk, dv, wm1 = 7, 16, 12, 9
        q = jnp.asarray(rng.standard_normal((b, dk)), jnp.float32)
        kt = jnp.asarray(rng.standard_normal((b, dk)), jnp.float32)
        vt = jnp.asarray(rng.standard_normal((b, dv)), jnp.float32)
        kb = jnp.asarray(
            rng.integers(-127, 128, (b, wm1, dk)), jnp.int8)
        vb = jnp.asarray(
            rng.integers(-127, 128, (b, wm1, dv)), jnp.int8)
        ks = jnp.asarray(rng.uniform(1e-3, 2e-2, (b, wm1)), jnp.float32)
        vs = jnp.asarray(rng.uniform(1e-3, 2e-2, (b, wm1)), jnp.float32)
        got = attention_step_int8_pallas(q, kt, vt, kb, ks, vb, vs,
                                         interpret=True, block_rows=4)
        scale = 1.0 / np.sqrt(dk)
        s_h = jnp.einsum("bd,bwd->bw", q, kb.astype(jnp.float32)) * ks
        s_c = jnp.sum(q * kt, axis=-1)
        scores = jnp.concatenate([s_h, s_c[:, None]], 1) * scale
        attn = jax.nn.softmax(scores, -1)
        want = jnp.einsum("bw,bwd->bd", attn[:, :-1] * vs,
                          vb.astype(jnp.float32)) + \
            attn[:, -1:] * vt
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


class TestInt8NativeRing:
    """Projection-native ('v2') int8 ring: flat (f, h, d) slots,
    per-(row, slot, head) scales, write-first slot update on a
    slot-padded ring (ops/attention.py ring_attend_int8_native + the
    Pallas step kernel). The serving layout that removes the
    per-step head transpose, the lane-axis reductions, and the
    in-scan relayout copies (PERF.md round 3)."""

    F, NH, E, VD, B = 5, 4, 3, 2, 8
    W = 6          # real attention window
    WP = 8         # padded physical slots (ceil(W/8)*8)

    def _mk(self, seed=21):
        rng = np.random.default_rng(seed)
        dk = self.F * self.NH * self.E
        dv = self.F * self.NH * self.VD
        q = jnp.asarray(rng.standard_normal((self.B, dk)), jnp.float32)
        kt = jnp.asarray(rng.standard_normal((self.B, dk)), jnp.float32)
        vt = jnp.asarray(rng.standard_normal((self.B, dv)), jnp.float32)
        # dead padding slots (index >= W) get RANDOM content so the
        # tests prove the softmax mask really excludes them
        kb = jnp.asarray(rng.integers(-127, 128, (self.B, self.WP, dk)),
                         jnp.int8)
        vb = jnp.asarray(rng.integers(-127, 128, (self.B, self.WP, dv)),
                         jnp.int8)
        ks = jnp.asarray(rng.uniform(1e-3, 2e-2,
                                     (self.B, self.WP, self.NH)),
                         jnp.float32)
        vs = jnp.asarray(rng.uniform(1e-3, 2e-2,
                                     (self.B, self.WP, self.NH)),
                         jnp.float32)
        return q, kt, vt, kb, ks, vb, vs

    def _to_v1(self, x, dim):
        """[B, F*NH*dim] flat (f, h, d) -> v1 rows [B*NH, F*dim]."""
        x = np.asarray(x).reshape(self.B, self.F, self.NH, dim)
        x = x.transpose(0, 2, 1, 3)
        return jnp.asarray(x.reshape(self.B * self.NH, self.F * dim))

    def test_native_matches_headmajor_v1_path(self):
        """v2 (write-first, padded ring) == the round-2 head-major
        int8 path on the same data: both quantize per (row, head) and
        compute f32 scores, so the layout must be the ONLY
        difference. The v2 ring writes the current frame into slot
        `pos` before attending (masked in the softmax) and never
        reads the dead padding slots, so the v1 comparison uses the
        other W-1 real slots as its history."""
        q, kt, vt, kb, ks, vb, vs = self._mk()
        pos = jnp.asarray(2, jnp.int32)
        out, nkb, nks, nvb, nvs, npos = att.ring_attend_int8_native(
            q, kt, vt, kb, ks, vb, vs, pos, f=self.F, n_head=self.NH,
            w=self.W)

        # v1 rows: head-major flatten of the W-1 surviving real
        # history slots (slot `pos` is overwritten + masked; padding
        # slots are masked; ring attention is slot-order-invariant)
        hist = [i for i in range(self.W) if i != 2]
        nh1 = len(hist)
        kb5 = np.asarray(kb)[:, hist].reshape(
            self.B, nh1, self.F, self.NH,
            self.E).transpose(0, 3, 1, 2, 4)
        kb1 = jnp.asarray(kb5.reshape(self.B * self.NH, nh1,
                                      self.F * self.E))
        vb5 = np.asarray(vb)[:, hist].reshape(
            self.B, nh1, self.F, self.NH,
            self.VD).transpose(0, 3, 1, 2, 4)
        vb1 = jnp.asarray(vb5.reshape(self.B * self.NH, nh1,
                                      self.F * self.VD))
        ks1 = jnp.asarray(np.asarray(ks)[:, hist].transpose(
            0, 2, 1).reshape(self.B * self.NH, nh1))
        vs1 = jnp.asarray(np.asarray(vs)[:, hist].transpose(
            0, 2, 1).reshape(self.B * self.NH, nh1))
        out1 = att.ring_attend_int8(
            self._to_v1(q, self.E), self._to_v1(kt, self.E),
            self._to_v1(vt, self.VD), kb1, ks1, vb1, vs1)
        out1 = np.asarray(out1).reshape(self.B, self.NH, self.F,
                                        self.VD).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(
            np.asarray(out).reshape(self.B, self.F, self.NH, self.VD),
            out1, rtol=1e-4, atol=1e-5)

        # ring write: slot `pos` holds the quantized current frame
        deq = np.asarray(nkb)[:, 2].astype(np.float32).reshape(
            self.B, self.F, self.NH, self.E)
        sc = np.asarray(nks)[:, 2]
        np.testing.assert_allclose(deq * sc[:, None, :, None],
                                   np.asarray(kt).reshape(deq.shape),
                                   atol=2e-2)
        assert int(npos) == 3

    def test_step_kernel_matches_fallback(self):
        """The Pallas step kernel (interpret) — the serving default
        on TPU — == the XLA fallback, bit-exact on the int8 ring
        writes (incl. the untouched slots of the written window)."""
        from lookoncetohear_tpu.ops.pallas_attention import \
            ring_attend_int8_step_pallas
        q, kt, vt, kb, ks, vb, vs = self._mk(seed=22)
        pos = jnp.asarray(4, jnp.int32)
        import os
        os.environ["LOOKONCE_NO_PALLAS"] = "1"
        try:
            ref = att.ring_attend_int8_native(
                q, kt, vt, kb, ks, vb, vs, pos, f=self.F,
                n_head=self.NH, w=self.W)
        finally:
            del os.environ["LOOKONCE_NO_PALLAS"]
        got = ring_attend_int8_step_pallas(
            q, kt, vt, kb, ks, vb, vs, pos, f=self.F, n_head=self.NH,
            w_real=self.W, block_rows=8, w_chunk=4, interpret=True)
        for name, a, b in zip(
                ("out", "k_buf", "k_scale", "v_buf", "v_scale", "pos"),
                ref, got):
            a, b = np.asarray(a), np.asarray(b)
            if a.dtype == np.int8:
                np.testing.assert_array_equal(a, b, err_msg=name)
            else:
                np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6,
                                           err_msg=name)

    def test_step_kernel_mxu_dot_matches_fallback(self):
        """The batched-bf16-MXU-dot kernel variant (mxu_dot=True,
        LOOKONCE_ATTN_MXU_DOT) == the XLA fallback: bit-exact int8
        ring writes (the write path is untouched), scores/values
        within bf16-contraction tolerance of the f32 form."""
        from lookoncetohear_tpu.ops.pallas_attention import \
            ring_attend_int8_step_pallas
        q, kt, vt, kb, ks, vb, vs = self._mk(seed=23)
        pos = jnp.asarray(4, jnp.int32)
        import os
        os.environ["LOOKONCE_NO_PALLAS"] = "1"
        try:
            ref = att.ring_attend_int8_native(
                q, kt, vt, kb, ks, vb, vs, pos, f=self.F,
                n_head=self.NH, w=self.W)
        finally:
            del os.environ["LOOKONCE_NO_PALLAS"]
        got = ring_attend_int8_step_pallas(
            q, kt, vt, kb, ks, vb, vs, pos, f=self.F, n_head=self.NH,
            w_real=self.W, block_rows=8, w_chunk=4, interpret=True,
            mxu_dot=True)
        for name, a, b in zip(
                ("out", "k_buf", "k_scale", "v_buf", "v_scale", "pos"),
                ref, got):
            a, b = np.asarray(a), np.asarray(b)
            if a.dtype == np.int8:
                np.testing.assert_array_equal(a, b, err_msg=name)
            else:
                np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2,
                                           err_msg=name)

    def test_write_first_slot_isolation(self):
        """Stepping twice writes two distinct slots and leaves the
        others (incl. the dead padding slots) untouched."""
        q, kt, vt, kb, ks, vb, vs = self._mk(seed=25)
        pos = jnp.asarray(0, jnp.int32)
        _, k1, ks1, v1, vs1, pos1 = att.ring_attend_int8_native(
            q, kt, vt, kb, ks, vb, vs, pos, f=self.F, n_head=self.NH,
            w=self.W)
        _, k2, _, _, _, pos2 = att.ring_attend_int8_native(
            q, 2.0 * kt, vt, k1, ks1, v1, vs1, pos1, f=self.F,
            n_head=self.NH, w=self.W)
        assert int(pos1) == 1 and int(pos2) == 2
        np.testing.assert_array_equal(np.asarray(k2)[:, 0],
                                      np.asarray(k1)[:, 0])
        np.testing.assert_array_equal(
            np.asarray(k2)[:, 3:], np.asarray(kb)[:, 3:])

    def test_pos_wraps_at_real_window(self):
        """The cursor cycles mod W (the real window), never touching
        the padding slots."""
        q, kt, vt, kb, ks, vb, vs = self._mk(seed=26)
        pos = jnp.asarray(self.W - 1, jnp.int32)
        _, nkb, _, _, _, npos = att.ring_attend_int8_native(
            q, kt, vt, kb, ks, vb, vs, pos, f=self.F, n_head=self.NH,
            w=self.W)
        assert int(npos) == 0
        np.testing.assert_array_equal(np.asarray(nkb)[:, self.W:],
                                      np.asarray(kb)[:, self.W:])
