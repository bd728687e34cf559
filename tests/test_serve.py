"""Serving engine + Pallas streaming-attention kernel."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lookoncetohear_tpu.models.net import Net
from lookoncetohear_tpu.ops.attention import local_attention_step
from lookoncetohear_tpu.ops.pallas_attention import attention_step_pallas
from lookoncetohear_tpu.serve.engine import StreamingEngine

TINY = dict(embed_dim=32, stft_chunk_size=64, stft_pad_size=32,
            num_ch=2, D=8, L=2, I=1, J=1, B=2, H=8,
            local_atten_len=8, use_attn=True, lookahead=True,
            chunk_causal=True)


def _engine(n=4):
    model = Net(**TINY)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 640)),
        jnp.zeros((1, 1, TINY["embed_dim"])))["params"]
    return model, params, StreamingEngine(model, params, max_streams=n)


class TestPallasAttention:
    def test_matches_jnp_step(self):
        rng = np.random.default_rng(0)
        b, w, dk, dv = 8, 10, 50, 36
        q = jnp.asarray(rng.standard_normal((b, dk)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, dk)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, dv)), jnp.float32)
        kb = jnp.asarray(rng.standard_normal((b, w - 1, dk)), jnp.float32)
        vb = jnp.asarray(rng.standard_normal((b, w - 1, dv)), jnp.float32)
        want, wk, wv = local_attention_step(q, k, v, kb, vb)
        got, gk, gv = attention_step_pallas(q, k, v, kb, vb,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(gk), np.asarray(wk))
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))

    def test_flagship_shapes(self):
        rng = np.random.default_rng(1)
        b, w, dk, dv = 16, 50, 582, 776  # 4 streams x 4 heads, F=97
        q = jnp.asarray(rng.standard_normal((b, dk)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, dk)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, dv)), jnp.float32)
        kb = jnp.asarray(rng.standard_normal((b, w - 1, dk)), jnp.float32)
        vb = jnp.asarray(rng.standard_normal((b, w - 1, dv)), jnp.float32)
        want, _, _ = local_attention_step(q, k, v, kb, vb)
        got, _, _ = attention_step_pallas(q, k, v, kb, vb,
                                          interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)


@pytest.mark.slow
class TestStreamingEngine:
    def test_engine_matches_full_forward(self):
        model, params, eng = _engine(n=2)
        rng = np.random.default_rng(2)
        chunk, n_chunks = TINY["stft_chunk_size"], 12
        n = chunk * n_chunks
        x = rng.standard_normal((2, 2, n)).astype(np.float32)
        emb = rng.standard_normal((2, TINY["embed_dim"])).astype(
            np.float32)
        eng.add_stream(0, emb[0])
        eng.add_stream(1, emb[1])

        outs = []
        for i in range(n_chunks):
            outs.append(np.asarray(
                eng.step(x[:, :, i * chunk:(i + 1) * chunk])))
        streamed = np.concatenate(outs, axis=-1)

        full = np.asarray(model.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(emb[:, None]),
            model.init_state(2), pad=False, method=model.predict)[0])
        # the engine emits each chunk one step late (it waits for the
        # next chunk's first pad samples = the lookahead): output chunk
        # k == full-forward chunk k-1
        np.testing.assert_allclose(streamed[..., chunk:],
                                   full[..., :n - chunk], atol=1e-4)

    def test_slot_isolation(self):
        _, _, eng = _engine(n=3)
        rng = np.random.default_rng(3)
        emb = rng.standard_normal((3, TINY["embed_dim"])).astype(
            np.float32)
        for s in range(3):
            eng.add_stream(s, emb[s])
        x = rng.standard_normal((3, 2, TINY["stft_chunk_size"] * 4)).astype(
            np.float32)
        c = TINY["stft_chunk_size"]
        ref = [np.asarray(eng.step(x[:, :, i * c:(i + 1) * c]))
               for i in range(4)]

        # re-run with stream 1 reset mid-way: streams 0/2 unaffected
        _, _, eng2 = _engine(n=3)
        for s in range(3):
            eng2.add_stream(s, emb[s])
        out2 = []
        for i in range(4):
            if i == 2:
                eng2.add_stream(1, emb[1])  # reset slot 1
            out2.append(np.asarray(eng2.step(x[:, :, i * c:(i + 1) * c])))
        for i in range(4):
            np.testing.assert_allclose(out2[i][0], ref[i][0], atol=1e-5)
            np.testing.assert_allclose(out2[i][2], ref[i][2], atol=1e-5)
        assert not np.allclose(out2[3][1], ref[3][1])

    def test_inactive_slots_zero(self):
        _, _, eng = _engine(n=2)
        eng.add_stream(0, np.ones(TINY["embed_dim"], np.float32))
        x = np.random.default_rng(4).standard_normal(
            (2, 2, TINY["stft_chunk_size"])).astype(np.float32)
        y = np.asarray(eng.step(x))
        assert np.abs(y[1]).max() == 0.0
        assert np.abs(y[0]).max() >= 0.0

    def test_pipelined_matches_sequential(self):
        """Throughput mode (K chunks in flight) returns exactly the
        sequential outputs, delayed by the pipeline depth."""
        rng = np.random.default_rng(11)
        emb = rng.standard_normal((2, TINY["embed_dim"])).astype(
            np.float32)
        c = TINY["stft_chunk_size"]
        x = rng.standard_normal((2, 2, c * 6)).astype(np.float32)

        _, _, eng = _engine(n=2)
        for s in range(2):
            eng.add_stream(s, emb[s])
        ref = [np.asarray(eng.step(x[:, :, i * c:(i + 1) * c]))
               for i in range(6)]

        _, _, eng2 = _engine(n=2)
        for s in range(2):
            eng2.add_stream(s, emb[s])
        got = []
        for i in range(6):
            y = eng2.step_pipelined(x[:, :, i * c:(i + 1) * c], depth=3)
            if y is not None:
                got.append(y)
        got.extend(eng2.drain())
        assert len(got) == 6
        for a, b in zip(got, ref):
            np.testing.assert_allclose(a, b, atol=1e-6)

    def test_benchmark_device_runs_on_cpu(self):
        """The on-device engine benchmark (scan over the REAL engine
        step incl. priming mask) executes and reports sane fields."""
        _, _, eng = _engine(n=2)
        eng.add_stream(0, np.ones(TINY["embed_dim"], np.float32))
        rep = eng.benchmark_device(n_short=2, n_long=6, repeats=2)
        for k in ("device_p50_ms", "device_p99_ms", "rtf", "streams"):
            assert k in rep
        assert rep["streams"] == 2
        assert np.isfinite(rep["rtf"])


@pytest.mark.slow
class TestShardedServing:
    def test_mesh_engine_matches_single_device(self):
        """Multi-chip serving: the engine jitted as shard_map over an
        8-device data mesh (streams sharded batch-major, params
        replicated, zero collectives) produces the single-device
        outputs exactly."""
        from jax.sharding import Mesh
        model = Net(**TINY)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, 640)),
            jnp.zeros((1, 1, TINY["embed_dim"])))["params"]
        rng = np.random.default_rng(17)
        n = 8
        emb = rng.standard_normal((n, TINY["embed_dim"])).astype(
            np.float32)
        c = TINY["stft_chunk_size"]
        x = rng.standard_normal((n, 2, c * 4)).astype(np.float32)

        ref_eng = StreamingEngine(model, params, max_streams=n)
        devs = np.array(jax.devices()).reshape(-1, 1)
        mesh = Mesh(devs, ("data", "model"))
        mesh_eng = StreamingEngine(model, params, max_streams=n,
                                   mesh=mesh)
        for s in range(n):
            ref_eng.add_stream(s, emb[s])
            mesh_eng.add_stream(s, emb[s])
        for i in range(4):
            chunk = x[:, :, i * c:(i + 1) * c]
            a = np.asarray(ref_eng.step(chunk))
            b = np.asarray(mesh_eng.step(chunk))
            np.testing.assert_allclose(b, a, atol=1e-5)
        # sharded state really is laid out over the mesh
        kb = mesh_eng.state["blocks"][0]["k_buf"]
        assert len(kb.sharding.device_set) == len(jax.devices())


@pytest.mark.slow
class TestBf16KV:
    def test_streaming_with_bf16_kv_close_to_f32(self):
        """bf16 K/V ring buffers: outputs track the f32 state path
        within bf16 rounding (the serving memory optimization)."""
        model = Net(**TINY)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, 640)),
            jnp.zeros((1, 1, TINY["embed_dim"])))["params"]
        rng = np.random.default_rng(7)
        chunk = TINY["stft_chunk_size"]
        nfft = chunk + TINY["stft_pad_size"]
        x = rng.standard_normal((1, 2, nfft)).astype(np.float32)
        emb = rng.standard_normal((1, TINY["embed_dim"])).astype(
            np.float32)

        def run(kv):
            state = model.init_state(1, kv_dtype=kv)
            outs = []
            for _ in range(8):
                y, state = model.apply({"params": params},
                                       jnp.asarray(x), jnp.asarray(emb),
                                       state, method=model.step)
                outs.append(np.asarray(y))
            return np.concatenate(outs, -1)

        y32 = run(jnp.float32)
        y16 = run(jnp.bfloat16)
        err = np.abs(y16 - y32).max() / (np.abs(y32).max() + 1e-9)
        assert err < 0.05, err


@pytest.mark.slow
class TestInt8KV:
    def test_streaming_with_int8_kv_close_to_f32(self):
        """int8 K/V ring buffers with per-slot scales: outputs track
        the f32 state path within quantization tolerance (quarter the
        serving step's HBM floor — PERF.md)."""
        model = Net(**TINY)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, 640)),
            jnp.zeros((1, 1, TINY["embed_dim"])))["params"]
        rng = np.random.default_rng(8)
        chunk = TINY["stft_chunk_size"]
        nfft = chunk + TINY["stft_pad_size"]
        emb = rng.standard_normal((1, TINY["embed_dim"])).astype(
            np.float32)

        def run(kv):
            state = model.init_state(1, kv_dtype=kv)
            outs = []
            r = np.random.default_rng(9)
            for _ in range(10):
                x = r.standard_normal((1, 2, nfft)).astype(np.float32)
                y, state = model.apply({"params": params},
                                       jnp.asarray(x), jnp.asarray(emb),
                                       state, method=model.step)
                outs.append(np.asarray(y))
            return np.concatenate(outs, -1)

        y32 = run(jnp.float32)
        y8 = run(jnp.int8)
        err = np.abs(y8 - y32).max() / (np.abs(y32).max() + 1e-9)
        assert err < 0.08, err


@pytest.mark.slow
class TestFusedQKV:
    def test_fused_qkv_matches_unfused_exactly(self, monkeypatch):
        """The fused single-matmul Q/K/V projection of the int8 serving
        step (streaming_tfgridnet._fused_qkv_enabled) matches the
        three-dot path up to XLA dot reduction-order noise (measured
        ~1e-6 over 6 steps; each output column is the same
        mathematical reduction)."""
        model = Net(**TINY)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, 640)),
            jnp.zeros((1, 1, TINY["embed_dim"])))["params"]
        emb = np.random.default_rng(3).standard_normal(
            (1, TINY["embed_dim"])).astype(np.float32)
        nfft = TINY["stft_chunk_size"] + TINY["stft_pad_size"]

        def run(flag):
            monkeypatch.setenv("LOOKONCE_FUSED_QKV", flag)
            state = model.init_state(1, kv_dtype=jnp.int8)
            outs = []
            r = np.random.default_rng(4)
            for _ in range(6):
                x = r.standard_normal((1, 2, nfft)).astype(np.float32)
                y, state = model.apply({"params": params},
                                       jnp.asarray(x), jnp.asarray(emb),
                                       state, method=model.step)
                outs.append(np.asarray(y))
            return np.concatenate(outs, -1)

        y_fused = run("1")
        y_ref = run("0")
        np.testing.assert_allclose(y_fused, y_ref, rtol=0, atol=1e-4)


@pytest.mark.slow
class TestMXUNorms:
    def test_flat_mxu_norms_match_native(self, monkeypatch):
        """The MXU-dot flat LayerNorms of the int8 serving step
        (streaming_tfgridnet._mxu_norms_enabled: per-head Q/K/V norms
        + the output-projection norm computed as segment-matrix dots
        on the flat [B, D] layout) match the normalize_native /
        LayerNorm path. Statistics are one-pass f32 E[x^2]-mu^2 vs
        two-pass, so tolerance covers f32 reassociation noise."""
        model = Net(**TINY)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, 640)),
            jnp.zeros((1, 1, TINY["embed_dim"])))["params"]
        emb = np.random.default_rng(5).standard_normal(
            (1, TINY["embed_dim"])).astype(np.float32)
        nfft = TINY["stft_chunk_size"] + TINY["stft_pad_size"]

        def run(flag):
            monkeypatch.setenv("LOOKONCE_MXU_NORMS", flag)
            state = model.init_state(1, kv_dtype=jnp.int8)
            outs = []
            r = np.random.default_rng(6)
            for _ in range(6):
                x = r.standard_normal((1, 2, nfft)).astype(np.float32)
                y, state = model.apply({"params": params},
                                       jnp.asarray(x), jnp.asarray(emb),
                                       state, method=model.step)
                outs.append(np.asarray(y))
            return np.concatenate(outs, -1)

        y_flat = run("1")
        y_ref = run("0")
        np.testing.assert_allclose(y_flat, y_ref, rtol=0, atol=1e-4)
