"""Multi-stream real-time serving engine.

Production counterpart of the reference's per-chunk streaming loop
(reference net.py:54-66 driven one chunk at a time): N concurrent
binaural streams ride the leading batch dimension of ONE compiled
step — the streaming state pytree is batch-major by construction
(SURVEY §3.3), so concurrency is free parallelism on the MXU.

The engine owns:
  * the per-stream speaker embeddings,
  * the model's streaming state (conv/deconv tails, LSTM carries, K/V
    ring buffers, iSTFT lookback),
  * the (nfft - stride)-sample input tail that turns each incoming
    `stride`-sample chunk into an nfft-sample analysis window,
  * an active mask — attaching/detaching a stream zeroes exactly its
    state slice, with no recompilation and no effect on other slots.

Every step is one jitted call: fixed shapes, O(1) state, 8 ms of audio
in -> 8 ms out per stream.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _mask_tree(tree, keep_mask):
    """Zero the leading-dim slices where keep_mask is False. Leaves
    without a per-stream leading dim (e.g. the scalar ring-buffer
    cursor) pass through untouched."""
    n = keep_mask.shape[0]
    def leaf(x):
        if x.ndim == 0 or x.shape[0] != n:
            return x
        m = keep_mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, x, jnp.zeros_like(x))
    return jax.tree_util.tree_map(leaf, tree)


class StreamingEngine:
    def __init__(self, model, params, max_streams: int = 64,
                 dtype=jnp.float32, kv_dtype=None, mesh=None) -> None:
        """dtype=jnp.bfloat16 runs the whole step (params, activations,
        state) in bf16 — halves every HBM stream for a measured
        ~0.05 dB SI-SNRi cost on a trained flagship checkpoint
        (PERF.md); kv_dtype further overrides just the K/V ring-buffer
        storage. Default keeps full precision.

        mesh: optional `jax.sharding.Mesh` with a "data" axis — scales
        serving ACROSS chips: params replicate, every batch-major
        array (state, tails, embeddings, chunks) shards its leading
        stream dimension over "data", and the one jitted step runs
        SPMD with zero cross-chip collectives (streams are
        independent). N chips = N x max_streams capacity with the
        single-chip step's latency. max_streams must be divisible by
        the data-axis size."""
        self.model = model
        self.mesh = mesh
        self._repl = None
        self._shard = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            assert max_streams % mesh.shape["data"] == 0, \
                "max_streams must divide over the data mesh axis"
            self._repl = NamedSharding(mesh, PartitionSpec())
            self._shard = NamedSharding(mesh, PartitionSpec("data"))
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype), params)
        if self._repl is not None:
            self.params = jax.device_put(self.params, self._repl)
        self.n = max_streams
        self.dtype = dtype
        self.chunk = model.stft_chunk_size
        self.nfft = model.nfft
        self.n_mics = model.num_ch
        self.embed_dim = model.embed_dim

        assert self.nfft - self.chunk <= self.chunk, \
            "lookahead pad must not exceed the chunk size"
        self._kv_dtype = kv_dtype
        self.state = model.init_state(max_streams, dtype,
                                      kv_dtype=kv_dtype)
        if self._shard is not None:
            self.state = jax.device_put(
                self.state, jax.tree_util.tree_map(
                    lambda x: (self._shard if x.ndim > 0
                               and x.shape[0] == max_streams
                               else self._repl), self.state))
        # previous chunk; each analysis window = [prev_chunk ;
        # new_chunk[:pad]] so the frame grid matches the reference's
        # chunk-aligned framing (net.py:54-66). Output therefore lags
        # the input by chunk + pad samples = the 12 ms algorithmic
        # latency (8 ms chunk + 4 ms lookahead).
        self.input_tail = jnp.zeros(
            (max_streams, self.n_mics, self.chunk), dtype)
        self.embeds = jnp.zeros((max_streams, self.embed_dim), dtype)
        if self._shard is not None:
            self.input_tail = jax.device_put(self.input_tail,
                                             self._shard)
            self.embeds = jax.device_put(self.embeds, self._shard)
        self.active = np.zeros(max_streams, bool)

        pad = self.nfft - self.chunk
        # a slot is "primed" once its tail holds a real chunk; before
        # that its analysis window would be a bogus [zeros; chunk]
        # pre-frame that must not touch the state (a fresh stream's
        # frame 0 is [chunk_k ; chunk_{k+1}[:pad]], like the reference
        # framing at net.py:54-66)
        self.primed = np.zeros(max_streams, bool)
        self._pipeline: list = []  # in-flight outputs (throughput mode)

        def _step_core(params, embeds, state, tail, chunks, primed):
            window = jnp.concatenate([tail, chunks[..., :pad]], axis=-1)
            y, new_state = model.apply({"params": params}, window,
                                       embeds, state, method=model.step)

            def keep(new, old):
                # batch-major leaves gate on priming; global scalars
                # (ring cursor) advance. Compare against the LOCAL
                # batch (primed's leading dim) so the same body works
                # single-device and per-shard under shard_map.
                if new.ndim == 0 or new.shape[0] != primed.shape[0]:
                    return new
                m = primed.reshape((-1,) + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)
            state = jax.tree_util.tree_map(keep, new_state, state)
            y = y * primed.reshape(-1, 1, 1).astype(y.dtype)
            return y, state, chunks

        if mesh is None:
            _step = jax.jit(_step_core)
        else:
            # multi-chip serving: shard_map over the "data" axis —
            # each device runs the FULL per-shard step locally
            # (streams are independent; zero collectives), which also
            # keeps Pallas kernels valid (they see per-device shapes,
            # not GSPMD-partitioned globals)
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            def spec_of(x):
                batchy = (hasattr(x, "ndim") and x.ndim > 0
                          and x.shape[0] == max_streams)
                return P("data") if batchy else P()
            state_specs = jax.tree_util.tree_map(spec_of, self.state)
            _step = jax.jit(shard_map(
                _step_core, mesh=mesh,
                in_specs=(P(), P("data"), state_specs, P("data"),
                          P("data"), P("data")),
                out_specs=(P("data"), state_specs, P("data")),
                check_vma=False))

        @jax.jit
        def _reset(state, tail, keep):
            return _mask_tree(state, keep), _mask_tree(tail, keep)

        self._step = _step
        self._scan_step = _step  # same computation, reused under scan
        self._reset = _reset

    # -- stream management -------------------------------------------------

    def add_stream(self, slot: int, embedding: np.ndarray) -> None:
        """Claim `slot` for a new stream with its speaker d-vector.
        The slot's state is zeroed (fresh stream start)."""
        assert 0 <= slot < self.n
        keep = jnp.asarray(~self._one_hot(slot))
        self.state, self.input_tail = self._reset(
            self.state, self.input_tail, keep)
        self.embeds = self.embeds.at[slot].set(
            jnp.asarray(embedding, self.dtype))
        self.active[slot] = True
        self.primed[slot] = False

    def remove_stream(self, slot: int) -> None:
        self.active[slot] = False
        self.primed[slot] = False

    def _one_hot(self, slot: int) -> np.ndarray:
        m = np.zeros(self.n, bool)
        m[slot] = True
        return m

    # -- inference ----------------------------------------------------------

    def step(self, chunks) -> jax.Array:
        """chunks: [max_streams, n_mics, chunk] new audio (inactive
        slots: anything, their output is zeroed). Returns separated
        audio [max_streams, n_srcs, chunk] delayed by the model's
        algorithmic latency."""
        chunks = jnp.asarray(chunks, self.dtype)
        primed = jnp.asarray(self.primed & self.active)
        if self._shard is not None:
            chunks = jax.device_put(chunks, self._shard)
            primed = jax.device_put(primed, self._shard)
        y, self.state, self.input_tail = self._step(
            self.params, self.embeds, self.state, self.input_tail,
            chunks, primed)
        self.primed |= self.active
        return y

    def step_pipelined(self, chunks, depth: int = 4):
        """Throughput mode: keep up to `depth` chunks in flight.

        JAX dispatch is asynchronous — `step` already returns before
        the device finishes — but a caller that fetches every output
        immediately serializes host<->device transfers with compute.
        This call enqueues the new chunk and returns the HOST result of
        the step `depth` calls ago (None until the pipeline fills), so
        transfer of step t-depth overlaps compute of step t. Per-chunk
        latency grows by depth*step_time; throughput approaches pure
        device rate (PERF.md: ~0.15 ms/step-slot pipelined vs 1.18 ms
        single-chunk on the proxied link).
        """
        y = self.step(chunks)
        self._pipeline.append(y)
        if len(self._pipeline) > depth:
            return np.asarray(self._pipeline.pop(0))
        return None

    def drain(self):
        """Fetch every output still in flight (throughput mode tail).
        Returns a list of [max_streams, n_srcs, chunk] host arrays."""
        out = [np.asarray(y) for y in self._pipeline]
        self._pipeline.clear()
        return out

    # -- benchmarking ---------------------------------------------------------

    def benchmark(self, n_iters: int = 100, warmup: int = 20) -> dict:
        """Steady-state per-chunk latency (blocking each step on a
        host FETCH — `block_until_ready` can return early behind
        proxied device transports, see PERF.md) + derived RTF. Note
        per-step host round-trip latency is included; for pure device
        time use profiling.device_step_time or the bench.py scan."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(
            (self.n, self.n_mics, self.chunk)), self.dtype)
        for _ in range(warmup):
            y = self.step(x)
        np.asarray(y)
        lat = []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            y = self.step(x)
            np.asarray(y[0, 0, -1])  # forced fetch = true barrier
            lat.append(time.perf_counter() - t0)
        lat = np.asarray(lat)
        chunk_s = self.chunk / 16000.0
        # keys say transport-inclusive OUT LOUD: on a proxied link the
        # ~27 ms/call round trip dominates and these numbers must never
        # be quoted as device RTF (that's benchmark_device's job)
        return {
            "p50_ms_incl_transport": float(np.percentile(lat, 50) * 1e3),
            "p99_ms_incl_transport": float(np.percentile(lat, 99) * 1e3),
            "rtf_incl_transport": float(np.median(lat) / chunk_s),
            "transport_inclusive": True,
            "streams": self.n,
        }

    def benchmark_device(self, n_short: int = 100, n_long: int = 500,
                         repeats: int = 4) -> dict:
        """True DEVICE per-chunk time through the ENGINE's own step
        (active-mask + priming included, unlike bench.py which drives
        model.step directly): an on-device `lax.scan` over `_step` at
        two lengths, per-step = slope between them — the fixed
        launch/transport cost of a proxied link cancels exactly
        (PERF.md "Measurement methodology"). p50/p99 are over the
        per-repeat slope samples. BASELINE.md:32's p50-per-chunk
        metric comes from here."""
        rng = np.random.default_rng(0)
        primed = jnp.asarray(np.ones(self.n, bool))
        model = self.model

        @jax.jit
        def run(state, tail, xs):
            def f(carry, xc):
                st, tl = carry
                y, st, tl = self._scan_step(
                    self.params, self.embeds, st, tl, xc, primed)
                return (st, tl), y[:, 0, -1]
            return jax.lax.scan(f, (state, tail), xs)

        def timed(n):
            state = model.init_state(self.n, self.dtype,
                                     kv_dtype=self._kv_dtype)
            tail = jnp.zeros_like(self.input_tail)
            xs = jnp.asarray(rng.standard_normal(
                (n, self.n, self.n_mics, self.chunk)), self.dtype)
            _, ys = run(state, tail, xs)
            np.asarray(ys)
            times = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                _, ys = run(state, tail, xs)
                np.asarray(ys)
                times.append(time.perf_counter() - t0)
            return times

        ts, tl = timed(n_short), timed(n_long)
        slopes = np.asarray(
            [(b - a) / (n_long - n_short) for a, b in zip(ts, tl)])
        chunk_s = self.chunk / 16000.0
        per = float(np.min(slopes))
        return {
            "device_p50_ms": float(np.percentile(slopes, 50) * 1e3),
            "device_p99_ms": float(np.percentile(slopes, 99) * 1e3),
            "device_best_ms": per * 1e3,
            "rtf": per / chunk_s,
            "streams": self.n,
        }
