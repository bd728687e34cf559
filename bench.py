"""Streaming benchmark: real-time factor of the flagship separator.

Runs N concurrent binaural streams as the leading batch dimension of
the 8 ms stream step (chunk 128 + 64-sample lookahead @ 16 kHz,
configs/tsh.json geometry) in the production serving config: bf16
params/activations (measured 0.05 dB SI-SNRi cost) + int8 K/V ring
buffers with per-slot scales (measured <0.08 rel-err vs f32 state,
tests/test_serve.py::TestInt8KV) — see PERF.md for the quality
studies.

DEVICE time per step is measured by the SLOPE method: two on-device
`lax.scan` lengths with forced host fetches, per-step time =
(T(n2) - T(n1)) / (n2 - n1). This cancels the fixed per-call
launch+transport cost (~27 ms on proxied transports, which would
inflate a 40-step scan by ~0.68 ms/step) and never trusts
`block_until_ready` alone (unreliable here — PERF.md "Measurement
methodology"). Prints ONE JSON line:

  {"metric": "streaming_rtf_64", "value": <RTF per stream>,
   "unit": "xRT", "vs_baseline": <0.1 / RTF>}

vs_baseline > 1 means the north-star target (RTF < 0.1/stream at 64
concurrent streams, /root/repo/BASELINE.md) is beaten by that factor.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


N_STREAMS = 64
CHUNK = 128
STEPS_SHORT = 100
STEPS_LONG = 500
REPEATS = 4


def main() -> None:
    from __graft_entry__ import FLAGSHIP, _model

    model = _model()
    nfft = FLAGSHIP["stft_chunk_size"] + FLAGSHIP["stft_pad_size"]
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, nfft)),
                        jnp.zeros((1, 1, 256)))["params"]
    dt = jnp.bfloat16
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dt),
                                    params)
    emb = jnp.zeros((N_STREAMS, 256), dt)
    rng = np.random.default_rng(0)

    def timed(steps: int) -> float:
        state = model.init_state(N_STREAMS, dtype=dt,
                                 kv_dtype=jnp.int8)
        xs = jnp.asarray(rng.standard_normal(
            (steps, N_STREAMS, 2, nfft)), dt)

        @jax.jit
        def run(state, xs):
            def f(s, xc):
                y, s = model.apply({"params": params}, xc, emb, s,
                                   method=model.step)
                return s, y[:, :, -1]
            return jax.lax.scan(f, state, xs)

        st, ys = run(state, xs)
        np.asarray(ys)  # forced fetch = true completion barrier
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            st, ys = run(state, xs)
            np.asarray(ys)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(STEPS_SHORT)
    t2 = timed(STEPS_LONG)
    per_step = (t2 - t1) / (STEPS_LONG - STEPS_SHORT)

    chunk_s = CHUNK / 16000.0
    rtf = per_step / chunk_s
    target = 0.1
    print(json.dumps({
        "metric": f"streaming_rtf_{N_STREAMS}",
        "value": round(rtf, 5),
        "unit": "xRT",
        "vs_baseline": round(target / rtf, 3),
    }))


if __name__ == "__main__":
    main()
