"""Streaming benchmark: real-time factor of the flagship separator.

Runs N concurrent binaural streams as the leading batch dimension of
one jitted 8 ms stream step (chunk 128 + 64-sample lookahead @ 16 kHz,
configs/tsh.json geometry), measures steady-state per-chunk latency,
and prints ONE JSON line:

  {"metric": "streaming_rtf_64", "value": <RTF per stream>,
   "unit": "xRT", "vs_baseline": <0.1 / RTF>}

vs_baseline > 1 means the north-star target (RTF < 0.1/stream at 64
concurrent streams, /root/repo/BASELINE.md) is beaten by that factor.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


N_STREAMS = 64
CHUNK = 128
WARMUP = 20
ITERS = 100


def main() -> None:
    from __graft_entry__ import FLAGSHIP, _model

    model = _model()
    nfft = FLAGSHIP["stft_chunk_size"] + FLAGSHIP["stft_pad_size"]
    x0 = jnp.zeros((N_STREAMS, 2, nfft), jnp.float32)
    emb = jnp.zeros((N_STREAMS, 256), jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, nfft)),
                        jnp.zeros((1, 1, 256)))["params"]
    state = model.init_state(N_STREAMS)

    @jax.jit
    def step(params, x, emb, state):
        return model.apply({"params": params}, x, emb, state,
                           method=model.step)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(x0.shape), jnp.float32)

    # compile + warmup
    y, state = step(params, x, emb, state)
    jax.block_until_ready(y)
    for _ in range(WARMUP):
        y, state = step(params, x, emb, state)
    jax.block_until_ready(y)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        y, state = step(params, x, emb, state)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / ITERS

    chunk_s = CHUNK / 16000.0  # 8 ms of audio consumed per step
    rtf = dt / chunk_s  # whole-batch RTF == per-stream RTF (parallel)
    target = 0.1
    print(json.dumps({
        "metric": f"streaming_rtf_{N_STREAMS}",
        "value": round(rtf, 5),
        "unit": "xRT",
        "vs_baseline": round(target / rtf, 3),
    }))


if __name__ == "__main__":
    main()
