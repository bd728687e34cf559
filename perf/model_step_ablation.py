"""Slope-timed ablation of the full serving step (round 3).

perf/attn_path_breakdown.py puts one GridNet block at 0.253 ms
(attn 0.165 + LSTM floor 0.092) at the serving geometry, predicting
~0.85 ms/step for the full model — but bench.py measures 1.29 ms.
This script slope-times the FULL model.step under ablations to locate
the extra ~0.5 ms: block count, attention on/off, K/V dtype.

Run rows selectively: python perf/model_step_ablation.py full noattn b1
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from lookoncetohear_tpu.models.net import Net
from __graft_entry__ import FLAGSHIP

N = int(os.environ.get("AB_N", 64))
N1 = int(os.environ.get("AB_N1", 100))
N2 = int(os.environ.get("AB_N2", 500))
REP = int(os.environ.get("AB_REP", 4))
DT = jnp.bfloat16


def row(tag, kv_dtype=jnp.int8, **overrides):
    cfg = dict(FLAGSHIP)
    cfg.update(overrides)
    model = Net(**cfg)
    nfft = cfg["stft_chunk_size"] + cfg["stft_pad_size"]
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, nfft)),
                        jnp.zeros((1, 1, 256)))["params"]
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, DT),
                                    params)
    emb = jnp.zeros((N, 256), DT)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((N, 2, nfft)), DT)

    def timed(n):
        state = model.init_state(N, dtype=DT, kv_dtype=kv_dtype)

        @jax.jit
        def run(state):
            def f(s, _):
                y, s = model.apply({"params": params}, x0, emb, s,
                                   method=model.step)
                return s, y[:, 0, -1]
            return jax.lax.scan(f, state, None, length=n)

        st, ys = run(state)
        np.asarray(ys)
        best = float("inf")
        for _ in range(REP):
            t0 = time.perf_counter()
            st, ys = run(state)
            np.asarray(ys)
            best = min(best, time.perf_counter() - t0)
        return best

    per = (timed(N2) - timed(N1)) / (N2 - N1)
    print(f"{tag:36s} {per * 1e3:7.3f} ms/step  RTF {per / 0.008:.3f}",
          flush=True)


ROWS = {
    "full": lambda: row("full (3 blocks, attn, int8 kv)"),
    "bf16kv": lambda: row("full (3 blocks, attn, bf16 kv)",
                          kv_dtype=None),
    "noattn": lambda: row("no attention", use_attn=False,
                          kv_dtype=None),
    "b1": lambda: row("1 block + attn, int8 kv", B=1),
    "b2": lambda: row("2 blocks + attn, int8 kv", B=2),
}

if __name__ == "__main__":
    sel = sys.argv[1:] or ["full", "noattn", "b1"]
    for s in sel:
        ROWS[s]()
