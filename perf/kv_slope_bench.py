"""Slope-method RTF: device time/step = (T(n2) - T(n1)) / (n2 - n1),
eliminating the ~28 ms fixed launch+fetch cost of the proxied
transport."""
import os, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
# honor JAX_PLATFORMS before backend init (the env var alone does not
# override the programmatically-registered axon platform)
import os as _os
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

sys.path.insert(0, "/root/repo")
from lookoncetohear_tpu.models.net import Net
from __graft_entry__ import FLAGSHIP

N = 64
N1, N2, REPEATS = 100, 500, 5
dt = jnp.bfloat16

def measure(kv_dtype, tag, use_attn=True):
    cfg = dict(FLAGSHIP)
    if not use_attn: cfg["use_attn"] = False
    model = Net(**cfg)
    nfft = cfg["stft_chunk_size"] + cfg["stft_pad_size"]
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,2,nfft)),
                        jnp.zeros((1,1,256)))["params"]
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dt), params)
    emb = jnp.zeros((N,256), dt)
    rng = np.random.default_rng(0)
    def timed(steps):
        state = model.init_state(N, dtype=dt, kv_dtype=kv_dtype)
        xs = jnp.asarray(rng.standard_normal((steps,N,2,nfft)), dt)
        @jax.jit
        def run(state, xs):
            def f(s, xc):
                y, s = model.apply({"params": params}, xc, emb, s, method=model.step)
                return s, y[:,:,-1]
            return jax.lax.scan(f, state, xs)
        st, ys = run(state, xs); np.asarray(ys)
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter(); st, ys = run(state, xs); np.asarray(ys)
            best = min(best, time.perf_counter()-t0)
        return best
    t1, t2 = timed(N1), timed(N2)
    per = (t2 - t1) / (N2 - N1)
    print(f"{tag:24s} {per*1e3:7.3f} ms/step  RTF {per/0.008:.4f}   (fixed {1e3*(t1-per*N1):.1f} ms)")

measure(None, "bf16 K/V")
measure(jnp.int8, "int8 K/V")
measure(None, "no attention", use_attn=False)
