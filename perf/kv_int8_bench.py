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

N, STEPS, REPEATS = 64, 40, 3
dt = jnp.bfloat16

def run_rtf(kv_dtype, tag):
    model = Net(**FLAGSHIP)
    nfft = FLAGSHIP["stft_chunk_size"] + FLAGSHIP["stft_pad_size"]
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,2,nfft)),
                        jnp.zeros((1,1,256)))["params"]
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dt), params)
    emb = jnp.zeros((N,256), dt)
    state = model.init_state(N, dtype=dt, kv_dtype=kv_dtype)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((STEPS,N,2,nfft)), dt)
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
        best = min(best, (time.perf_counter()-t0)/STEPS)
    print(f"{tag:20s} {best*1e3:7.3f} ms/step  RTF {best/0.008:.3f}")

run_rtf(None, "bf16 K/V")
run_rtf(jnp.int8, "int8 K/V")
