"""Ablation breakdown of the bf16 serving step (scan-timed, forced fetch)."""
import os, time, json, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")
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

def time_model(tag, **overrides):
    cfg = dict(FLAGSHIP); cfg.update(overrides)
    model = Net(**cfg)
    nfft = cfg["stft_chunk_size"] + cfg["stft_pad_size"]
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,2,nfft)),
                        jnp.zeros((1,1,256)))["params"]
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dt), params)
    emb = jnp.zeros((N,256), dt)
    state = model.init_state(N, dtype=dt)
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
    print(f"{tag:28s} {best*1e3:7.3f} ms/step  RTF {best/0.008:.3f}")
    return best

time_model("full (B=3, attn)")
time_model("no attention", use_attn=False)
time_model("1 block + attn", B=1)
time_model("2 blocks + attn", B=2)
