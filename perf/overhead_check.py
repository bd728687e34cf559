import os, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
# honor JAX_PLATFORMS before backend init (the env var alone does not
# override the programmatically-registered axon platform)
import os as _os
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])


for steps in (40, 200, 800):
    xs = jnp.zeros((steps, 8, 8))
    @jax.jit
    def run(c, xs):
        def f(c, xt):
            return c + jnp.sum(xt), c
        return jax.lax.scan(f, c, xs)
    c, ys = run(jnp.zeros(()), xs); np.asarray(ys)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter(); c, ys = run(jnp.zeros(()), xs); np.asarray(ys)
        best = min(best, time.perf_counter()-t0)
    print(f"steps={steps:4d} total={best*1e3:7.2f} ms  per-step={best/steps*1e6:7.1f} us")
