import os, time, sys, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
# honor JAX_PLATFORMS before backend init (the env var alone does not
# override the programmatically-registered axon platform)
import os as _os
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from lookoncetohear_tpu.ops.pallas_lstm import _bilstm_kernel

F, H, N = 97, 64, 64
N1, N2, REP = 50, 250, 5

def variant(bb, in_dtype):
    def call(xp, w_hh):
        t_len, _, b, g4 = xp.shape
        return pl.pallas_call(
            functools.partial(_bilstm_kernel, t_len=t_len, hidden=H),
            grid=(b // bb,),
            in_specs=[
                pl.BlockSpec((t_len, 2, bb, g4), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, H, g4), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((t_len, 2, bb, H), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t_len, 2, b, H), jnp.float32),
        )(xp.astype(in_dtype), w_hh.astype(in_dtype))
    return call

rng = np.random.default_rng(0)
w_hh = jnp.asarray(rng.standard_normal((2, H, 4*H)), jnp.float32)
xp0 = jnp.asarray(rng.standard_normal((F, 2, N, 4*H)), jnp.float32)

def measure(tag, bb, in_dtype):
    call = variant(bb, in_dtype)
    def timed(steps):
        @jax.jit
        def run(xp):
            def f(xp, _):
                y = call(xp, w_hh)       # 3 chained calls like 3 blocks
                y2 = call(jnp.pad(y, ((0,0),(0,0),(0,0),(0,3*H))), w_hh)
                y3 = call(jnp.pad(y2, ((0,0),(0,0),(0,0),(0,3*H))), w_hh)
                nxt = xp0 + jnp.pad(y3, ((0,0),(0,0),(0,0),(0,3*H)))
                return nxt, y3[-1, 0, 0, 0]
            return jax.lax.scan(f, xp, None, length=steps)
        xp, ys = run(xp0); np.asarray(ys)
        best = float("inf")
        for _ in range(REP):
            t0=time.perf_counter(); xp, ys = run(xp0); np.asarray(ys)
            best = min(best, time.perf_counter()-t0)
        return best
    try:
        t1, t2 = timed(N1), timed(N2)
        print(f"{tag:24s} {(t2-t1)/(N2-N1)*1e3:7.3f} ms per 3-call step", flush=True)
    except Exception as e:
        print(f"{tag:24s} FAILED: {str(e)[:120]}", flush=True)

measure("bb=16 f32 (current)", 16, jnp.float32)
measure("bb=32 f32", 32, jnp.float32)
measure("bb=64 f32", 64, jnp.float32)
measure("bb=64 bf16-in", 64, jnp.bfloat16)
