import os, time, sys, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
# honor JAX_PLATFORMS before backend init (the env var alone does not
# override the programmatically-registered axon platform)
import os as _os
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

sys.path.insert(0, "/root/repo")
from lookoncetohear_tpu.ops.pallas_lstm import bilstm_scan_pallas

N, STEPS, REPEATS = 64, 40, 3
dt = jnp.bfloat16
F, H, C = 97, 64, 64

def timed(tag, run, *args):
    st, ys = run(*args); np.asarray(ys)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter(); st, ys = run(*args); np.asarray(ys)
        best = min(best, (time.perf_counter()-t0)/STEPS)
    print(f"{tag:32s} {best*1e3:7.3f} ms/step")

# 3x intra BiLSTM (pallas) per step, shapes as in the serving step
rng = np.random.default_rng(0)
w_hh = jnp.asarray(rng.standard_normal((2, H, 4*H)), jnp.float32)
xs = jnp.asarray(rng.standard_normal((STEPS, F, 2, N, 4*H)), jnp.float32)
@jax.jit
def run_lstm(c, xs):
    def f(c, xp):
        y, _ = bilstm_scan_pallas(xp, w_hh)
        for _ in range(2):
            y, _ = bilstm_scan_pallas(xp + y[:, :, :, :1]*0 + jnp.pad(y, ((0,0),(0,0),(0,0),(0, 3*H))), w_hh)
        return c, y[-1, 0, :, 0]
    return jax.lax.scan(f, c, xs)
timed("3x pallas BiLSTM (F=97)", run_lstm, jnp.zeros((N,)), xs)

# 3x inter single LSTM step: [B*F, C] matmuls
from lookoncetohear_tpu.ops.lstm import lstm_step, LSTMParams
p = LSTMParams(*(jnp.asarray(rng.standard_normal(s), dt) for s in
                 [(4*H, C), (4*H, H), (4*H,), (4*H,)]))
xs2 = jnp.asarray(rng.standard_normal((STEPS, N*F, C)), dt)
@jax.jit
def run_inter(carry, xs):
    def f(carry, xt):
        h, c = carry
        for _ in range(3):
            h, c = lstm_step(p, xt, h, c)
        return (h, c), h[:, 0]
    return jax.lax.scan(f, carry, xs)
timed("3x inter LSTM step", run_inter,
      (jnp.zeros((N*F, H), dt), jnp.zeros((N*F, H), dt)), xs2)

# an empty-ish scan to measure scan/dispatch floor
@jax.jit
def run_empty(c, xs):
    def f(c, xt):
        return c + jnp.sum(xt), c
    return jax.lax.scan(f, c, xs[:, :8, 0, 0, :8])
timed("near-empty scan", run_empty, jnp.zeros((), jnp.float32), xs)
