"""Pallas int8 attention kernel vs XLA dequantize-in-consumer, at the
exact serving shape (64 streams x 4 heads, W=50). Slope-timed.

Motivated by perf/layout_probe.py: XLA's int8->bf16 einsum streams
~400 GB/s on this chip — far above the ~90 GB/s the in-model
attention achieves — so the fused kernel may be the limiter.
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
# honor JAX_PLATFORMS before backend init (the env var alone does not
# override the programmatically-registered axon platform)
import os as _os
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])


B, W1, DK, DV = 256, 49, 582, 1552
N1, N2, REP = 50, 250, 4
rng = np.random.default_rng(0)
dt = jnp.bfloat16

k8 = jnp.asarray(rng.integers(-127, 127, (B, W1, DK)), jnp.int8)
v8 = jnp.asarray(rng.integers(-127, 127, (B, W1, DV)), jnp.int8)
ks = jnp.asarray(rng.uniform(0.001, 0.02, (B, W1)), jnp.float32)
vs = jnp.asarray(rng.uniform(0.001, 0.02, (B, W1)), jnp.float32)
kt = jnp.asarray(rng.standard_normal((B, DK)), dt)
vt = jnp.asarray(rng.standard_normal((B, DV)), dt)
scale = float(1.0 / np.sqrt(DK))
NB = B * W1 * (DK + DV)


def slope(step, q0):
    def timed(n):
        @jax.jit
        def run(q):
            return jax.lax.scan(lambda q, _: (step(q), None), q,
                                None, length=n)[0]
        np.asarray(run(q0))
        best = float("inf")
        for _ in range(REP):
            t0 = time.perf_counter()
            np.asarray(run(q0))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, t2 = timed(N1), timed(N2)
    return (t2 - t1) / (N2 - N1)


def xla_step(q):
    s_hist = jnp.einsum("bd,bwd->bw", q, k8.astype(dt))
    s_hist = s_hist * ks.astype(dt)
    s_cur = jnp.sum(q * kt, axis=-1)
    scores = jnp.concatenate([s_hist, s_cur[:, None]], 1) * scale
    attn = jax.nn.softmax(scores, axis=-1)
    w_hist = attn[:, :-1] * vs.astype(dt)
    out = jnp.einsum("bw,bwd->bd", w_hist, v8.astype(dt))
    out = out + attn[:, -1:] * vt
    return q + out[:, :DK] * 1e-9


def pallas_step(q):
    from lookoncetohear_tpu.ops.pallas_attention import \
        attention_step_int8_pallas
    out = attention_step_int8_pallas(q, kt, vt, k8, ks, v8, vs)
    return q + out[:, :DK] * 1e-9


for tag, fn in [("XLA dequant-in-consumer", xla_step),
                ("Pallas fused kernel", pallas_step)]:
    per = slope(fn, kt)
    print(f"{tag:26s} {per*1e3:7.3f} ms/call  eff {NB/per/1e9:5.0f}"
          f" GB/s", flush=True)
