"""Probe: HBM read efficiency of the K/V ring-buffer layouts.

Theory (PERF.md round 2): the attention step's ~120 GB/s wall is
partly TILING PADDING. An int8 [B, 49, 582] buffer is stored in
(32, 128) tiles over the last two dims -> (64, 640) padded = 1.436x
the logical bytes; a flattened [B*49, 582] 2D layout pads only the
lane dim (582 -> 640, 1.10x) because B*49 = 12544 is sublane-exact.

Measures a q.k-style read-reduce over each layout with slope-method
timing. If 2D reads materially faster, the ring buffer state should
store K/V flattened.
"""
import os, sys, time, functools

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


def slope(make_step, carry0):
    def timed(n):
        @jax.jit
        def run(c):
            return jax.lax.scan(lambda c, _: (make_step(c), None),
                                c, None, length=n)[0]
        c = run(carry0); np.asarray(c)
        best = float("inf")
        for _ in range(REP):
            t0 = time.perf_counter()
            np.asarray(run(carry0))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, t2 = timed(N1), timed(N2)
    return (t2 - t1) / (N2 - N1)


def report(tag, per, nbytes):
    print(f"{tag:34s} {per*1e3:7.3f} ms  {nbytes/per/1e9:6.0f} GB/s",
          flush=True)


# --- 3D layout (current): [B, W1, DK] + [B, W1, DV] ---------------------
k3 = jnp.asarray(rng.integers(-127, 127, (B, W1, DK)), jnp.int8)
v3 = jnp.asarray(rng.integers(-127, 127, (B, W1, DV)), jnp.int8)
q = jnp.asarray(rng.standard_normal((B, DK)), jnp.bfloat16)

def step3(acc):
    qq = q + acc * 1e-9  # carry-dependent: defeats loop-invariant CSE
    s = jnp.einsum("bd,bwd->bw", qq, k3.astype(jnp.bfloat16))
    o = jnp.einsum("bw,bwd->bd", jax.nn.softmax(s, -1),
                   v3.astype(jnp.bfloat16))
    return acc + o[:, :DK] * 1e-6

per = slope(step3, jnp.zeros((B, DK), jnp.bfloat16))
report("3D [B,49,D] einsum", per, B * W1 * (DK + DV))

# --- 2D layout: [B*W1, DK] / [B*W1, DV] --------------------------------
k2 = k3.reshape(B * W1, DK)
v2 = v3.reshape(B * W1, DV)
qe = jnp.repeat(q, W1, axis=0)  # [B*W1, DK] (precomputed per step)

def step2(acc):
    qq = jnp.repeat(q + acc * 1e-9, W1, axis=0)
    rows = jnp.sum(k2.astype(jnp.bfloat16) * qq, axis=-1)  # [B*W1]
    s = rows.reshape(B, W1)
    w = jax.nn.softmax(s, -1).reshape(B * W1, 1)
    o = (w * v2.astype(jnp.bfloat16)).reshape(B, W1, DV).sum(1)
    return acc + o[:, :DK] * 1e-6

per = slope(step2, jnp.zeros((B, DK), jnp.bfloat16))
report("2D [B*49,D] mul-reduce", per, B * W1 * (DK + DV))

# --- pure read floor: elementwise pass over the same bytes -------------
big2 = jnp.asarray(rng.integers(-127, 127,
                                (B * W1, DK + DV)), jnp.int8)

def stepr(acc):
    return acc * 0.999 + (big2.astype(jnp.bfloat16)
                          + acc[None, :] * 1e-9).sum(0) * 1e-6

per = slope(stepr, jnp.zeros((DK + DV,), jnp.bfloat16))
report("2D pure read-reduce", per, B * W1 * (DK + DV))

big3 = jnp.asarray(rng.integers(-127, 127,
                                (B, W1, DK + DV)), jnp.int8)

def stepr3(acc):
    return acc * 0.999 + (big3.astype(jnp.bfloat16)
                          + acc[None, None, :] * 1e-9).sum((0, 1)) * 1e-6

per = slope(stepr3, jnp.zeros((DK + DV,), jnp.bfloat16))
report("3D pure read-reduce", per, B * W1 * (DK + DV))
