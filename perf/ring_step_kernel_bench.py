"""Slope-time the v2 int8 ring STEP kernel variants at the serving
geometry (64 streams, flagship config: F=97, nh=4, E=6, VD=16,
W=50 -> WP=56): the shipped elementwise+segment-dot form vs the
batched-bf16-MXU-dot form (mxu_dot), across block_rows. The ring is
carried through a lax.scan exactly like the serving engine so the
in-scan carry layout (the thing the kernel design exists to pin) is
part of what's measured.

  python perf/ring_step_kernel_bench.py            # both variants
  python perf/ring_step_kernel_bench.py mxu        # just mxu_dot
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

from lookoncetohear_tpu.ops.pallas_attention import \
    ring_attend_int8_step_pallas

B, F, NH, E, VD, W = 64, 97, 4, 6, 16, 50
WP = ((W + 7) // 8) * 8
DK, DV = F * NH * E, F * NH * VD
N1 = int(os.environ.get("RB_N1", 50))
N2 = int(os.environ.get("RB_N2", 250))
REP = int(os.environ.get("RB_REP", 4))
DT = jnp.bfloat16

rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.standard_normal((B, DK)), DT)
kt0 = jnp.asarray(rng.standard_normal((B, DK)), DT)
vt0 = jnp.asarray(rng.standard_normal((B, DV)), DT)
carry0 = dict(
    kb=jnp.asarray(rng.integers(-127, 128, (B, WP, DK)), jnp.int8),
    ks=jnp.asarray(rng.uniform(1e-3, 2e-2, (B, WP, NH)), jnp.float32),
    vb=jnp.asarray(rng.integers(-127, 128, (B, WP, DV)), jnp.int8),
    vs=jnp.asarray(rng.uniform(1e-3, 2e-2, (B, WP, NH)), jnp.float32),
    pos=jnp.asarray(0, jnp.int32),
    x=q0.astype(jnp.float32),
)


def measure(tag, block_rows, mxu_dot):
    def step(c):
        qt = (c["x"] * 0.999).astype(DT)
        out, nkb, nks, nvb, nvs, npos = ring_attend_int8_step_pallas(
            qt, qt, vt0, c["kb"], c["ks"], c["vb"], c["vs"], c["pos"],
            f=F, n_head=NH, w_real=W, block_rows=block_rows,
            mxu_dot=mxu_dot)
        return dict(kb=nkb, ks=nks, vb=nvb, vs=nvs, pos=npos,
                    x=c["x"] + out[:, :DK].astype(jnp.float32) * 1e-6)

    def timed(n):
        @jax.jit
        def run(c):
            return jax.lax.scan(lambda c, _: (step(c), None), c,
                                None, length=n)[0]
        c = run(carry0)
        jax.tree_util.tree_map(np.asarray, c)
        best = float("inf")
        for _ in range(REP):
            t0 = time.perf_counter()
            c = run(carry0)
            jax.tree_util.tree_map(np.asarray, c)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(N1), timed(N2)
    per = (t2 - t1) / (N2 - N1)
    gbs = B * WP * (DK + DV) / per / 1e9
    print(f"{tag:34s} {per*1e3:7.3f} ms/step  ring-read "
          f"{gbs:5.0f} GB/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["base", "mxu"]
    for br in (16, 32, 64):
        if "base" in which:
            measure(f"elementwise+segdot  br={br}", br, False)
        if "mxu" in which:
            measure(f"mxu_dot batched     br={br}", br, True)
