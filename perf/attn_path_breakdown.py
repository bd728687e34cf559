"""Decompose the serving step's attention-path time (VERDICT r3 #1).

perf/layout_probe.py showed XLA streams the int8 ring shapes at
~400 GB/s while the in-model attention path achieves ~90-120 GB/s —
so before fusing the whole block into one Pallas kernel, isolate which
part is slow at the EXACT serving geometry (64 streams, flagship
config: B=64, nh=4, F=97, E=6, vd=16, W=50):

  row 1: one full GridNet block, t=1 streaming step (attn on)
  row 2: same block with use_attn=False        -> LSTM/norm floor
  row 3: attention section alone (projections + head norms +
         int8 ring attend + out projection), jitted standalone
  row 4: ring_attend_int8 alone (XLA dequant-in-consumer)
  row 5: ring_attend_int8 alone (fused Pallas kernel)
  row 6: projections + head norms only (no ring read)

All slope-timed (two scan lengths, forced fetch). Run rows selectively
with e.g. `python perf/attn_path_breakdown.py 1 2 3` to bound chip
time per invocation.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax

# honor JAX_PLATFORMS before backend init (env var alone does not
# override the programmatically-registered axon platform)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from lookoncetohear_tpu.models.streaming_tfgridnet import \
    GridNetBlockStreaming

B, C, F, H, NH, W = 64, 64, 97, 64, 4, 50
E, VD = 6, 16
DK, DV = F * E, F * VD
N1 = int(os.environ.get("BD_N1", 50))
N2 = int(os.environ.get("BD_N2", 250))
REP = int(os.environ.get("BD_REP", 4))
DT = jnp.bfloat16
rng = np.random.default_rng(0)


def slope(step, carry0):
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
            jax.tree_util.tree_map(np.asarray, run(carry0))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, t2 = timed(N1), timed(N2)
    return (t2 - t1) / (N2 - N1)


def report(tag, per, nbytes=None):
    eff = f"  eff {nbytes / per / 1e9:5.0f} GB/s" if nbytes else ""
    print(f"{tag:44s} {per * 1e3:7.3f} ms{eff}", flush=True)


RING_BYTES = B * NH * (W - 1) * (DK + DV)  # int8 bytes per block


def block_row(use_attn: bool, tag: str):
    blk = GridNetBlockStreaming(
        emb_dim=C, n_freqs=F, hidden=H, n_head=NH,
        approx_qk_dim=512, local_atten_len=W, use_attn=use_attn)
    x0 = jnp.asarray(rng.standard_normal((B, C, 1, F)), DT)
    st = blk.init_state(B, DT, kv_dtype=jnp.int8 if use_attn else None)
    prm = blk.init(jax.random.PRNGKey(0), x0, blk.init_state(B, DT))
    prm = jax.tree_util.tree_map(lambda a: jnp.asarray(a, DT), prm)

    def step(carry):
        x, st = carry
        y, st = blk.apply(prm, x, st)
        return (y, st)

    per = slope(step, (x0, st))
    report(tag, per, RING_BYTES if use_attn else None)
    return per


def make_qkv():
    q = jnp.asarray(rng.standard_normal((B * NH, DK)), DT)
    kt = jnp.asarray(rng.standard_normal((B * NH, DK)), DT)
    vt = jnp.asarray(rng.standard_normal((B * NH, DV)), DT)
    k8 = jnp.asarray(rng.integers(-127, 127, (B * NH, W - 1, DK)),
                     jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 127, (B * NH, W - 1, DV)),
                     jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (B * NH, W - 1)),
                     jnp.float32)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (B * NH, W - 1)),
                     jnp.float32)
    return q, kt, vt, k8, ks, v8, vs


def ring_row(pallas: bool, tag: str):
    q0, kt, vt, k8, ks, v8, vs = make_qkv()
    if pallas:
        from lookoncetohear_tpu.ops.pallas_attention import \
            attention_step_int8_pallas as fn

        def attend(q):
            return fn(q, kt, vt, k8, ks, v8, vs)
    else:
        scale = float(1.0 / np.sqrt(DK))

        def attend(q):
            s_hist = jnp.einsum("bd,bwd->bw", q, k8.astype(DT))
            s_hist = s_hist * ks.astype(DT)
            s_cur = jnp.sum(q * kt, axis=-1)
            scores = jnp.concatenate([s_hist, s_cur[:, None]], 1) * scale
            attn = jax.nn.softmax(scores, axis=-1)
            w_hist = attn[:, :-1] * vs.astype(DT)
            out = jnp.einsum("bw,bwd->bd", w_hist, v8.astype(DT))
            return out + attn[:, -1:] * vt

    def step(q):
        return q + attend(q)[:, :DK] * 1e-9

    per = slope(step, q0)
    report(tag, per, RING_BYTES)


def attn_section_row():
    """Projections + per-head norms + int8 ring + out-proj, exactly
    the model's t==1 attention section, without LSTMs around it."""
    blk = GridNetBlockStreaming(
        emb_dim=C, n_freqs=F, hidden=H, n_head=NH,
        approx_qk_dim=512, local_atten_len=W, use_attn=True)
    x0 = jnp.asarray(rng.standard_normal((B, C, 1, F)), DT)
    st = blk.init_state(B, DT, kv_dtype=jnp.int8)
    prm = blk.init(jax.random.PRNGKey(0), x0, blk.init_state(B, DT))
    prm = jax.tree_util.tree_map(lambda a: jnp.asarray(a, DT), prm)

    def section(z, state):
        return blk.apply(prm, z, state,
                         method=blk.attention_section)

    def step(carry):
        z, st = carry
        out, st = section(z, st)
        return (z + out * 1e-9, st)

    z0 = jnp.asarray(rng.standard_normal((B, 1, F, C)), DT)
    per = slope(step, (z0, st))
    report("attention section (proj+norm+ring+out)", per, RING_BYTES)


def proj_row():
    """QKV projections + PReLU + per-head LayerNorms + output
    projection, zero ring read: the non-ring half of the section."""
    blk = GridNetBlockStreaming(
        emb_dim=C, n_freqs=F, hidden=H, n_head=NH,
        approx_qk_dim=512, local_atten_len=W, use_attn=True)
    x0 = jnp.asarray(rng.standard_normal((B, C, 1, F)), DT)
    prm = blk.init(jax.random.PRNGKey(0), x0, blk.init_state(B, DT))
    prm = jax.tree_util.tree_map(lambda a: jnp.asarray(a, DT), prm)

    def step(z):
        q, k, v = blk.apply(prm, z, method=blk.project_qkv)
        # stand-in for the ring result: v's own current frame
        out = v.reshape(B, NH, 1, F, VD)
        out = out.transpose(0, 2, 3, 1, 4).reshape(B, 1, F, NH * VD)
        p = blk.apply(prm, out, method=blk.output_projection)
        return z + p * 1e-9 + q.sum() * 0 + k.sum() * 0

    z0 = jnp.asarray(rng.standard_normal((B, 1, F, C)), DT)
    per = slope(step, z0)
    report("projections + norms only (no ring)", per)


def native_row(pallas: bool, tag: str):
    """v2 projection-native int8 W-slot write-first ring (incl.
    quantize + slot write) at the serving shape."""
    import os
    dk, dvv = F * NH * E, F * NH * VD
    q0 = jnp.asarray(rng.standard_normal((B, dk)), DT)
    kt = jnp.asarray(rng.standard_normal((B, dk)), DT)
    vt = jnp.asarray(rng.standard_normal((B, dvv)), DT)
    k8 = jnp.asarray(rng.integers(-127, 128, (B, W, dk)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (B, W, dvv)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (B, W, NH)),
                     jnp.float32)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (B, W, NH)),
                     jnp.float32)
    from lookoncetohear_tpu.ops.attention import ring_attend_int8_native
    if not pallas:
        os.environ["LOOKONCE_NO_PALLAS"] = "1"
    try:
        def step(carry):
            q, kb, ksc, vb, vsc, pos = carry
            out, kb, ksc, vb, vsc, pos = ring_attend_int8_native(
                q, kt, vt, kb, ksc, vb, vsc, pos, f=F, n_head=NH)
            return (q + out[:, :dk] * 1e-9, kb, ksc, vb, vsc, pos)

        per = slope(step, (q0, k8, ks, v8, vs,
                           jnp.zeros((), jnp.int32)))
        report(tag, per, RING_BYTES)
    finally:
        os.environ.pop("LOOKONCE_NO_PALLAS", None)


def tune_sweep():
    """Sweep the fused v2 kernel's blocking knobs."""
    import os
    for bb in (8, 16, 32):
        for wc in (7, 49):
            os.environ["LOOKONCE_ATTN_BLOCK_ROWS"] = str(bb)
            os.environ["LOOKONCE_ATTN_WCHUNK"] = str(wc)
            try:
                native_row(True, f"v2 fused bb={bb} wc={wc}")
            except Exception as e:  # VMEM overflow etc. — keep going
                print(f"v2 fused bb={bb} wc={wc}: {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
    os.environ.pop("LOOKONCE_ATTN_BLOCK_ROWS", None)
    os.environ.pop("LOOKONCE_ATTN_WCHUNK", None)


ROWS = {
    "1": lambda: block_row(True, "full block t=1 (attn on, int8)"),
    "2": lambda: block_row(False, "block t=1, use_attn=False"),
    "3": attn_section_row,
    "4": lambda: ring_row(False, "ring_attend_int8 v1 XLA dequant"),
    "5": lambda: ring_row(True, "ring_attend_int8 v1 Pallas fused"),
    "6": proj_row,
    "7": lambda: native_row(False, "v2 native int8 XLA (ring+write)"),
    "8": lambda: native_row(True, "v2 native int8 fused Pallas"),
    "9": tune_sweep,
}

if __name__ == "__main__":
    sel = sys.argv[1:] or list(ROWS)
    for s in sel:
        ROWS[s]()
