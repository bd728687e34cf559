"""Engine-level serving benchmark (VERDICT r2 #5 / BASELINE.md:32).

Unlike bench.py (which drives model.step directly), this measures the
REAL StreamingEngine step — active-mask + priming included — three
ways at the production serving config (bf16 + int8 K/V, 64 streams):

  device    : benchmark_device() — slope-measured on-device scan over
              the engine's own jitted step; p50/p99 over slope samples
  host      : benchmark() — per-chunk host round-trip latency
              (includes the proxied-transport cost; upper bound)
  pipelined : step_pipelined(depth=K) throughput — wall time for N
              chunks with K in flight / N => per-chunk throughput rate

Usage: python perf/engine_bench.py [--streams 64] [--depth 4]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

p = argparse.ArgumentParser()
p.add_argument("--streams", type=int, default=64)
p.add_argument("--depth", type=int, default=4)
p.add_argument("--n", type=int, default=400)
args = p.parse_args()

from __graft_entry__ import FLAGSHIP, _model  # noqa: E402
from lookoncetohear_tpu.serve.engine import StreamingEngine  # noqa: E402

model = _model()
nfft = FLAGSHIP["stft_chunk_size"] + FLAGSHIP["stft_pad_size"]
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, nfft)),
                    jnp.zeros((1, 1, 256)))["params"]
eng = StreamingEngine(model, params, max_streams=args.streams,
                      dtype=jnp.bfloat16, kv_dtype=jnp.int8)
rng = np.random.default_rng(0)
for s in range(args.streams):
    eng.add_stream(s, rng.standard_normal(256).astype(np.float32))

chunk_s = eng.chunk / 16000.0

rep = eng.benchmark_device()
print("device  :", {k: round(v, 4) for k, v in rep.items()}, flush=True)
print(f"          => device RTF/stream {rep['rtf']:.4f} "
      f"(target <= 0.1)", flush=True)

rep_h = eng.benchmark(n_iters=100, warmup=20)
print("host    :", {k: round(v, 4) for k, v in rep_h.items()},
      flush=True)

# pipelined throughput: N chunks, depth K in flight
x = jnp.asarray(rng.standard_normal(
    (args.streams, 2, eng.chunk)), jnp.bfloat16)
for _ in range(20):
    eng.step_pipelined(x, depth=args.depth)
eng.drain()
t0 = time.perf_counter()
for _ in range(args.n):
    eng.step_pipelined(x, depth=args.depth)
eng.drain()
dt = time.perf_counter() - t0
per = dt / args.n
print(f"pipelined(depth={args.depth}): {per * 1e3:.3f} ms/chunk "
      f"=> throughput-RTF {per / chunk_s:.4f}/stream at "
      f"{args.streams} streams", flush=True)
