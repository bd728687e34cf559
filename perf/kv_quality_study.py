"""Serving-precision quality study on a TRAINED checkpoint.

Streams the held-out synthetic test split through the REAL serving
path (serve/engine.StreamingEngine, 8 ms chunks) under each serving
config and reports mean SI-SNRi:

  f32 everything          — reference quality
  bf16 params/activations — round-1 study (0.049 dB cost)
  bf16 + int8 K/V ring    — round-2 serving config (bench.py)

Usage: python perf/kv_quality_study.py --run_dir runs/tsh_r2 \
           --config /tmp/tsh_r2.json [--n 64]
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax
# honor JAX_PLATFORMS before backend init (the env var alone does not
# override the programmatically-registered axon platform)
import os as _os
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def si_snr(est, ref, eps=1e-9):
    est = est - est.mean(-1, keepdims=True)
    ref = ref - ref.mean(-1, keepdims=True)
    a = (est * ref).sum(-1, keepdims=True) / \
        ((ref * ref).sum(-1, keepdims=True) + eps)
    proj = a * ref
    noise = est - proj
    return 10 * np.log10((proj ** 2).sum(-1)
                         / ((noise ** 2).sum(-1) + eps))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--run_dir", required=True)
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args()

    from lookoncetohear_tpu import utils
    from lookoncetohear_tpu.data.loader import collate
    from lookoncetohear_tpu.serve.engine import StreamingEngine
    from lookoncetohear_tpu.train.checkpoint import restore

    cfg = utils.Params(args.config)
    task = utils.import_attr(cfg.pl_module)(**cfg.pl_module_args)
    model = task.model
    ds = utils.import_attr(cfg.test_dataset)(**cfg.test_data_args)

    ckpt = os.path.join(args.run_dir, "best.ckpt")
    params = restore(ckpt)["params"]
    chunk = cfg.pl_module_args["model_params"]["stft_chunk_size"]

    def run_split(dtype, kv_dtype):
        scores = []
        for i0 in range(0, args.n, args.batch):
            idx = list(range(i0, min(i0 + args.batch, args.n)))
            inputs, targets = collate([ds[i] for i in idx])
            mix = np.asarray(inputs["mixture"], np.float32)
            tgt = np.asarray(targets["target"], np.float32)
            emb = np.asarray(targets["embedding_gt"][:, 0], np.float32)
            b = mix.shape[0]

            eng = StreamingEngine(model, params, max_streams=b,
                                  dtype=dtype, kv_dtype=kv_dtype)
            for s in range(b):
                eng.add_stream(s, emb[s])
            n = mix.shape[-1] - mix.shape[-1] % chunk
            outs = []
            for i in range(n // chunk):
                y = eng.step(mix[:, :, i * chunk:(i + 1) * chunk])
                outs.append(np.asarray(y, np.float32))
            est = np.concatenate(outs, axis=-1)
            # engine output lags one chunk (algorithmic latency)
            est = est[:, :, chunk:]
            t_al = tgt[:, :, : est.shape[-1]]
            m_al = mix[:, :, : est.shape[-1]]
            si = si_snr(est, t_al).mean(-1)
            si_in = si_snr(m_al, t_al).mean(-1)
            scores.extend((si - si_in).tolist())
        return float(np.mean(scores))

    rows = [
        ("f32 / f32 K/V", jnp.float32, None),
        ("bf16 / bf16 K/V", jnp.bfloat16, None),
        ("bf16 / int8 K/V", jnp.bfloat16, jnp.int8),
    ]
    print(f"{args.n} test scenes, streaming-engine path:")
    for tag, dt, kv in rows:
        v = run_split(dt, kv)
        print(f"  {tag:18s} SI-SNRi {v:7.3f} dB")


if __name__ == "__main__":
    main()
