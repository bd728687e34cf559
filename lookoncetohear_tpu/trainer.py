"""CLI entry point: `python -m lookoncetohear_tpu.trainer --config
configs/tsh.json --run_dir runs/tsh [--test|--resume|--ckpt|--frac]` —
flag-compatible with reference src/trainer.py:107-132."""

from __future__ import annotations

import argparse
import logging
import os

from lookoncetohear_tpu import utils
from lookoncetohear_tpu.train.trainer import main


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True,
                   help="experiment config JSON")
    p.add_argument("--run_dir", type=str, required=True)
    p.add_argument("--test", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--frac", type=float, default=1.0,
                   help="fraction of batches per epoch (smoke runs)")
    p.add_argument("--epochs", type=int, default=None,
                   help="override the config's epoch count (time-boxed "
                        "runs); the config file is not modified")
    p.add_argument("--prerender", type=str, default=None,
                   help="directory for a render-ahead on-disk cache: "
                        "each split is materialized once (process "
                        "pool), epochs then read mmap'd npz shards — "
                        "makes training compute-bound (PERF.md). Also "
                        "settable as config key 'prerender_dir' or env "
                        "LOOKONCE_PRERENDER.")
    return p.parse_args()


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    # Honor JAX_PLATFORMS BEFORE any backend init: the environment's
    # sitecustomize registers the axon TPU platform programmatically
    # and the env var alone does not win — without this, a
    # JAX_PLATFORMS=cpu smoke run silently lands on (and can hang
    # with) the real chip. Same fix as the perf/ scripts.
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # multi-host: join the jax.distributed cluster BEFORE any backend
    # touch (env-gated no-op for single-process runs; the reference's
    # equivalent was Lightning DDP's env rendezvous, slurm.py:102-104)
    from lookoncetohear_tpu.parallel.distributed import maybe_initialize
    maybe_initialize()
    args = parse_args()
    # run-dir collision guard (reference src/trainer.py:122-126)
    last = os.path.join(args.run_dir, "last.ckpt")
    if os.path.exists(last) and not (args.resume or args.test
                                     or args.ckpt):
        raise AssertionError(
            f"{args.run_dir} already has a checkpoint; pass --resume to "
            "continue training or choose a new run_dir")
    hparams = utils.Params(args.config)
    if getattr(args, "epochs", None):
        hparams.epochs = args.epochs
    main(args, hparams)
