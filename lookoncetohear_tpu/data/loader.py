"""Host-side batching + device feed.

Replaces torch DataLoader in the reference stack (reference
src/trainer.py:91-95): multiprocess scene rendering on host CPUs,
numpy collation to fixed shapes, per-host index sharding for
data-parallel training, and double-buffered host->device prefetch.
Only numeric fields become device arrays; strings/metadata stay host-
side lists (SURVEY §7 hard-part 5).
"""

from __future__ import annotations

import multiprocessing
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Any, Iterator

import jax
import numpy as np

# Process workers are a minefield next to an initialized JAX runtime:
# fork() can deadlock JAX's threadpools, and spawn re-imports the
# entry module (pulling JAX + the TPU plugin into every worker). The
# default is therefore THREAD workers — the render pipeline is
# numpy/scipy (fftconvolve, rfft, wav IO), which release the GIL, so
# threads overlap well. `worker_type="process"` (spawn) remains
# available for pure-Python-heavy datasets run from import-light
# entry points.
_MP_CONTEXT = multiprocessing.get_context("spawn")


def collate(samples: list) -> Any:
    """Batch a list of per-sample pytrees (dicts/lists/tuples of numpy
    arrays, scalars, or strings), torch-default-collate style."""
    first = samples[0]
    if isinstance(first, dict):
        return {k: collate([s[k] for s in samples]) for k in first}
    if isinstance(first, (tuple, list)):
        return type(first)(
            collate([s[i] for s in samples]) for i in range(len(first)))
    if isinstance(first, str):
        return list(samples)
    arr = np.asarray(samples[0])
    if arr.dtype.kind in "OU":
        return list(samples)
    return np.stack([np.asarray(s) for s in samples])


def shard_indices(n: int, *, shuffle: bool, seed: int, epoch: int,
                  process_index: int | None = None,
                  process_count: int | None = None) -> np.ndarray:
    """Deterministic per-host index shard: every host permutes the same
    way (seed, epoch), then takes a strided slice — the JAX-native
    replacement for DistributedSampler."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    idx = np.arange(n)
    if shuffle:
        idx = np.random.default_rng((seed, epoch)).permutation(idx)
    return idx[process_index::process_count]


def _fetch(args):
    dataset, idx = args
    return dataset[idx]


# process-worker globals: the dataset is shipped ONCE per worker via
# the pool initializer instead of being pickled with every index
# (datasets can hold MBs of embedding tables)
_WORKER_DS = None


def _init_worker(dataset):
    global _WORKER_DS
    _WORKER_DS = dataset


def _fetch_idx(idx):
    return _WORKER_DS[idx]


class DataLoader:
    """Epoch iterator: index shard -> worker pool -> collate.

    The worker pool is PERSISTENT: created on first use and reused
    across epochs (a fresh ProcessPool per epoch costs seconds of
    spawn+import per worker, 100x over a training run — the torch
    DataLoader equivalent is persistent_workers=True)."""

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = False,
                 seed: int = 0, num_workers: int = 0,
                 drop_last: bool = True,
                 shard_across_processes: bool = True,
                 worker_type: str = "thread"):
        assert worker_type in ("thread", "process")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.shard = shard_across_processes
        self.worker_type = worker_type
        self.epoch = 0
        self._pool = None

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _get_pool(self):
        if self._pool is None:
            if self.worker_type == "thread":
                self._pool = ThreadPoolExecutor(
                    max_workers=self.num_workers)
            else:
                self._pool = ProcessPoolExecutor(
                    max_workers=self.num_workers,
                    mp_context=_MP_CONTEXT,
                    initializer=_init_worker,
                    initargs=(self.dataset,))
        return self._pool

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self) -> int:
        n = len(shard_indices(
            len(self.dataset), shuffle=False, seed=0, epoch=0,
            process_index=jax.process_index() if self.shard else 0,
            process_count=jax.process_count() if self.shard else 1))
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Any]:
        idx = shard_indices(
            len(self.dataset), shuffle=self.shuffle, seed=self.seed,
            epoch=self.epoch,
            process_index=jax.process_index() if self.shard else 0,
            process_count=jax.process_count() if self.shard else 1)
        if self.drop_last:
            idx = idx[: len(idx) - len(idx) % self.batch_size]
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.num_workers <= 0:
            for b in batches:
                yield collate([self.dataset[int(i)] for i in b])
            return
        pool = self._get_pool()
        flat = [int(i) for b in batches for i in b]
        if self.worker_type == "thread":
            it = pool.map(_fetch, [(self.dataset, i) for i in flat],
                          chunksize=max(1, self.batch_size // 2))
        else:
            it = pool.map(_fetch_idx, flat,
                          chunksize=max(1, self.batch_size // 2))
        buf = []
        for sample in it:
            buf.append(sample)
            if len(buf) == self.batch_size:
                yield collate(buf)
                buf = []
        if buf and not self.drop_last:
            yield collate(buf)


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Move batches to device `size` steps ahead of consumption on a
    background thread, overlapping host rendering + H2D DMA with TPU
    compute. Non-array leaves pass through untouched.

    Multi-process: each host feeds its LOCAL rows of the global batch;
    `jax.make_array_from_process_local_data` assembles the global
    jax.Array over the full mesh (the DDP data path — each rank's
    loader shard becomes that rank's slice of the global batch)."""
    multiproc = jax.process_count() > 1

    def _put(batch):
        def leaf(x):
            if isinstance(x, np.ndarray) and x.dtype.kind in "fiub":
                if multiproc and sharding is not None:
                    return jax.make_array_from_process_local_data(
                        sharding, x)
                return jax.device_put(x, sharding)
            return x
        return jax.tree_util.tree_map(leaf, batch)

    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    err: list = []

    def producer():
        try:
            for batch in iterator:
                q.put(_put(batch))
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
