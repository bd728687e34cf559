"""Epoch wall-time: on-the-fly rendering vs the --prerender cache
(VERDICT r2 #2 'done' table).

Runs ONE training epoch of the synthetic TSE config at reference
geometry (512 x 5 s scenes, batch 8) three ways and reports wall time:

  render-live-threads : DataLoader thread workers, render per epoch
  render-live-procs   : DataLoader process workers (persistent pool)
  prerendered         : mmap'd npz shards (data/prep/prerender.py)

The device step itself was slope-measured at ~435 ms (PERF.md) ->
~28 s of device time per 64-step epoch; anything above that is input
pipeline. Usage: python perf/epoch_time_bench.py [--frac 0.25]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

# the environment pre-registers the axon TPU platform programmatically;
# the JAX_PLATFORMS env var alone does NOT switch platforms — honor it
# explicitly before any backend init (same fix as __graft_entry__)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from lookoncetohear_tpu import utils  # noqa: E402
from lookoncetohear_tpu.data.loader import (DataLoader,  # noqa: E402
                                            prefetch_to_device)
from lookoncetohear_tpu.data.synthetic import \
    SyntheticTSEDataset  # noqa: E402
from lookoncetohear_tpu.train.tasks import TSETask  # noqa: E402

p = argparse.ArgumentParser()
p.add_argument("--frac", type=float, default=1.0)
p.add_argument("--workers", type=int, default=8)
p.add_argument("--cache", default="/tmp/lookonce_prerender_bench")
args = p.parse_args()

cfg = utils.Params("/root/repo/configs/tsh_synthetic.json")
n_samples = max(8, int(512 * args.frac))
ds_args = dict(cfg.train_data_args, n_samples=n_samples)
task = TSETask(**cfg.pl_module_args)

ds = SyntheticTSEDataset(**ds_args)
batch0 = next(iter(DataLoader(ds, batch_size=8,
                              shard_across_processes=False)))
params = task.init_params(jax.random.PRNGKey(0), batch0)
import optax  # noqa: E402
tx = optax.adam(5e-4)
opt_state = tx.init(params)


@jax.jit
def train_step(params, opt_state, batch):
    (loss, metrics), grads = jax.value_and_grad(
        task.loss_and_metrics, has_aux=True)(params, batch, 0)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


def epoch(dl, params, opt_state, tag):
    # warm the compile outside the timed region
    db = task.device_batch(next(iter(dl)))
    db = {k: jnp.asarray(v) for k, v in db.items()
          if hasattr(v, "shape")}
    params, opt_state, loss = train_step(params, opt_state, db)
    np.asarray(loss)
    t0 = time.perf_counter()
    n = 0
    it = ({k: jnp.asarray(v) for k, v in task.device_batch(b).items()
           if hasattr(v, "shape")} for b in dl)
    for db in prefetch_to_device(it, size=2):
        params, opt_state, loss = train_step(params, opt_state, db)
        n += 1
    np.asarray(loss)
    dt = time.perf_counter() - t0
    print(f"{tag:22s} {dt:7.1f} s / {n} steps "
          f"({n * 8 / dt:5.1f} utt/s)", flush=True)
    return params, opt_state


def make_live(worker_type):
    return DataLoader(SyntheticTSEDataset(**ds_args), batch_size=8,
                      shuffle=True, seed=0, num_workers=args.workers,
                      worker_type=worker_type,
                      shard_across_processes=False)


params, opt_state = epoch(make_live("thread"), params, opt_state,
                          "render-live-threads")
params, opt_state = epoch(make_live("process"), params, opt_state,
                          "render-live-procs")

from lookoncetohear_tpu.data.prep.prerender import (  # noqa: E402
    PrerenderedDataset, render_split)
t0 = time.perf_counter()
render_split(SyntheticTSEDataset(**ds_args), args.cache,
             num_workers=args.workers)
print(f"(one-time prerender: {time.perf_counter() - t0:.1f} s)")
pre_dl = DataLoader(PrerenderedDataset(args.cache), batch_size=8,
                    shuffle=True, seed=0, num_workers=2,
                    shard_across_processes=False)
params, opt_state = epoch(pre_dl, params, opt_state, "prerendered")
