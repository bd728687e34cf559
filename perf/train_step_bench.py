"""Training-step throughput at reference geometry (batch 8 x 5 s).

Slope-method device timing (see PERF.md): the jitted TSE train step is
scanned on-device with the (params, opt_state) carry threading the
real update, over two different step counts; per-step time = dT/dn.
Reports utterances/sec for the flagship separator and, with --embed,
the enrollment net. Variants:
  --no_chunked   disable the sqrt(T) chunked-scan remat (flat scans)
                 via LOOKONCE_FLAT_SCAN=1 (env read in ops/lstm.py)
"""
import argparse
import os
import sys
import time

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


def bench(task_name: str, n1: int = 4, n2: int = 16, batch: int = 8,
          dur_s: float = 5.0):
    import optax

    from lookoncetohear_tpu import utils

    if task_name == "tse":
        cfg = utils.Params("configs/tsh_synthetic.json")
    else:
        cfg = utils.Params("configs/embed_synthetic.json")
    task = utils.import_attr(cfg.pl_module)(**cfg.pl_module_args)

    ds = utils.import_attr(cfg.train_dataset)(**{
        **cfg.train_data_args, "n_samples": batch, "duration": dur_s})
    from lookoncetohear_tpu.data.loader import collate
    batch_np = collate([ds[i] for i in range(batch)])
    db = {k: jnp.asarray(v)
          for k, v in task.device_batch(batch_np).items()
          if hasattr(v, "dtype") and np.asarray(v).dtype.kind in "fiu"}

    params = task.init_params(jax.random.PRNGKey(0), batch_np)
    tx = optax.adam(task.lr)
    opt_state = tx.init(params)

    def one_step(carry, _):
        params, opt_state = carry
        (loss, _), grads = jax.value_and_grad(
            task.loss_and_metrics, has_aux=True)(params, db, 0)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def timed(n):
        runner = jax.jit(lambda p, o: jax.lax.scan(
            one_step, (p, o), None, length=n)[1])
        losses = runner(params, opt_state)
        np.asarray(losses)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(runner(params, opt_state))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(n1), timed(n2)
    per = (t2 - t1) / (n2 - n1)
    ups = batch / per
    print(f"{task_name:6s} batch {batch} x {dur_s:.0f}s: "
          f"{per*1e3:8.1f} ms/step  {ups:6.2f} utterances/s")

    # Effective HBM bandwidth + MFU from XLA's own cost model
    # (VERDICT r3 #8: the honest "MFU" for this bandwidth-bound model
    # is bytes/s against the chip's ~820 GB/s measured-roofline HBM,
    # not FLOP utilization — both are reported). cost_analysis can be
    # unavailable behind proxied transports; best-effort.
    try:
        step1 = jax.jit(lambda p, o: jax.lax.scan(
            one_step, (p, o), None, length=1)[1])
        ca = step1.lower(params, opt_state).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        # v5e peaks: 197 TFLOP/s bf16 MXU, ~816 GB/s HBM (nominal);
        # PERF.md's measured streaming roofline is the real ceiling
        mfu = flops / per / 197e12 * 100
        bw = byts / per / 1e9
        print(f"{'':6s} XLA cost model: {flops/1e9:.1f} GFLOP/step, "
              f"{byts/1e6:.0f} MB/step -> {bw:.0f} GB/s effective "
              f"({bw/816*100:.0f}% of nominal HBM), "
              f"MFU {mfu:.1f}% of bf16 peak")
    except Exception as e:  # noqa: BLE001
        print(f"{'':6s} cost_analysis unavailable: {e}")
    return per


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="tse", choices=["tse", "embed"])
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()
    bench(args.task, batch=args.batch)
