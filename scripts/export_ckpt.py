"""Export a run's orbax checkpoint to a committed, portable .npz.

Round 4 lost both trained checkpoints to a container reset because
orbax run dirs live in gitignored runs/. This exports the best (or
last) checkpoint to `checkpoints/<name>.npz` (a few MB at the
reference model scale) so it can be git-committed in the same window
the training finished, and every eval table stays reproducible.

  JAX_PLATFORMS=cpu python scripts/export_ckpt.py \
      --run_dir runs/tsh_r5 --out checkpoints/tsh_r5_best.npz
  # cross-window training resume needs optimizer state too:
  ... --which last --full --out checkpoints/tsh_r5_last_full.npz
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from lookoncetohear_tpu.train.checkpoint import (CheckpointManager,  # noqa: E402
                                                 restore)
from lookoncetohear_tpu.train.npz_ckpt import load_params, save_npz  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--which", choices=["best", "last"], default="best")
    p.add_argument("--full", action="store_true",
                   help="also pack opt_state/epoch/step/sched so "
                        "training can resume from the .npz")
    args = p.parse_args()

    ckpts = CheckpointManager(args.run_dir, monitor="", mode="max")
    path = (ckpts.best_checkpoint() if args.which == "best"
            else (ckpts.last_path if ckpts.has_last() else None))
    if path is None or not os.path.isdir(path):
        # fall back to whichever exists
        path = ckpts.best_checkpoint() or (
            ckpts.last_path if ckpts.has_last() else None)
    assert path, f"no checkpoint found in {args.run_dir}"
    state = restore(path)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                exist_ok=True)
    save_npz(args.out, state["params"],
             full_state=state if args.full else None)
    n = sum(x.size for x in jax.tree_util.tree_leaves(state["params"]))
    mb = os.path.getsize(args.out) / 1e6
    # round-trip sanity before declaring success
    rt = load_params(args.out)
    import numpy as np
    ok = all(np.array_equal(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(rt),
        jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda x: x, state["params"]))))
    assert ok, "npz round-trip mismatch"
    print(f"EXPORTED {path} -> {args.out} "
          f"({n/1e6:.2f} M params, {mb:.1f} MB, full={args.full})")


if __name__ == "__main__":
    main()
