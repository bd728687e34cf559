"""Pre-render dataset samples to disk (npz shards).

On-the-fly scene rendering costs two scaper-style renders plus up to
eight long BRIR convolutions per sample (SURVEY §7 hard-part 3). For
the deterministic val/test splits — and for "frozen-epoch" training —
this tool materializes the device-relevant arrays once so epochs
afterwards are pure mmap'd reads:

  python -m lookoncetohear_tpu.data.prep.prerender \
      --config configs/tsh.json --which val --out data/prerendered/val

Training then points the config's dataset at
`lookoncetohear_tpu.data.prep.prerender.PrerenderedDataset` with
`{"root": "data/prerendered/val"}`.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

DEVICE_KEYS_IN = ("mixture", "enrollments", "enrollments_clean",
                  "mixture_sisnr", "enrollments_sisnr",
                  "enrollments_id", "tgt_idx", "tgt_shift",
                  "tgt_ang_vel", "tgt_enroll_error")
DEVICE_KEYS_TGT = ("target", "embedding_gt", "tgt_spk_idx")


def render_split(dataset, out_dir: str, limit: int | None = None,
                 num_workers: int = 0) -> None:
    """Materialize `dataset` to npz shards. Resumable: already-written
    shards are skipped, so an interrupted render (or a second process)
    continues where it stopped."""
    os.makedirs(out_dir, exist_ok=True)
    n = len(dataset) if limit is None else min(limit, len(dataset))
    todo = [i for i in range(n)
            if not os.path.exists(os.path.join(out_dir, f"{i:08d}.npz"))]
    if not todo:
        return
    job = _RenderOne(dataset, out_dir)
    if num_workers > 0:
        from concurrent.futures import ProcessPoolExecutor
        import multiprocessing
        ctx = multiprocessing.get_context("spawn")
        with ProcessPoolExecutor(num_workers, mp_context=ctx) as pool:
            list(pool.map(job, todo, chunksize=4))
    else:
        for i in todo:
            job(i)


class _RenderOne:
    def __init__(self, dataset, out_dir):
        self.dataset = dataset
        self.out_dir = out_dir

    def __call__(self, i):
        inputs, targets = self.dataset[i]
        arrays = {}
        for k in DEVICE_KEYS_IN:
            if k in inputs:
                arrays[f"in_{k}"] = np.asarray(inputs[k])
        for k in DEVICE_KEYS_TGT:
            if k in targets:
                arrays[f"tgt_{k}"] = np.asarray(targets[k])
        neg = targets.get("embedding_neg")
        if neg is not None:
            arrays["tgt_embedding_neg"] = np.stack(
                [np.asarray(x) for x in neg])
        # atomic write: a crash mid-savez must not leave a truncated
        # shard that a resumed render would then skip
        path = os.path.join(self.out_dir, f"{i:08d}.npz")
        tmp = path[:-4] + ".tmp.npz"  # np.savez appends .npz otherwise
        np.savez(tmp, **arrays)
        os.replace(tmp, path)


class PrerenderedDataset:
    """Reads shards written by `render_split` with the live dataset's
    (inputs, targets) schema (numeric fields only)."""

    def __init__(self, root: str, **_ignored) -> None:
        self.root = root
        self.files = sorted(
            f for f in os.listdir(root)
            if f.endswith(".npz") and not f.endswith(".tmp.npz"))

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int):
        with np.load(os.path.join(self.root, self.files[idx])) as z:
            inputs = {k[3:]: z[k] for k in z.files
                      if k.startswith("in_")}
            targets = {k[4:]: z[k] for k in z.files
                       if k.startswith("tgt_")
                       and k != "tgt_embedding_neg"}
            if "tgt_embedding_neg" in z.files:
                neg = z["tgt_embedding_neg"]
                targets["embedding_neg"] = [neg[i]
                                            for i in range(len(neg))]
        return inputs, targets


if __name__ == "__main__":
    from lookoncetohear_tpu import utils

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--which", default="val",
                        choices=["train", "val", "test"])
    parser.add_argument("--out", required=True)
    parser.add_argument("--num", type=int, default=None)
    parser.add_argument("--num_workers", type=int, default=8)
    args = parser.parse_args()
    cfg = utils.Params(args.config)
    ds = utils.import_attr(getattr(cfg, f"{args.which}_dataset"))(
        **getattr(cfg, f"{args.which}_data_args"))
    render_split(ds, args.out, limit=args.num,
                 num_workers=args.num_workers)
    print(f"rendered {args.num or len(ds)} samples -> {args.out}")
