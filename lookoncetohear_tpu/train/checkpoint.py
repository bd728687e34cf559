"""Orbax checkpointing with the reference's last + best-k policy
(reference src/trainer.py:32-38: save_last into run_dir, top-5 best on
the task monitor into run_dir/best)."""

from __future__ import annotations

import json
import os
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _primary() -> bool:
    return jax.process_index() == 0


def save(path: str, tree) -> None:
    """Save a (replicated) pytree. In a multi-process cluster EVERY
    rank must call this with identical data: orbax's Checkpointer.save
    contains its own global barrier ('Checkpointer:save_start'), and
    only the primary host writes replicated numpy arrays — a
    rank-0-gated call deadlocks the cluster on mismatched barriers."""
    path = os.path.abspath(path)
    if _primary() and os.path.exists(path):
        shutil.rmtree(path)
    if jax.process_count() > 1:
        # peers must not enter orbax's save while the primary is still
        # clearing the old directory
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"ckpt_rm:{path}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _to_numpy(tree))


def restore(path: str, like=None):
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(path)
        return ckptr.restore(
            path, args=ocp.args.PyTreeRestore(item=_to_numpy(like)))


class CheckpointManager:
    """last + top-k checkpoints keyed on a monitored metric."""

    def __init__(self, run_dir: str, monitor: str, mode: str = "max",
                 top_k: int = 5) -> None:
        self.run_dir = run_dir
        self.monitor = monitor
        self.mode = mode
        self.top_k = top_k
        self.best_dir = os.path.join(run_dir, "best")
        os.makedirs(self.best_dir, exist_ok=True)
        self.meta_path = os.path.join(run_dir, "ckpt_meta.json")
        self.meta = {"best": []}  # list of {name, value, epoch, step}
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                self.meta = json.load(f)

    @property
    def last_path(self) -> str:
        return os.path.join(self.run_dir, "last.ckpt")

    def _write_meta(self) -> None:
        # ranks share run_dir; the in-memory meta evolves identically
        # on every rank (replicated metrics), so rank 0 alone touches
        # the file
        if not _primary():
            return
        with open(self.meta_path, "w") as f:
            json.dump(self.meta, f, indent=1)

    def save_last(self, tree, epoch: int, step: int) -> None:
        save(self.last_path, tree)
        self.meta["last"] = {"epoch": epoch, "step": step}
        self._write_meta()

    def save_best(self, tree, value: float, epoch: int, step: int) -> None:
        """Keep only if it lands in the top-k on the monitor."""
        entries = self.meta["best"]
        sign = -1.0 if self.mode == "max" else 1.0
        name = f"epoch={epoch}-step={step}.ckpt"
        entries.append({"name": name, "value": float(value),
                        "epoch": epoch, "step": step})
        entries.sort(key=lambda e: sign * e["value"])
        keep = entries[: self.top_k]
        if not any(e["name"] == name for e in keep):
            self.meta["best"] = keep
            self._write_meta()
            return
        save(os.path.join(self.best_dir, name), tree)  # all ranks
        self.meta["best"] = keep
        self._write_meta()
        if not _primary():
            return
        for e in entries[self.top_k:]:
            p = os.path.join(self.best_dir, e["name"])
            if os.path.exists(p):
                shutil.rmtree(p)
        # convenience symlink-equivalent: best.ckpt mirrors the top entry
        top = keep[0]["name"]
        best_link = os.path.join(self.run_dir, "best.ckpt")
        if os.path.lexists(best_link):
            if os.path.islink(best_link):
                os.unlink(best_link)
            else:
                shutil.rmtree(best_link)
        os.symlink(os.path.join("best", top), best_link)

    def best_checkpoint(self) -> str | None:
        if not self.meta["best"]:
            return None
        return os.path.join(self.best_dir, self.meta["best"][0]["name"])

    def has_last(self) -> bool:
        return os.path.exists(self.last_path)
