"""Portable .npz checkpoints — the reset-proof export format.

Orbax run dirs live under gitignored `runs/` and do not survive the
environment's container resets (round 4 lost two trained checkpoints
that way). A flattened .npz of the params pytree is a few MB at this
model scale (reference model ~1-2 M params, configs/tsh.json:5-20), so
the best params of every training run are exported here and COMMITTED
under `checkpoints/`. Evals (`ts_hear_test --ckpt foo.npz`) and
warm-starts (`trainer --ckpt foo.npz`) accept them directly, so any
result table can be reproduced from the git history alone.

Two key layouts inside one .npz:
  * params-only: nested-dict params flattened with '/'-joined keys
    ("p//<k1>/<k2>/..."); reconstructable WITHOUT a template because
    flax params are plain nested dicts of arrays.
  * full state (``--full``): every leaf of the {params, opt_state,
    epoch, step, sched} tree keyed by `jax.tree_util.keystr` path
    ("f//<keystr>"); restoring needs a like-shaped template (the
    trainer has one at resume time, train/trainer.py fit()).
"""

from __future__ import annotations

import jax
import numpy as np

_PARAM_PREFIX = "p//"
_FULL_PREFIX = "f//"
_SEP = "/"


def _flatten_dict(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{_SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten_dict(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_npz(path: str, params, full_state=None) -> None:
    """Write params (always) and optionally the full train state."""
    entries = {_PARAM_PREFIX + k: v
               for k, v in _flatten_dict(params).items()}
    if full_state is not None:
        leaves = jax.tree_util.tree_flatten_with_path(full_state)[0]
        for p, v in leaves:
            entries[_FULL_PREFIX + jax.tree_util.keystr(p)] = \
                np.asarray(v)
    np.savez_compressed(path, **entries)


def load_params(path: str) -> dict:
    """Reconstruct the nested params dict (no template needed)."""
    z = np.load(path, allow_pickle=False)
    out: dict = {}
    for key in z.files:
        if not key.startswith(_PARAM_PREFIX):
            continue
        parts = key[len(_PARAM_PREFIX):].split(_SEP)
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = z[key]
    if not out:
        raise ValueError(f"{path} holds no '{_PARAM_PREFIX}*' entries")
    return out


def has_full_state(path: str) -> bool:
    z = np.load(path, allow_pickle=False)
    return any(k.startswith(_FULL_PREFIX) for k in z.files)


def load_full_state(path: str, like):
    """Restore a full train-state pytree shaped like `like`."""
    z = np.load(path, allow_pickle=False)
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, _ in paths_leaves:
        key = _FULL_PREFIX + jax.tree_util.keystr(p)
        if key not in z:
            raise KeyError(
                f"{path} misses leaf {key!r}; was it exported with "
                "--full against the same task/optimizer?")
        leaves.append(z[key])
    return jax.tree_util.tree_unflatten(treedef, leaves)
