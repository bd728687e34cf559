"""Config / registry utilities.

Mirrors the reference's config idiom (reference src/utils.py:7-39):
JSON -> attribute-bag `Params`, plus string-addressed dependency
injection via dotted import paths. We keep accepting the reference's
`src.*` dotted paths (configs/tsh.json, configs/embed.json) by routing
them through a compatibility registry, so reference configs load
unmodified.
"""

from __future__ import annotations

import importlib
import json
import os
import uuid


# Maps reference dotted paths -> this framework's dotted paths.
# Keys are exactly the strings that appear in the reference configs.
_COMPAT_REGISTRY = {
    # PL modules (tasks)
    "src.ts_hear_embed_pl_module.PLModule":
        "lookoncetohear_tpu.train.tasks.TSETask",
    "src.binaural_embed_pl_module.PLModule":
        "lookoncetohear_tpu.train.tasks.EmbedTask",
    "src.ts_hear_embed_pl_module.Logger":
        "lookoncetohear_tpu.train.tasks.EmbeddingTableLogger",
    "src.binaural_embed_pl_module.Logger":
        "lookoncetohear_tpu.train.tasks.EmbeddingTableLogger",
    # Models
    "src.models.tfgridnet_realtime.net.Net":
        "lookoncetohear_tpu.models.net.Net",
    "src.models.tfgridnet_orig.tfgridnet.EmbedTFGridNet":
        "lookoncetohear_tpu.models.net.EmbedNet",
    "src.models.tfgridnet_orig.tfgridnet.Net":
        "lookoncetohear_tpu.models.net.OfflineSeparatorNet",
    # Datasets
    "src.datasets.MixLibriSpeechNoisyEnrollNorm.MixLibriSpeechNoisyEnroll":
        "lookoncetohear_tpu.data.datasets.MixLibriSpeechNoisyEnroll",
    "src.datasets.MixLibriSpeechNoisyEnroll.MixLibriSpeechNoisyEnroll":
        "lookoncetohear_tpu.data.datasets.MixLibriSpeechNoisyEnroll",
    "src.datasets.MixLibriSpeechNoisyEnrollWP.MixLibriSpeechNoisyEnroll":
        "lookoncetohear_tpu.data.dataset_variants."
        "MixLibriSpeechNoisyEnrollWP",
    "src.datasets.MixLibriSpeechNoisyEnrollDirectional."
    "MixLibriSpeechNoisyEnroll":
        "lookoncetohear_tpu.data.dataset_variants."
        "MixLibriSpeechNoisyEnrollDirectional",
    "src.datasets.MixLibriSpeech.MixLibriSpeechCIPICDataset":
        "lookoncetohear_tpu.data.dataset_variants.MixLibriSpeechCIPIC",
    "src.datasets.MixLibriSpeechDM.MixLibriSpeechDM":
        "lookoncetohear_tpu.data.dataset_variants.MixLibriSpeechDM",
    "src.datasets.MixLibriSpeechMotion.MixLibriSpeechMotionDataset":
        "lookoncetohear_tpu.data.dataset_variants.MixLibriSpeechMotion",
    "src.datasets.SpeechSeparationDataset.SpeechSeparationDataset":
        "lookoncetohear_tpu.data.dataset_variants.SpeechSeparationDataset",
    "src.datasets.OracleMixLibriSpeech.OracleMixLibriSpeechDataset":
        "lookoncetohear_tpu.data.dataset_variants.OracleMixLibriSpeech",
    # Synthetic fixtures (this framework's own addition)
    "lookoncetohear_tpu.data.synthetic.SyntheticTSEDataset":
        "lookoncetohear_tpu.data.synthetic.SyntheticTSEDataset",
    # Scheduler: reference names the torch plateau scheduler; we map it
    # onto our optax-based plateau implementation.
    "torch.optim.lr_scheduler.ReduceLROnPlateau":
        "lookoncetohear_tpu.train.schedule.ReduceLROnPlateau",
}


def import_attr(import_path: str):
    """Dotted-path import with reference-path compatibility.

    Equivalent role to reference src/utils.py:7-9, extended with the
    compat registry so reference `src.*` paths resolve to TPU-native
    classes.
    """
    import_path = _COMPAT_REGISTRY.get(import_path, import_path)
    module, attr = import_path.rsplit(".", 1)
    return getattr(importlib.import_module(module), attr)


class Params:
    """JSON-file-backed attribute bag (reference src/utils.py:11-39)."""

    def __init__(self, json_path: str):
        with open(json_path) as f:
            params = json.load(f)
        self.__dict__.update(params)

    def save(self, json_path: str):
        with open(json_path, "w") as f:
            json.dump(self.__dict__, f, indent=4)

    def update(self, json_path: str):
        with open(json_path) as f:
            params = json.load(f)
        self.__dict__.update(params)

    @property
    def dict(self):
        return self.__dict__


def get_run_id(run_dir: str | None = None) -> str:
    """Persist a unique run id in run_dir (reference src/utils.py:41-52,
    which used a wandb id; we are logger-agnostic)."""
    if run_dir is None:
        return uuid.uuid4().hex[:8]
    id_file = os.path.join(run_dir, "run_id.txt")
    if not os.path.exists(id_file):
        os.makedirs(run_dir, exist_ok=True)
        with open(id_file, "w") as f:
            f.write(uuid.uuid4().hex[:8])
    with open(id_file) as f:
        return f.read().strip()
