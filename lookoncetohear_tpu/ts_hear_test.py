"""Offline end-to-end evaluation — the two-stage TSE pipeline
(enrollment net -> separator) over the val/test split, with per-sample
metadata gathered into a CSV (reference src/ts_hear_test.py).

Usage (defaults mirror the reference's hardcoded config block,
ts_hear_test.py:168-190):

  python -m lookoncetohear_tpu.ts_hear_test \
      [--config configs/tsh.json --run_dir runs/tsh \
       --enroll_config configs/embed.json --enroll_run_dir runs/embed] \
      [--dset test|val] [--sample]

Prints mean SI-SNRi + mean embedding cosine similarity and writes
`results_{dset}_{enroll_cfg}.csv` with the reference's column schema.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from lookoncetohear_tpu import utils
from lookoncetohear_tpu.data.loader import DataLoader
from lookoncetohear_tpu.losses import si_snr
from lookoncetohear_tpu.losses.embedding import cosine_similarity
from lookoncetohear_tpu.train.checkpoint import restore


def load_task(config, run_dir: str, ckpt: str | None = None):
    """Build the task and load run_dir/best.ckpt params (reference
    load_model, ts_hear_test.py:18-34). A best.ckpt that is a FILE is
    treated as a reference PyTorch/Lightning checkpoint and converted
    (lookoncetohear_tpu/convert.py); `ckpt` overrides the run_dir
    lookup and additionally accepts the committed portable .npz
    exports (train/npz_ckpt.py) so result tables reproduce from git
    history alone."""
    task = utils.import_attr(config.pl_module)(**config.pl_module_args)
    ckpt = ckpt or os.path.join(run_dir, "best.ckpt")
    params = None
    if os.path.isfile(ckpt) and ckpt.endswith(".npz"):
        print(f"Loading (npz) {ckpt}")
        from lookoncetohear_tpu.train.npz_ckpt import load_params
        params = load_params(ckpt)
    elif os.path.isdir(ckpt):
        print(f"Loading {ckpt}")
        params = restore(ckpt)["params"]
    elif os.path.isfile(ckpt):
        print(f"Loading (torch) {ckpt}")
        from lookoncetohear_tpu import convert
        sd = convert.load_torch_checkpoint(ckpt)
        mp = config.pl_module_args["model_params"]
        if any("tfgridnet" in k for k in sd):
            params = convert.convert_tse_state_dict(
                sd, n_layers=mp.get("B", 3),
                use_attn=mp.get("use_attn", True))
        else:
            params = convert.convert_embed_state_dict(
                sd, n_layers=mp.get("num_blocks", 3))
    else:
        print(f"Warning: no checkpoint found in {run_dir}")
    return task, params


def _trim_duration(x: np.ndarray, sr: int, top_db: float = 30.0,
                   frame_length: int = 2048, hop: int = 512) -> float:
    """librosa.effects.trim-equivalent speech duration in seconds:
    trim leading/trailing frames quieter than top_db below peak RMS."""
    x = np.asarray(x)
    if x.ndim > 1:
        x = x.mean(0)
    n = len(x)
    if n < frame_length:
        frames = np.abs(x[None, :])
    else:
        nf = 1 + (n - frame_length) // hop
        idx = np.arange(frame_length)[None, :] + hop * \
            np.arange(nf)[:, None]
        frames = x[idx]
    rms = np.sqrt(np.mean(frames ** 2, axis=-1) + 1e-12)
    db = 20 * np.log10(rms / (rms.max() + 1e-12) + 1e-12)
    keep = np.where(db > -top_db)[0]
    if len(keep) == 0:
        return 0.0
    start = keep[0] * hop
    end = min(n, keep[-1] * hop + frame_length)
    return (end - start) / sr


def _get(inputs, key, i, default=None):
    v = inputs.get(key)
    if v is None:
        return default
    try:
        x = v[i]
        return x.item() if hasattr(x, "item") and np.ndim(x) == 0 else x
    except Exception:
        return default


def _cos(a, b) -> float:
    a, b = np.asarray(a).reshape(-1), np.asarray(b).reshape(-1)
    return float(np.dot(a, b)
                 / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-8))


def _sample_to_df(inputs, targets) -> pd.DataFrame:
    """Per-sample metadata rows (reference ts_hear_test.py:52-91);
    tolerant to datasets (e.g. synthetic fixtures) that lack the
    string-metadata fields."""
    b = np.asarray(inputs["mixture"]).shape[0]
    rows = []
    for i in range(b):
        row = {}
        sf = inputs.get("source_files")
        gi = inputs.get("speaker_info")
        for k in range(3):
            row[f"s{k+1}"] = (os.path.basename(sf[k + 1][i])
                              if sf is not None else None)
            row[f"s{k+1}g"] = (gi[k][1][i] if gi is not None
                               and k < len(gi) else None)
        row["input_sisnr"] = _get(inputs, "mixture_sisnr", i, np.nan)
        embeds = inputs.get("mixture_embeddings")
        tgt_idx = int(_get(inputs, "tgt_idx", i, 0) or 0)
        if embeds is not None:
            dists = [_cos(embeds[tgt_idx][i], embeds[j][i])
                     for j in range(len(embeds)) if j != tgt_idx]
            row["input_embed_dist"] = max(dists) if dists else np.nan
        else:
            row["input_embed_dist"] = np.nan
        esf = inputs.get("enrollments_source_files")
        for k in range(3):
            row[f"e{k+1}"] = (os.path.basename(esf[k + 1][i])
                              if esf is not None else None)
        row["enroll_sisnr"] = _get(inputs, "enrollments_sisnr", i, np.nan)
        neg = targets.get("embedding_neg")
        if neg is not None and len(neg) >= 2:
            gt = targets["embedding_gt"][i]
            row["enroll_embed_dist"] = max(
                _cos(gt, neg[0][i]), _cos(gt, neg[1][i]))
        else:
            row["enroll_embed_dist"] = np.nan
        row["tgt_enroll_error"] = _get(inputs, "tgt_enroll_error", i,
                                       np.nan)
        row["tgt_ang_vel"] = _get(inputs, "tgt_ang_vel", i, np.nan)
        rows.append(row)
    return pd.DataFrame(rows)


def run(args) -> pd.DataFrame:
    enroll_cfg_name = os.path.basename(args.enroll_run_dir) \
        if args.enroll_run_dir else "clean"
    results_file = os.path.join(
        args.run_dir, f"results_{args.dset}_{enroll_cfg_name}.csv")
    assert not os.path.exists(results_file), \
        f"{results_file} already exists"

    config = utils.Params(args.config)
    task, params = load_task(config, args.run_dir,
                             ckpt=getattr(args, "ckpt", None))
    if params is None:
        params = task.init_params(
            jax.random.PRNGKey(0), _first_batch(config, args))

    enroll_task = enroll_params = None
    if args.enroll_config:
        enroll_config = utils.Params(args.enroll_config)
        enroll_task, enroll_params = load_task(
            enroll_config, args.enroll_run_dir,
            ckpt=getattr(args, "enroll_ckpt", None))
        if enroll_params is None:
            enroll_params = enroll_task.init_params(
                jax.random.PRNGKey(0), _first_batch(config, args))

    embed_from_wav = getattr(args, "embed_from_wav", False)
    if embed_from_wav:
        # re-embed the enrollment net's output with resemblyzer
        # (reference ts_hear_test.py:36-43,126-131; optional package)
        from resemblyzer import VoiceEncoder, preprocess_wav
        encoder = VoiceEncoder()

        def dvector_from_audio(x, sr):
            embs = []
            for i in range(x.shape[0]):
                wav = preprocess_wav(np.asarray(x[i]).mean(0), sr)
                embs.append(encoder.embed_utterance(wav))
            return jnp.asarray(np.stack(embs))

    ds_key = f"{args.dset}_dataset"
    da_key = f"{args.dset}_data_args"
    ds = utils.import_attr(getattr(config, ds_key))(
        **getattr(config, da_key))
    dl = DataLoader(ds, batch_size=4, shuffle=False,
                    num_workers=getattr(args, "num_workers", 0),
                    drop_last=False, shard_across_processes=False)
    sr = getattr(ds, "sr", 16000)

    sep_fwd = jax.jit(lambda p, x, e: task.model.apply({"params": p}, x,
                                                       e))
    if enroll_task is not None:
        emb_fwd = jax.jit(
            lambda p, x: enroll_task.model.apply({"params": p}, x))

    results = []
    for i, (inputs, targets) in enumerate(dl):
        mixture = jnp.asarray(inputs["mixture"])
        gt_emb = jnp.asarray(targets["embedding_gt"])  # [B, 1, E]
        if enroll_task is not None and embed_from_wav:
            enroll = jnp.asarray(inputs["enrollments"][:, 0])
            sep = emb_fwd(enroll_params, enroll)
            embedding = dvector_from_audio(sep, sr)[:, None]
        elif enroll_task is not None:
            enroll = jnp.asarray(inputs["enrollments"][:, 0])
            embedding = emb_fwd(enroll_params, enroll)[:, None]
        else:
            embedding = gt_emb
        outputs = sep_fwd(params, mixture, embedding)

        target = jnp.asarray(targets["target"])
        out_sisnr = jnp.mean(si_snr(outputs, target), axis=1)
        sisnri = jnp.mean(
            si_snr(outputs, target) - si_snr(mixture, target), axis=1)
        emb_sim = cosine_similarity(embedding[:, 0], gt_emb[:, 0])

        df = _sample_to_df(inputs, targets)
        df["output_sisnr"] = np.asarray(out_sisnr)
        df["si_snr_i"] = np.asarray(sisnri)
        df["embedding_sim"] = np.asarray(emb_sim)
        if getattr(args, "binaural", False):
            # spatial-cue preservation columns (reference used ILD/ITD
            # in its spatial analyses, src/eval/binaural.py:49,120)
            from lookoncetohear_tpu.metrics.binaural import (ild_diff,
                                                             itd_diff)
            est = np.asarray(outputs, np.float64)
            gt = np.asarray(target, np.float64)
            df["delta_ild_db"] = ild_diff(est, gt)
            df["delta_itd_us"] = itd_diff(est, gt, sr)
        df["enroll_duration"] = [
            _trim_duration(np.asarray(e), sr)
            for e in np.asarray(inputs["enrollments_clean"][:, 0])]
        results.append(df)

        if args.sample and i == 3:
            out = pd.concat(results, ignore_index=True)
            print(out)
            print("Average SI-SNRi:", df["si_snr_i"].mean())
            return out

    results = pd.concat(results, ignore_index=True)
    print("Average SI-SNRi:", results["si_snr_i"].mean())
    print("Average cosine similarity:", results["embedding_sim"].mean())
    print(f"Writing results to {results_file}")
    results.to_csv(results_file, index=False)
    return results


def _first_batch(config, args):
    ds = utils.import_attr(getattr(config, f"{args.dset}_dataset"))(
        **getattr(config, f"{args.dset}_data_args"))
    from lookoncetohear_tpu.data.loader import collate
    return collate([ds[0]])


if __name__ == "__main__":
    # Honor JAX_PLATFORMS BEFORE backend init (the sitecustomize-
    # registered axon platform ignores the env var alone; without
    # this a CPU eval run lands on the real chip — see trainer.py)
    import os as _os
    if _os.environ.get("JAX_PLATFORMS"):
        import jax as _jax
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    parser = argparse.ArgumentParser()
    parser.add_argument("--dset", type=str, default="test")
    parser.add_argument("--sample", action="store_true", default=False)
    parser.add_argument("--config", type=str, default="configs/tsh.json")
    parser.add_argument("--run_dir", type=str, default="runs/tsh")
    parser.add_argument("--enroll_config", type=str,
                        default="configs/embed.json")
    parser.add_argument("--enroll_run_dir", type=str,
                        default="runs/embed")
    parser.add_argument("--ckpt", type=str, default=None,
                        help="explicit separator checkpoint (orbax "
                             "dir, torch .ckpt, or committed .npz "
                             "export) overriding run_dir/best.ckpt")
    parser.add_argument("--enroll_ckpt", type=str, default=None,
                        help="same, for the enrollment net")
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--embed_from_wav", action="store_true",
                        default=False)
    parser.add_argument("--binaural", action="store_true",
                        default=False,
                        help="add ΔILD (dB) / ΔITD (µs) spatial-cue "
                             "columns to the per-sample CSV")
    args = parser.parse_args()
    run(args)
