"""Per-utterance speaker d-vector precompute (reference
src/datasets/dvector_embeddings.py:35-60): writes one
`<speaker>.pt`-equivalent file per speaker mapping filename ->
embedding.

Backends:
  resemblyzer — the reference's VoiceEncoder (requires the optional
      `resemblyzer` package + its pretrained weights).
  embednet    — a trained binaural EmbedNet checkpoint from this
      framework (mono audio duplicated to both ears).
Output format: `.npz` per speaker (and `.pt` when torch is available,
for reference-pipeline compatibility — the dataset loader accepts
both, lookoncetohear_tpu/data/datasets.py:_load_embedding_map).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from lookoncetohear_tpu.data import audio_io


def _save(embs: dict, out_base: str) -> None:
    np.savez(out_base + ".npz", **embs)
    try:
        import torch
        torch.save({k: np.asarray(v) for k, v in embs.items()},
                   out_base + ".pt")
    except ImportError:
        pass


def _resemblyzer_encoder():
    try:
        from resemblyzer import VoiceEncoder, preprocess_wav
    except ImportError as e:
        raise ImportError(
            "backend 'resemblyzer' needs the optional resemblyzer "
            "package (pretrained VoiceEncoder); use --backend embednet "
            "with a trained enrollment checkpoint instead") from e
    enc = VoiceEncoder()

    def embed(path: str) -> np.ndarray:
        return enc.embed_utterance(preprocess_wav(path))
    return embed


def _embednet_encoder(config: str, run_dir: str, sr: int = 16000):
    import jax
    from lookoncetohear_tpu import utils
    from lookoncetohear_tpu.ts_hear_test import load_task
    task, params = load_task(utils.Params(config), run_dir)
    assert params is not None, f"no checkpoint in {run_dir}"
    fwd = jax.jit(lambda x: task.model.apply({"params": params}, x))

    def embed(path: str) -> np.ndarray:
        audio, file_sr = audio_io.read_audio(path)
        audio = audio_io.resample(audio.mean(0), file_sr, sr)
        x = np.stack([audio, audio])[None]  # mono -> fake binaural
        return np.asarray(fwd(x))[0]
    return embed


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_dir", type=str,
                        default="data/MixLibriSpeech/"
                                "librispeech_scaper_fmt")
    parser.add_argument("--output_dir", type=str,
                        default="data/MixLibriSpeech/"
                                "librispeech_dvector_embeddings")
    parser.add_argument("--backend", type=str, default="resemblyzer",
                        choices=["resemblyzer", "embednet"])
    parser.add_argument("--embednet_config", type=str, default=None)
    parser.add_argument("--embednet_run_dir", type=str, default=None)
    args = parser.parse_args()

    if args.backend == "resemblyzer":
        embed = _resemblyzer_encoder()
    else:
        embed = _embednet_encoder(args.embednet_config,
                                  args.embednet_run_dir)

    for dset in sorted(os.listdir(args.root_dir)):
        out_dset = os.path.join(args.output_dir, dset)
        assert not os.path.exists(out_dset), f"{out_dset} exists"
        os.makedirs(out_dset)
        print(f"Processing {dset}...")
        for speaker in sorted(os.listdir(
                os.path.join(args.root_dir, dset))):
            embs = {}
            spk_dir = os.path.join(args.root_dir, dset, speaker)
            for audio in sorted(os.listdir(spk_dir)):
                embs[audio] = embed(os.path.join(spk_dir, audio))
            _save(embs, os.path.join(out_dset, speaker))


if __name__ == "__main__":
    main()
