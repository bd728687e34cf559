"""TitaNet speaker-embedding precompute (reference
src/datasets/nemo_embed.py:34-59; unused by the default configs).
Requires the optional `nemo_toolkit` package."""

from __future__ import annotations

import argparse
import os

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_dir", type=str,
                        default="data/MixLibriSpeech/"
                                "librispeech_scaper_fmt")
    parser.add_argument("--output_dir", type=str,
                        default="data/MixLibriSpeech/"
                                "librispeech_titanet_embeddings")
    args = parser.parse_args()

    try:
        import nemo.collections.asr as nemo_asr
    except ImportError as e:
        raise ImportError(
            "nemo_embed needs the optional nemo_toolkit package "
            "(titanet_large); the default pipeline uses "
            "dvector_embeddings instead") from e

    model = nemo_asr.models.EncDecSpeakerLabelModel.from_pretrained(
        "titanet_large")
    model.eval()

    for dset in sorted(os.listdir(args.root_dir)):
        out_dset = os.path.join(args.output_dir, dset)
        assert not os.path.exists(out_dset)
        os.makedirs(out_dset)
        for speaker in sorted(os.listdir(
                os.path.join(args.root_dir, dset))):
            embs = {}
            spk_dir = os.path.join(args.root_dir, dset, speaker)
            for audio in sorted(os.listdir(spk_dir)):
                emb = model.get_embedding(os.path.join(spk_dir, audio))
                embs[audio] = np.asarray(emb.squeeze().cpu())
            np.savez(os.path.join(out_dset, speaker) + ".npz", **embs)


if __name__ == "__main__":
    main()
