"""End-to-end target-speech-hearing demo, corpus-free.

Builds a synthetic binaural scene (two synthetic "speakers" + pink
noise), enrolls the target with the embedding network, then extracts
them in real time with the multi-stream serving engine, 8 ms at a
time. Writes input/output wavs and prints SI-SNR improvement.

  python examples/stream_demo.py [--out_dir demo_out]
        [--tse_ckpt runs/tsh/best.ckpt --embed_ckpt runs/embed/best.ckpt]

Without checkpoints the networks run with random weights — the demo
then exercises the full pipeline (enroll -> stream -> overlap-add)
and reports (near-zero) SI-SNRi honestly.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from lookoncetohear_tpu.data import audio_io
from lookoncetohear_tpu.data.synthetic import SyntheticTSEDataset
from lookoncetohear_tpu.models.net import EmbedNet, Net
from lookoncetohear_tpu.serve.engine import StreamingEngine
from lookoncetohear_tpu.train.checkpoint import restore

SR = 16000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="demo_out")
    p.add_argument("--tse_ckpt", default=None)
    p.add_argument("--embed_ckpt", default=None)
    p.add_argument("--seconds", type=float, default=5.0)
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    ds = SyntheticTSEDataset(dset="test", n_samples=1,
                             duration=args.seconds)
    inputs, targets = ds[0]
    mixture = inputs["mixture"]  # [2, N]
    enroll = inputs["enrollments"][0]  # [2, N]
    target = targets["target"]

    tse = Net(embed_dim=256, stft_chunk_size=128, stft_pad_size=64,
              num_ch=2, D=64, L=4, B=3, H=64, local_atten_len=50,
              use_attn=True, lookahead=True, chunk_causal=True)
    emb_net = EmbedNet(embed_dim=256, num_ch=2, n_fft=128, stride=64,
                       num_blocks=3)

    tse_params = restore(args.tse_ckpt)["params"] if args.tse_ckpt \
        else tse.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 2, 1920)),
                      jnp.zeros((1, 1, 256)))["params"]
    emb_params = restore(args.embed_ckpt)["params"] if args.embed_ckpt \
        else emb_net.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 2, 1920)))["params"]

    # 1. "look once": enroll the target speaker
    embedding = np.asarray(emb_net.apply(
        {"params": emb_params}, jnp.asarray(enroll[None])))[0]
    print("enrolled; embedding norm", float(np.linalg.norm(embedding)))

    # 2. stream the mixture 8 ms at a time
    engine = StreamingEngine(tse, tse_params, max_streams=1)
    engine.add_stream(0, embedding)
    chunk = 128
    n = mixture.shape[-1] - mixture.shape[-1] % chunk
    outs = []
    for i in range(n // chunk):
        y = engine.step(mixture[None, :, i * chunk:(i + 1) * chunk])
        outs.append(np.asarray(y)[0])
    est = np.concatenate(outs, axis=-1)

    # engine output lags by one chunk; align for metric/wav
    est_al = est[:, chunk:]
    tgt_al = target[:, :est_al.shape[-1]]
    mix_al = mixture[:, :est_al.shape[-1]]

    def si_snr(p, t):
        p = p - p.mean(-1, keepdims=True)
        t = t - t.mean(-1, keepdims=True)
        a = (p * t).sum(-1, keepdims=True) / (t * t).sum(-1,
                                                        keepdims=True)
        e = p - a * t
        return float(np.mean(10 * np.log10(
            (a * t).reshape(2, -1).var(-1) / (e.var(-1) + 1e-9))))

    print("input SI-SNR :", round(si_snr(mix_al, tgt_al), 2), "dB")
    print("output SI-SNR:", round(si_snr(est_al, tgt_al), 2), "dB")

    audio_io.write_wav(os.path.join(args.out_dir, "mixture.wav"),
                       mixture, SR)
    audio_io.write_wav(os.path.join(args.out_dir, "target.wav"),
                       target, SR)
    audio_io.write_wav(os.path.join(args.out_dir, "extracted.wav"),
                       est, SR)
    print("wavs written to", args.out_dir)


if __name__ == "__main__":
    main()
