"""Self-contained synthetic TSE fixtures — no external corpora.

Generates deterministic binaural target-speech-extraction scenes with
the exact (inputs, targets) schema of the real dataset (reference
MixLibriSpeechNoisyEnrollNorm.py:349-376), so the trainer, eval
harness, and tests run end-to-end in any environment:

* "Speakers" are harmonic tones: speaker s has a fixed fundamental and
  spectral envelope; utterances vary by amplitude/vibrato modulation.
* Spatialization is an analytic spherical-head model: azimuth ->
  fractional-sample ITD (Woodworth) + frequency-flat ILD. Enrollment
  scenes place the target face-to-face (azimuth ~ 0).
* `embedding_gt` is a fixed per-speaker 256-d unit vector; negatives
  are the other speakers' vectors — the contrastive geometry the
  embedding task needs, with none of the d-vector files.

Determinism: every field derives from (split, idx) through
np.random.default_rng, mirroring the reference's seeded val/test rule.
"""

from __future__ import annotations

import numpy as np

_SPLIT_SEEDS = {"train": 1_000_003, "val": 2_000_003, "test": 3_000_003}


def _speaker_embedding(spk: int, dim: int = 256) -> np.ndarray:
    v = np.random.default_rng(910_000 + spk).standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def _utterance(spk: int, utt_seed: int, n: int, sr: int) -> np.ndarray:
    """A 'voice': harmonics of a per-speaker f0 with per-speaker
    envelope, modulated per utterance."""
    rng = np.random.default_rng(700_000 + 131 * spk + utt_seed)
    f0 = 90.0 + 17.0 * (spk % 29)  # 90..566 Hz
    t = np.arange(n) / sr
    vib = 1.0 + 0.01 * np.sin(2 * np.pi * rng.uniform(3, 7) * t
                              + rng.uniform(0, 2 * np.pi))
    phase0 = rng.uniform(0, 2 * np.pi, size=8)
    env_rng = np.random.default_rng(880_000 + spk)
    env = env_rng.uniform(0.2, 1.0, size=8) / np.arange(1, 9)
    sig = np.zeros(n)
    for h in range(8):
        f = f0 * (h + 1)
        if f >= sr / 2:
            break
        sig += env[h] * np.sin(2 * np.pi * f * np.cumsum(vib) / sr
                               + phase0[h])
    # syllable-ish amplitude modulation
    am = 0.55 + 0.45 * np.sin(2 * np.pi * rng.uniform(1.5, 3.5) * t
                              + rng.uniform(0, 2 * np.pi))
    sig = sig * am
    return (sig / (np.abs(sig).max() + 1e-9)).astype(np.float32)


def _binauralize(src: np.ndarray, azimuth_rad: float,
                 sr: int) -> np.ndarray:
    """Fractional-delay ITD + flat ILD panning: [N] -> [2, N]."""
    itd = 0.00066 * np.sin(azimuth_rad)  # seconds, + = left leads
    ild_db = 6.0 * np.sin(azimuth_rad)  # + = left louder
    n = len(src)
    spec = np.fft.rfft(src)
    f = np.fft.rfftfreq(n, 1.0 / sr)
    half = itd / 2.0
    left = np.fft.irfft(spec * np.exp(2j * np.pi * f * half), n)
    right = np.fft.irfft(spec * np.exp(-2j * np.pi * f * half), n)
    gl = 10.0 ** (+ild_db / 40.0)
    gr = 10.0 ** (-ild_db / 40.0)
    return np.stack([gl * left, gr * right]).astype(np.float32)


def _pink(shape, rng: np.random.Generator) -> np.ndarray:
    from lookoncetohear_tpu.data.augmentations import powerlaw_psd_gaussian
    return powerlaw_psd_gaussian(1.0, shape, rng=rng).astype(np.float32)


class SyntheticTSEDataset:
    """Deterministic synthetic scenes with the real dataset's schema."""

    def __init__(self, dset: str = "train", n_samples: int = 100,
                 n_speakers: int = 16, sr: int = 16000,
                 duration: float = 5.0, embed_dim: int = 256,
                 noise_gain: float = 0.05, num_enroll: int = 1) -> None:
        assert dset in ("train", "val", "test")
        self.dset = dset
        self.n_samples = n_samples
        self.n_speakers = n_speakers
        self.sr = sr
        self.n = int(round(duration * sr))
        self.embed_dim = embed_dim
        self.noise_gain = noise_gain
        self.embeddings = np.stack([
            _speaker_embedding(s, embed_dim) for s in range(n_speakers)])

    def __len__(self) -> int:
        return self.n_samples

    def _scene(self, rng, spks, azimuths, utt_seeds, gains, noise_seed):
        events = []
        for spk, az, us, g in zip(spks, azimuths, utt_seeds, gains):
            mono = _utterance(spk, us, self.n, self.sr) * g
            events.append(_binauralize(mono, az, self.sr))
        noise = self.noise_gain * _pink(
            (2, self.n), np.random.default_rng(noise_seed))
        return events, noise

    def __getitem__(self, idx: int):
        seed = _SPLIT_SEEDS[self.dset] + idx
        rng = np.random.default_rng(seed)
        n_spk = int(rng.integers(2, 4))
        spks = rng.choice(self.n_speakers, size=n_spk, replace=False)
        azimuths = rng.uniform(-np.pi / 2, np.pi / 2, size=n_spk)
        utt_seeds = rng.integers(0, 10_000, size=n_spk)
        gains = rng.uniform(0.4, 0.9, size=n_spk)

        events, noise = self._scene(
            rng, spks, azimuths, utt_seeds, gains, noise_seed=seed * 7 + 1)
        mixture = np.sum(events, axis=0) + noise
        norm = np.abs(mixture).max()
        if norm > 1.0:
            events = [e / norm for e in events]
            noise = noise / norm
            mixture = mixture / norm

        tgt_idx = int(rng.integers(0, n_spk))
        target = events[tgt_idx]
        tgt_spk = int(spks[tgt_idx])

        # enrollment scene: same speakers, target face-to-face
        e_az = rng.uniform(-np.pi / 2, np.pi / 2, size=n_spk)
        e_az[tgt_idx] = rng.uniform(-0.05, 0.05)
        e_us = rng.integers(10_000, 20_000, size=n_spk)
        e_events, e_noise = self._scene(
            rng, spks, e_az, e_us, gains, noise_seed=seed * 7 + 2)
        enroll = np.sum(e_events, axis=0) + e_noise
        e_norm = np.abs(enroll).max()
        if e_norm > 1.0:
            e_events = [e / e_norm for e in e_events]
            enroll = enroll / e_norm
        enroll_clean = e_events[tgt_idx]

        emb_gt = self.embeddings[tgt_spk]
        emb_neg = [self.embeddings[int(spks[i])][None]
                   for i in range(n_spk) if i != tgt_idx]
        while len(emb_neg) < 2:  # fixed count for stacking
            emb_neg.append(np.zeros_like(emb_neg[-1]))

        inputs = {
            "mixture": mixture.astype(np.float32),
            "enrollments": enroll[None].astype(np.float32),
            "enrollments_clean": enroll_clean[None].astype(np.float32),
            "enrollments_clean_anechoic":
                enroll_clean[None].astype(np.float32),
            "enrollments_id": np.array([tgt_spk], np.int64),
            "tgt_idx": np.int64(tgt_idx),
            "tgt_shift": np.int64(0),
            "tgt_ang_vel": np.float32(0.0),
            "tgt_enroll_error": np.float32(0.0),
        }
        targets = {
            "target": target.astype(np.float32),
            "embedding_gt": emb_gt[None],
            "embedding_neg": [e.astype(np.float32) for e in emb_neg],
            "tgt_spk_idx": np.int64(tgt_spk),
        }
        return inputs, targets
