"""End-to-end real-dataset path over a generated micro-corpus: scene
specs -> renderer -> SOFA spatializer -> MixLibriSpeech dataset family,
with the reference's val/test determinism."""

import os

import numpy as np
import pytest

from lookoncetohear_tpu.data import audio_io
from lookoncetohear_tpu.data.datasets import MixLibriSpeechNoisyEnroll
from lookoncetohear_tpu.data.dataset_variants import (
    MixLibriSpeechCIPIC, MixLibriSpeechNoisyEnrollDirectional,
    OracleMixLibriSpeech, SpeechSeparationDataset)
from lookoncetohear_tpu.data.scene import generate_scene_specs

SR = 16000
SPEAKERS = ["101", "202", "303", "404"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    fg = os.path.join(root, "fg")
    bg = os.path.join(root, "bg")
    embed = os.path.join(root, "embed")
    os.makedirs(embed)
    rng = np.random.default_rng(0)
    for k, spk in enumerate(SPEAKERS):
        d = os.path.join(fg, spk)
        os.makedirs(d)
        embs = {}
        for u in range(2):
            t = np.arange(SR * 6) / SR
            f0 = 120 + 40 * k + 7 * u
            x = 0.4 * np.sin(2 * np.pi * f0 * t) \
                * (0.6 + 0.4 * np.sin(2 * np.pi * 2.0 * t))
            name = f"{spk}-0-{u}.wav"
            audio_io.write_wav(os.path.join(d, name),
                               x.astype(np.float32), SR)
            embs[name] = rng.standard_normal(256).astype(np.float32)
        np.savez(os.path.join(embed, spk + ".npz"), **embs)
    d = os.path.join(bg, "tt")
    os.makedirs(d)
    audio_io.write_wav(os.path.join(d, "noise.wav"),
                       (0.1 * rng.standard_normal(SR * 7)).astype(
                           np.float32), SR)

    jams = os.path.join(root, "jams")
    generate_scene_specs(fg, bg, jams, num_soundscapes=6, seed=5)

    # SOFA fixture: 12 directions, delta IRs
    import h5py
    sofa_dir = os.path.join(root, "sofa")
    os.makedirs(sofa_dir)
    irs = np.zeros((12, 2, 32))
    for m in range(12):
        irs[m, 0, m % 6] = 1.0
        irs[m, 1, (2 * m) % 7] = 1.0
    with h5py.File(os.path.join(sofa_dir, "s.sofa"), "w") as f:
        f.create_dataset("Data.IR", data=irs)
        f.create_dataset("Data.SamplingRate", data=np.array([SR * 1.0]))
    listfile = os.path.join(sofa_dir, "list.txt")
    with open(listfile, "w") as f:
        f.write("s.sofa")
    return dict(fg=fg, bg=bg, embed=embed, jams=jams, hrtf=listfile)


def _mk(corpus, cls=MixLibriSpeechNoisyEnroll, dset="val", **kw):
    ds = cls(fg_dir=corpus["fg"], bg_dir=corpus["bg"],
             embed_dir=corpus["embed"], jams_dir=corpus["jams"],
             hrtf_list=corpus["hrtf"], dset=dset, sr=SR,
             hrtf_type="CIPIC", **kw)
    ds.simulator.face_to_face_idx = 0  # fixture has 12 dirs, not CIPIC's
    return ds


class TestNoisyEnroll:
    def test_schema(self, corpus):
        ds = _mk(corpus)
        inputs, targets = ds[0]
        n = SR * 5
        assert inputs["mixture"].shape == (2, n)
        assert inputs["enrollments"].shape == (1, 2, n)
        assert targets["target"].shape == (2, n)
        assert targets["embedding_gt"].shape == (1, 256)
        assert len(targets["embedding_neg"]) in (1, 2)
        assert inputs["enrollments_id"].shape == (1,)
        assert np.isfinite(inputs["mixture_sisnr"])
        assert isinstance(inputs["source_files"], list)

    def test_val_determinism(self, corpus):
        ds = _mk(corpus)
        (i1, t1), (i2, t2) = ds[1], ds[1]
        np.testing.assert_array_equal(i1["mixture"], i2["mixture"])
        np.testing.assert_array_equal(t1["target"], t2["target"])
        np.testing.assert_array_equal(i1["enrollments"],
                                      i2["enrollments"])

    def test_target_is_mixture_component(self, corpus):
        ds = _mk(corpus)
        inputs, targets = ds[2]
        resid = inputs["mixture"] - targets["target"]
        # removing the target strictly reduces correlation with it
        c0 = abs(np.sum(inputs["mixture"] * targets["target"]))
        c1 = abs(np.sum(resid * targets["target"]))
        assert c1 < c0

    def test_embedding_matches_target_speaker(self, corpus):
        ds = _mk(corpus)
        inputs, targets = ds[3]
        spk = str(int(inputs["enrollments_id"][0]))
        emb_map = dict(np.load(os.path.join(corpus["embed"],
                                            spk + ".npz")))
        gt = targets["embedding_gt"][0]
        assert any(np.allclose(gt, v) for v in emb_map.values())


class TestVariants:
    def test_directional(self, corpus):
        ds = _mk(corpus, MixLibriSpeechNoisyEnrollDirectional)
        inputs, targets = ds[0]
        assert targets["target"].shape[0] == 1  # first channel only
        assert inputs["mixture"].shape == (2, SR * 5)

    def test_oracle_swaps_target_first(self, corpus):
        ds = _mk(corpus, OracleMixLibriSpeech)
        inputs, targets = ds[0]
        assert inputs["sources"].shape[0] == 4
        np.testing.assert_array_equal(inputs["sources"][0],
                                      targets["target"])

    def test_separation_pairs(self, corpus):
        ds = _mk(corpus, SpeechSeparationDataset)
        inputs, targets = ds[0]
        assert targets["target1"].shape == targets["target2"].shape
        assert not np.allclose(targets["target1"], targets["target2"])
        assert len(inputs["speaker_ids"]) == 2

    def test_clean_enroll(self, corpus):
        ds = _mk(corpus, MixLibriSpeechCIPIC)
        inputs, targets = ds[0]
        assert inputs["enrollments"].shape == (1, 1, SR * 5)
        assert inputs["embeds"].shape == (1, 256)


class TestMotionDataset:
    def test_end_to_end_with_motion_sim(self, corpus, tmp_path):
        """MixLibriSpeechMotion: C++ moving-source renderer inside the
        dataset path."""
        import h5py
        from lookoncetohear_tpu.data.dataset_variants import \
            MixLibriSpeechMotion
        # motion-capable SOFA fixture (needs SourcePosition)
        sofa_dir = tmp_path / "msofa"
        sofa_dir.mkdir()
        irs = np.zeros((8, 2, 16))
        pos = np.zeros((8, 3))
        for m in range(8):
            irs[m, 0, m % 4] = 1.0
            irs[m, 1, (m + 1) % 5] = 1.0
            pos[m] = [m * 45.0 - 180.0, 0.0, 1.0]
        p = str(sofa_dir / "m.sofa")
        with h5py.File(p, "w") as f:
            f.create_dataset("Data.IR", data=irs)
            f.create_dataset("Data.SamplingRate",
                             data=np.array([SR * 1.0]))
            d = f.create_dataset("SourcePosition", data=pos)
            d.attrs["Type"] = "spherical"
        listfile = str(sofa_dir / "list.txt")
        with open(listfile, "w") as f:
            f.write("m.sofa")

        ds = MixLibriSpeechMotion(
            fg_dir=corpus["fg"], bg_dir=corpus["bg"],
            embed_dir=corpus["embed"], jams_dir=corpus["jams"],
            hrtf_list=listfile, dset="val", sr=SR)
        inputs, targets = ds[0]
        n = SR * 5
        assert inputs["mixture"].shape == (2, n)
        assert targets["target"].shape == (2, n)
        assert np.isfinite(inputs["mixture"]).all()
        assert np.abs(inputs["mixture"]).max() > 0
        # clean-enroll scheme: enrollment from clean utterances
        assert inputs["enrollments"].shape[0] == 1
