"""Native motion simulator: build, ctypes round-trip, physical
behavior (delays move with the source), path generators — the tests
the reference ran by hand (reference motion_simulator.py:328-614)."""

import os

import numpy as np
import pytest

from lookoncetohear_tpu.data.motion import (CIPICMotionSimulator,
                                            MotionSimulator,
                                            RRBRIRMotionSimulator,
                                            build_native)

SR = 16000


@pytest.fixture(scope="module")
def lib():
    return build_native()


def _delta_db(n_dirs=8, n_ir=32):
    """IR database: direction m delays left by m, right by 2m samples.
    Positions spread over azimuth in the horizontal plane."""
    irs = np.zeros((n_dirs, 2, n_ir), np.float32)
    pos = np.zeros((n_dirs, 3), np.float32)
    for m in range(n_dirs):
        irs[m, 0, m] = 1.0
        irs[m, 1, min(2 * m, n_ir - 1)] = 1.0
        az = -np.pi / 2 + np.pi * m / max(n_dirs - 1, 1)
        pos[m] = [np.cos(az), np.sin(az), 0.0]
    return irs, pos


class TestNativeLib:
    def test_build(self, lib):
        assert os.path.exists(lib)

    def test_round_trip_static_source(self, lib):
        sim = MotionSimulator(SR, 0.025)
        irs, pos = _delta_db()
        sim.set_hrtf_arrays(irs, pos)
        n = SR  # 1 s
        audio = np.random.default_rng(0).standard_normal(n).astype(
            np.float32)
        # static path at direction 0's exact position
        path = np.tile(pos[0], (41, 1)).astype(np.float32)
        sim.add_source(audio, path)
        out = sim.simulate()
        assert out.shape == (1, 2, n)
        # direction 0: left delayed by 0, right by 0 -> identical
        np.testing.assert_allclose(out[0, 0], audio, atol=1e-5)
        np.testing.assert_allclose(out[0, 1], audio, atol=1e-5)

    def test_known_delay(self, lib):
        sim = MotionSimulator(SR, 0.025)
        irs, pos = _delta_db()
        sim.set_hrtf_arrays(irs, pos)
        n = SR // 2
        audio = np.random.default_rng(1).standard_normal(n).astype(
            np.float32)
        path = np.tile(pos[3], (21, 1)).astype(np.float32)  # delays 3/6
        sim.add_source(audio, path)
        out = sim.simulate()
        np.testing.assert_allclose(out[0, 0, 3:], audio[:-3], atol=1e-5)
        np.testing.assert_allclose(out[0, 1, 6:], audio[:-6], atol=1e-5)

    def test_moving_source_switches_hrir(self, lib):
        sim = MotionSimulator(SR, 0.025)
        irs, pos = _delta_db()
        sim.set_hrtf_arrays(irs, pos)
        n = SR
        audio = np.random.default_rng(7).standard_normal(n).astype(
            np.float32)
        # path jumps from direction 0 (delays 0/0) to direction 7
        # (delays 7/14) halfway
        n_pts = 41
        path = np.tile(pos[0], (n_pts, 1))
        path[n_pts // 2:] = pos[7]
        sim.add_source(audio, path.astype(np.float32))
        out = sim.simulate()

        def lr_lag(seg_l, seg_r, max_lag=20):
            lags = [np.dot(seg_l[max_lag:-max_lag],
                           seg_r[max_lag + k:len(seg_r) - max_lag + k])
                    for k in range(-max_lag, max_lag + 1)]
            return int(np.argmax(lags)) - max_lag

        early = lr_lag(out[0, 0, :SR // 4], out[0, 1, :SR // 4])
        late = lr_lag(out[0, 0, -SR // 4:], out[0, 1, -SR // 4:])
        assert early == 0
        assert late == 7  # right lags left by (14 - 7) samples

    def test_multiple_sources(self, lib):
        sim = MotionSimulator(SR, 0.025)
        irs, pos = _delta_db()
        sim.set_hrtf_arrays(irs, pos)
        n = SR // 4
        a = np.random.default_rng(2).standard_normal(n).astype(np.float32)
        path = np.tile(pos[0], (11, 1)).astype(np.float32)
        for _ in range(3):
            sim.add_source(a, path)
        out = sim.simulate()
        assert out.shape == (3, 2, n)
        np.testing.assert_allclose(out[0], out[2], atol=1e-6)
        # cleanup happened inside simulate: adding + simulating again works
        sim.add_source(a, path)
        out2 = sim.simulate()
        assert out2.shape == (1, 2, n)

    def test_path_too_short_rejected(self, lib):
        sim = MotionSimulator(SR, 0.025)
        irs, pos = _delta_db()
        sim.set_hrtf_arrays(irs, pos)
        audio = np.zeros(SR, np.float32)
        with pytest.raises(AssertionError):
            sim.add_source(audio, np.zeros((3, 3), np.float32))


def _sofa_fixture(tmp_path, n_dirs=6):
    import h5py
    irs = np.zeros((n_dirs, 2, 16), np.float64)
    pos = np.zeros((n_dirs, 3), np.float64)
    for m in range(n_dirs):
        irs[m, 0, m] = 1.0
        irs[m, 1, m] = 1.0
        pos[m] = [m * 60.0 - 150.0, 0.0, 1.0]  # spherical az/el/r deg
    p = str(tmp_path / "test.sofa")
    with h5py.File(p, "w") as f:
        f.create_dataset("Data.IR", data=irs)
        f.create_dataset("Data.SamplingRate", data=np.array([SR * 1.0]))
        d = f.create_dataset("SourcePosition", data=pos)
        d.attrs["Type"] = "spherical"
    listfile = str(tmp_path / "list.txt")
    with open(listfile, "w") as f:
        f.write("test.sofa")
    return listfile


class TestMotionSimulators:
    def test_cipic_motion_end_to_end(self, tmp_path, lib):
        listfile = _sofa_fixture(tmp_path)
        sim = CIPICMotionSimulator(listfile, SR)
        rng = np.random.default_rng(3)
        srcs = [rng.standard_normal(SR).astype(np.float32)
                for _ in range(2)]
        noise = rng.standard_normal(SR).astype(np.float32)
        bi_srcs, bi_noise, params = sim.simulate(srcs, noise, seed=11)
        assert len(bi_srcs) == 2 and bi_srcs[0].shape == (2, SR)
        assert bi_noise.shape == (2, SR)
        assert len(params) == 2
        # deterministic under the same seed
        b2, n2, p2 = sim.simulate(srcs, noise, seed=11)
        np.testing.assert_allclose(bi_srcs[0], b2[0])
        assert params == p2

    def test_face_to_face_path_is_frontal(self, tmp_path, lib):
        listfile = _sofa_fixture(tmp_path)
        sim = CIPICMotionSimulator(listfile, SR)
        t = np.arange(0, 1.0, 0.025)
        path, err = sim.get_face_to_face_source_path(7, t)
        assert path.shape == (len(t), 3)
        # frontal = +y direction (theta ~ pi/2, phi ~ pi/2)
        assert np.all(path[:, 1] > 0.7)
        assert 0 <= err <= np.pi / 10

    def test_piecewise_arcs_stay_on_sphere(self, tmp_path, lib):
        listfile = _sofa_fixture(tmp_path)
        sim = CIPICMotionSimulator(listfile, SR,
                                   use_piecewise_arcs=True)
        import random as _r
        t = np.arange(0, 5.0, 0.025)
        path, _ = sim.get_piecewise_arc_path(_r.Random(3), t)
        np.testing.assert_allclose(
            np.linalg.norm(path, axis=1), 1.0, atol=1e-6)

    def test_rrbrir_paths(self, tmp_path, lib):
        listfile = _sofa_fixture(tmp_path)
        sim = RRBRIRMotionSimulator(listfile, SR)
        import random as _r
        t = np.arange(0, 2.0, 0.025)
        path, _ = sim.get_random_source_path(_r.Random(5), t)
        # front hemisphere only (x >= 0), radius 1.5
        assert np.all(path[:, 0] >= 0)
        np.testing.assert_allclose(np.linalg.norm(path, axis=1), 1.5,
                                   atol=1e-6)
