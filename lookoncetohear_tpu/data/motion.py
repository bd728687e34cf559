"""Moving-source binaural rendering: ctypes bridge + path generation.

Host side of the native C++ renderer (native/motion_simulator/
moving_sources.cpp). Mirrors reference src/datasets/motion_simulator.py:
the host generates per-frame (25 ms) 3-D source paths on the unit
sphere — constant-angular-velocity arcs, piecewise random arcs, or a
jittered face-to-face path for enrollment — and the C++ library picks
and cross-fades HRIRs along the path and convolves.

Difference from the reference ABI: SOFA files are HDF5, so this bridge
decodes them with h5py and ships raw IRs + source positions through
`simulator_set_hrtf_data` instead of having the C++ library link
libhdf5 (the reference's `simulator_set_hrtf(path)` is kept in the
ABI but returns unsupported).
"""

from __future__ import annotations

import ctypes
import functools
import os
import random
import subprocess

import numpy as np

from lookoncetohear_tpu.data import audio_io
from lookoncetohear_tpu.data.spatializer import CIPICSimulator

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "motion_simulator")


def _lib_path() -> str:
    return os.path.join(_NATIVE_DIR, "moving_sources.so")


def build_native(force: bool = False) -> str:
    """Compile moving_sources.so if missing (g++ is in the image)."""
    so = _lib_path()
    if force or not os.path.exists(so):
        subprocess.run(["make", "-C", _NATIVE_DIR] + (
            ["-B"] if force else []), check=True, capture_output=True)
    return so


@functools.lru_cache(maxsize=4)
def _load_sofa_full(path: str):
    """(irs [M, R, N] float32, positions_cartesian [M, 3] float32, sr)"""
    import h5py
    with h5py.File(path, "r") as f:
        irs = np.asarray(f["Data.IR"], dtype=np.float32)
        sr = float(np.asarray(f["Data.SamplingRate"]).reshape(-1)[0])
        pos = np.asarray(f["SourcePosition"], dtype=np.float64)
        ptype = f["SourcePosition"].attrs.get("Type", b"spherical")
        if isinstance(ptype, bytes):
            ptype = ptype.decode()
    if "spherical" in str(ptype):
        az = np.deg2rad(pos[:, 0])
        el = np.deg2rad(pos[:, 1])
        cart = np.stack([np.cos(el) * np.cos(az),
                         np.cos(el) * np.sin(az),
                         np.sin(el)], axis=1)
    else:
        cart = pos[:, :3]
    return irs, cart.astype(np.float32), sr


class MotionSimulator:
    """ctypes wrapper with the reference's class API (reference
    motion_simulator.py:30-95)."""

    def __init__(self, sr: int, frame_duration: float = 0.025) -> None:
        self.lib = ctypes.CDLL(build_native())
        self.sr = sr
        self.frame_duration = frame_duration
        self._p = ctypes.c_void_p()
        err = self.lib.simulator_init(
            ctypes.pointer(self._p), ctypes.c_int(sr),
            ctypes.c_float(frame_duration))
        assert err == 0, f"simulator_init failed: {err}"

    def _call(self, name: str, *args) -> None:
        err = getattr(self.lib, name)(self._p, *args)
        assert err == 0, f"{name} failed with code {err}"

    def set_hrtf(self, sofa_path: str) -> None:
        assert os.path.exists(sofa_path), f"HRTF not found: {sofa_path}"
        irs, pos, file_sr = _load_sofa_full(sofa_path)
        if int(file_sr) != self.sr:
            irs = audio_io.resample(irs, int(file_sr), self.sr)
            irs = np.ascontiguousarray(irs, dtype=np.float32)
        m, r, n = irs.shape
        self._call(
            "simulator_set_hrtf_data",
            irs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(m), ctypes.c_int(r), ctypes.c_int(n),
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))

    def set_hrtf_arrays(self, irs: np.ndarray, pos: np.ndarray) -> None:
        irs = np.ascontiguousarray(irs, dtype=np.float32)
        pos = np.ascontiguousarray(pos, dtype=np.float32)
        m, r, n = irs.shape
        self._call(
            "simulator_set_hrtf_data",
            irs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(m), ctypes.c_int(r), ctypes.c_int(n),
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))

    def add_source(self, data: np.ndarray, path: np.ndarray) -> None:
        assert path.ndim == 2 and path.shape[1] == 3, \
            f"Path must have shape (N, 3), found {path.shape}"
        n_frames_needed = int(np.ceil(
            (data.shape[-1] / self.sr) / self.frame_duration))
        assert path.shape[0] >= n_frames_needed, \
            f"path too short: {path.shape[0]} < {n_frames_needed}"
        audio = np.ascontiguousarray(data, dtype=np.float32).reshape(-1)
        pathf = np.ascontiguousarray(path, dtype=np.float32).reshape(-1)
        self._call(
            "simulator_add_source",
            audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(audio.size),
            pathf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(pathf.size))

    def simulate(self) -> np.ndarray:
        data_p = ctypes.POINTER(ctypes.c_float)()
        n_src = ctypes.c_int(0)
        n_samp = ctypes.c_int(0)
        self._call("simulator_simulate", ctypes.pointer(data_p),
                   ctypes.pointer(n_src), ctypes.pointer(n_samp))
        n_src, n_samp = n_src.value, n_samp.value
        audio = np.ctypeslib.as_array(
            data_p, shape=(n_src * n_samp,)).copy()
        audio = audio.reshape(n_src, n_samp // 2, 2)
        audio = np.transpose(audio, (0, 2, 1))  # [S, 2, T]
        self._call("simulator_cleanup")
        return audio

    def __del__(self):
        if getattr(self, "_p", None):
            self.lib.simulator_destroy(self._p)
            self._p = None


class CIPICMotionSimulator(CIPICSimulator):
    """CIPIC HRTFs with moving sources (reference CIPICMotionSimulator2,
    motion_simulator.py:97-278)."""

    def __init__(self, sofa_text_file: str, sr: int,
                 frame_duration: float = 0.025,
                 use_piecewise_arcs: bool = False) -> None:
        super().__init__(sofa_text_file, sr)
        self.sr = sr
        self.frame_duration = frame_duration
        self._simulator = MotionSimulator(sr, frame_duration)
        self.use_piecewise_arcs = use_piecewise_arcs

    # -- path generators ------------------------------------------------

    def get_piecewise_arc_path(self, rng: random.Random, t: np.ndarray):
        """Bernoulli-triggered movement bursts: the source rests, then
        with probability dt per frame starts a 0.1-1 s arc at angular
        speed U[pi/6, pi/2] (each sign random) in both angles."""
        theta0 = rng.uniform(0, 2 * np.pi)
        phi0 = rng.uniform(0, np.pi / 2)
        dt = t[1] - t[0]
        theta = np.zeros_like(t)
        phi = np.zeros_like(t)
        i = 0
        while i < len(t):
            if rng.random() < dt:
                seconds = rng.uniform(0.1, 1.0)
                nsteps = int(round(seconds / dt))
                wtheta = rng.uniform(np.pi / 6, np.pi / 2) \
                    * ((-1) ** rng.randint(0, 1))
                wphi = rng.uniform(np.pi / 6, np.pi / 2) \
                    * ((-1) ** rng.randint(0, 1))
                j = 0
                while i < len(t) and j < nsteps:
                    theta0 += wtheta * dt
                    phi0 += wphi * dt
                    theta[i] = theta0
                    phi[i] = phi0
                    i += 1
                    j += 1
            else:
                theta[i] = theta0
                phi[i] = phi0
                i += 1
        path = np.stack([np.sin(phi) * np.cos(theta),
                         np.sin(phi) * np.sin(theta),
                         np.cos(phi)], axis=1)
        return path, 0.0

    def get_random_source_path(self, rng: random.Random, t: np.ndarray):
        """Constant-angular-velocity arc at fixed coaltitude; returns
        (path (N,3), angular_velocity)."""
        if self.use_piecewise_arcs:
            return self.get_piecewise_arc_path(rng, t)
        theta0 = rng.uniform(0, np.pi / 2)
        w_theta = rng.uniform(-np.pi / 2, np.pi / 2)
        phi0 = rng.uniform(0, np.pi / 2)
        theta_t = theta0 + w_theta * t
        path = np.stack([np.sin(phi0) * np.cos(theta_t),
                         np.sin(phi0) * np.sin(theta_t),
                         np.cos(phi0) * np.ones_like(t)], axis=1)
        return path, w_theta

    def get_face_to_face_source_path(self, seed: int, t: np.ndarray):
        """Jittered frontal path for the enrollment target; returns
        (path, max_error_rad)."""
        rng = np.random.RandomState(seed)
        max_error = rng.uniform(0, np.pi / 10)
        theta_phi = rng.uniform(np.pi / 2 - max_error,
                                np.pi / 2 + max_error, size=(len(t), 2))
        path = np.stack([np.sin(theta_phi[:, 1]) * np.cos(theta_phi[:, 0]),
                         np.sin(theta_phi[:, 1]) * np.sin(theta_phi[:, 0]),
                         np.cos(theta_phi[:, 1])], axis=1)
        return path, max_error

    # -- simulate ---------------------------------------------------------

    def simulate(self, srcs, noise, seed=None, face_to_face_idx=None):
        simulation_time = srcs[0].shape[-1] / self.sr
        t = np.arange(0, self.frame_duration + simulation_time,
                      self.frame_duration)
        rng = random.Random(seed)
        hrtf = rng.choice(self.sofa_files)
        self._simulator.set_hrtf(hrtf)

        params = []
        for i, src in enumerate(srcs):
            if face_to_face_idx is not None and i == face_to_face_idx:
                path, param = self.get_face_to_face_source_path(seed, t)
            else:
                path, param = self.get_random_source_path(rng, t)
            params.append(param)
            self._simulator.add_source(src, path)
        noise_path, _ = self.get_random_source_path(rng, t)
        self._simulator.add_source(noise, noise_path)

        rendered = self._simulator.simulate()
        bi_srcs = [rendered[i] for i in range(len(srcs))]
        bi_noise = rendered[-1]
        return bi_srcs, bi_noise, params


class RRBRIRMotionSimulator(CIPICMotionSimulator):
    """RRBRIR inventory: azimuth limited to [-90, 90] at 0 elevation,
    radius 1.5 m (reference motion_simulator.py:280-326)."""

    def get_random_source_path(self, rng: random.Random, t: np.ndarray):
        theta0 = rng.uniform(-np.pi / 2, np.pi / 2)
        w_theta = rng.uniform(-np.pi / 2, np.pi / 2)
        r = 1.5
        phi0 = np.pi / 2
        theta_t = theta0 + w_theta * t
        path = np.stack([np.abs(r * np.sin(phi0) * np.cos(theta_t)),
                         r * np.sin(phi0) * np.sin(theta_t),
                         r * np.cos(phi0) * np.ones_like(t)], axis=1)
        return path, w_theta

    def get_face_to_face_source_path(self, seed: int, t: np.ndarray):
        rng = np.random.RandomState(seed)
        r = 1.5
        theta_phi = rng.multivariate_normal(
            mean=[0, np.pi / 2], cov=[[np.pi / 30, 0], [0, 0]],
            size=len(t))
        theta_phi[:, 0] = np.clip(theta_phi[:, 0], -np.pi / 2, np.pi / 2)
        path = np.stack([r * np.sin(theta_phi[:, 1])
                         * np.cos(theta_phi[:, 0]),
                         r * np.sin(theta_phi[:, 1])
                         * np.sin(theta_phi[:, 0]),
                         r * np.cos(theta_phi[:, 1])], axis=1)
        return path, 0.0
