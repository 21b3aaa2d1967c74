"""Native host-runtime components (C++ via ctypes).

``AudioFrontend`` wraps runtime/audio_frontend.cpp — WAV decode, polyphase
resample, and Kaldi fbank in C++ — as the fast path of the data pipeline
(the reference leans on librosa/soxr/torchaudio for the same work, SURVEY
§2.2). Falls back cleanly when no compiler is available; numerics are
parity-tested against the Python/JAX paths in tests/test_runtime.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_SRC_DIR, "libaudiofe.so")


def _build() -> Optional[str]:
    src = os.path.join(_SRC_DIR, "audio_frontend.cpp")
    if (os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src)):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", src,
             "-o", _LIB_PATH],
            check=True, capture_output=True, cwd=_SRC_DIR)
        return _LIB_PATH
    except (OSError, subprocess.CalledProcessError):
        return None


class AudioFrontend:
    """Native WAV->fbank pipeline. Raises RuntimeError if the native build
    is unavailable — callers fall back to synergy_tpu.data.audio."""

    MAX_FRAMES = 1024
    NUM_MEL = 128

    def __init__(self):
        lib_path = _build()
        if lib_path is None:
            raise RuntimeError("native audio frontend build failed")
        lib = ctypes.CDLL(lib_path)
        lib.af_create.restype = ctypes.c_void_p
        lib.af_destroy.argtypes = [ctypes.c_void_p]
        lib.af_read_wav.restype = ctypes.c_int32
        lib.af_read_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        lib.af_resample.restype = ctypes.c_int32
        lib.af_resample.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32]
        lib.af_fbank.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32]
        lib.af_stretch.restype = ctypes.c_int32
        lib.af_stretch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.c_double, ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
        self._lib = lib
        self._handle = lib.af_create()

    def __del__(self):
        try:
            self._lib.af_destroy(self._handle)
        except Exception:
            pass

    @staticmethod
    def _fptr(a: np.ndarray):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def read_wav(self, path: str, max_seconds: float = 60.0
                 ) -> Tuple[np.ndarray, int]:
        max_samples = int(max_seconds * 48000)
        buf = np.empty(max_samples, np.float32)
        sr = ctypes.c_int32(0)
        n = self._lib.af_read_wav(path.encode(), self._fptr(buf), max_samples,
                                  ctypes.byref(sr))
        if n < 0:
            raise IOError(f"failed to read WAV {path}")
        return buf[:n].copy(), int(sr.value)

    def resample(self, wave: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
        wave = np.ascontiguousarray(wave, np.float32)
        max_out = int(len(wave) * sr_out / sr_in) + 16
        out = np.empty(max_out, np.float32)
        n = self._lib.af_resample(self._handle, self._fptr(wave), len(wave),
                                  sr_in, sr_out, self._fptr(out), max_out)
        return out[:n].copy()

    def fbank(self, wave: np.ndarray, normalize: bool = True) -> np.ndarray:
        wave = np.ascontiguousarray(wave, np.float32)
        out = np.empty((self.MAX_FRAMES, self.NUM_MEL), np.float32)
        self._lib.af_fbank(self._handle, self._fptr(wave), len(wave),
                           self._fptr(out), self.MAX_FRAMES, int(normalize))
        return out

    def stretch(self, wave: np.ndarray, rate: float) -> Optional[np.ndarray]:
        """Phase-vocoder time stretch (n_fft=2048, hop=512) — the augment
        stack's hot op, GIL-free. Same algorithm as data/audio.stretch_data
        (double internals, so it tracks that function's f64 reference).
        Returns None when the input is shorter than one FFT frame (callers
        keep the input, matching the numpy path)."""
        wave = np.ascontiguousarray(wave, np.float32)
        n_frames = 1 + max(0, (len(wave) - 2048)) // 512
        max_out = 2048 + 512 * int(np.ceil(n_frames / rate) + 1)
        out = np.empty(max_out, np.float32)
        n = self._lib.af_stretch(self._handle, self._fptr(wave), len(wave),
                                 float(rate), self._fptr(out), max_out)
        if n < 0:
            return None
        return out[:n].copy()

    def load_for_ast(self, path: str) -> np.ndarray:
        """WAV file -> normalized (1024, 128) fbank at 16 kHz, end to end."""
        wave, sr = self.read_wav(path)
        if sr != 16000:
            wave = self.resample(wave, sr, 16000)
        return self.fbank(wave)


_frontend: Optional[AudioFrontend] = None


def get_audio_frontend() -> Optional[AudioFrontend]:
    """Singleton; None when the native path is unavailable."""
    global _frontend
    if _frontend is None:
        try:
            _frontend = AudioFrontend()
        except (RuntimeError, OSError):
            return None
    return _frontend
