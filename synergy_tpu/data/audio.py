"""Audio front-end: waveform -> Kaldi-style 128-bin log-mel fbank, plus the
host-side augmentations the reference applies before feature extraction.

Replaces two native dependency surfaces of the reference:
  * AST AutoProcessor feature extraction (reference dataset.py:146-149) —
    torchaudio's Kaldi fbank. We reproduce the exact numerics of the AST
    extractor: 25ms/10ms frames (400/160 samples @16kHz), per-frame DC-offset
    removal, preemphasis 0.97, periodic=False Hann window, 512-point rFFT,
    power spectrum, 128 Kaldi-scale mel filters (20Hz-8kHz, triangularized in
    mel space, no norm), log with floor 1.1921e-7, pad/truncate to 1024
    frames, then (x - mean) / (2*std) normalization.
    ``log_mel_fbank`` is pure JAX (jit/vmap-able, runs fused on TPU);
    parity vs the HF extractor is asserted in tests/test_audio.py.
  * librosa resample / time-stretch / noise / shift / polarity augmentations
    (reference utils.py:54-80, dataset.py:143-145) — host-side numpy, same
    sampling semantics.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

AST_MEAN = -4.2677393
AST_STD = 4.5689974
SAMPLE_RATE = 16000
FRAME_LENGTH = 400
HOP_LENGTH = 160
FFT_LENGTH = 512
NUM_MEL_BINS = 128
MEL_FLOOR = 1.192092955078125e-07
PREEMPHASIS = 0.97
MAX_FRAMES = 1024


def hz_to_mel_kaldi(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq, np.float64) / 700.0)


def mel_to_hz_kaldi(mel):
    return 700.0 * (np.exp(np.asarray(mel, np.float64) / 1127.0) - 1.0)


@functools.lru_cache()
def kaldi_mel_filters(num_freq_bins: int = 257, num_mel: int = NUM_MEL_BINS,
                      fmin: float = 20.0, fmax: float = SAMPLE_RATE / 2,
                      sr: int = SAMPLE_RATE) -> np.ndarray:
    """(num_freq_bins, num_mel) triangular filters on the Kaldi mel scale,
    triangularized in mel space, unnormalized (matches HF mel_filter_bank with
    mel_scale='kaldi', triangularize_in_mel_space=True, norm=None)."""
    mel_min = hz_to_mel_kaldi(fmin)
    mel_max = hz_to_mel_kaldi(fmax)
    mel_points = np.linspace(mel_min, mel_max, num_mel + 2)
    # FFT bin frequencies, expressed in mel space
    fft_freqs = np.linspace(0, sr / 2, num_freq_bins)
    fft_bin_width = sr / ((num_freq_bins - 1) * 2)
    mel_of_bins = hz_to_mel_kaldi(fft_bin_width * np.arange(num_freq_bins))
    lower = mel_points[:-2][None, :]
    center = mel_points[1:-1][None, :]
    upper = mel_points[2:][None, :]
    up_slope = (mel_of_bins[:, None] - lower) / (center - lower)
    down_slope = (upper - mel_of_bins[:, None]) / (upper - center)
    fb = np.maximum(0.0, np.minimum(up_slope, down_slope))
    return fb.astype(np.float32)


@functools.lru_cache()
def _hann_window(length: int = FRAME_LENGTH) -> np.ndarray:
    # periodic=False ("symmetric") Hann, as used by the AST extractor
    n = np.arange(length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / (length - 1))).astype(np.float32)


def num_frames_for(num_samples: int) -> int:
    return max(0, 1 + (num_samples - FRAME_LENGTH) // HOP_LENGTH)


def log_mel_fbank(waveform: jnp.ndarray, num_frames: Optional[int] = None,
                  max_frames: int = MAX_FRAMES, normalize: bool = True) -> jnp.ndarray:
    """Waveform (fixed static length) -> (max_frames, 128) normalized fbank.

    Pure JAX; jit/vmap over a batch of equal-length waveforms. ``num_frames``
    defaults to the number of full frames in the waveform; shorter content
    should be zero-padded on the host to the static length first.
    """
    n = waveform.shape[-1]
    frames_avail = num_frames_for(n)
    nf = frames_avail if num_frames is None else num_frames
    nf = min(nf, max_frames) if nf else 0

    wave = waveform.astype(jnp.float32)
    idx = jnp.arange(nf)[:, None] * HOP_LENGTH + jnp.arange(FRAME_LENGTH)[None, :]
    frames = wave[idx]  # (nf, 400)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    pre = frames.at[:, 1:].add(-PREEMPHASIS * frames[:, :-1])
    pre = pre.at[:, 0].multiply(1.0 - PREEMPHASIS)
    windowed = pre * jnp.asarray(_hann_window())
    padded = jnp.pad(windowed, ((0, 0), (0, FFT_LENGTH - FRAME_LENGTH)))
    spec = jnp.fft.rfft(padded, n=FFT_LENGTH, axis=-1)
    power = jnp.abs(spec) ** 2  # (nf, 257)
    mel = jnp.maximum(MEL_FLOOR, power @ jnp.asarray(kaldi_mel_filters()))
    fbank = jnp.log(mel)  # (nf, 128)
    if nf < max_frames:
        fbank = jnp.pad(fbank, ((0, max_frames - nf), (0, 0)))
    if normalize:
        fbank = (fbank - AST_MEAN) / (2.0 * AST_STD)
    return fbank


@functools.partial(jax.jit, static_argnames=("max_frames", "normalize"))
def log_mel_fbank_batch(waveforms: jnp.ndarray, max_frames: int = MAX_FRAMES,
                        normalize: bool = True) -> jnp.ndarray:
    """(B, num_samples) -> (B, max_frames, 128)."""
    return jax.vmap(lambda w: log_mel_fbank(w, None, max_frames, normalize))(waveforms)


@functools.partial(jax.jit, static_argnames=("max_frames", "normalize"))
def log_mel_fbank_ragged(waves: jnp.ndarray, lengths: jnp.ndarray,
                         max_frames: int = MAX_FRAMES,
                         normalize: bool = True) -> jnp.ndarray:
    """(B, N_padded) zero-padded waveforms + true sample counts ->
    (B, max_frames, 128), identical to ``extract_fbank`` on each unpadded
    waveform but with one static shape for every length (no per-length
    recompiles — the handle for host-side augmentation whose stretch step
    changes waveform length). Frames are only valid when their whole window
    lies inside the true length, exactly the extractor's frame count, so the
    zero tail never leaks into an unmasked frame; masked rows carry the same
    raw-0-then-normalize value the extractor pads with."""

    def one(wave, n):
        fb = log_mel_fbank(wave, None, max_frames, normalize=False)
        nf = jnp.clip(1 + (n - FRAME_LENGTH) // HOP_LENGTH, 0, max_frames)
        fb = jnp.where(jnp.arange(max_frames)[:, None] < nf, fb, 0.0)
        if normalize:
            fb = (fb - AST_MEAN) / (2.0 * AST_STD)
        return fb

    return jax.vmap(one)(waves, lengths)


def extract_fbank(waveform: np.ndarray, max_frames: int = MAX_FRAMES,
                  normalize: bool = True) -> np.ndarray:
    """Host convenience API for arbitrary-length waveforms (AST extractor
    equivalent, reference dataset.py:146-149)."""
    wave = np.asarray(waveform, np.float32)
    return np.asarray(log_mel_fbank(jnp.asarray(wave), None, max_frames, normalize))


def extract_fbank_f64(waveform: np.ndarray, max_frames: int = MAX_FRAMES,
                      normalize: bool = True) -> np.ndarray:
    """Float64 numpy twin of ``log_mel_fbank`` (same algorithm, full
    precision). Used for exact parity checks against the HF extractor; the
    JAX path is float32 (TPU has no f64) and agrees to ~1e-3 in normalized
    units."""
    wave = np.asarray(waveform, np.float64)
    nf = min(num_frames_for(len(wave)), max_frames)
    idx = np.arange(nf)[:, None] * HOP_LENGTH + np.arange(FRAME_LENGTH)[None, :]
    frames = wave[idx]
    frames = frames - frames.mean(axis=-1, keepdims=True)
    pre = frames.copy()
    pre[:, 1:] -= PREEMPHASIS * frames[:, :-1]
    pre[:, 0] *= 1.0 - PREEMPHASIS
    windowed = pre * _hann_window().astype(np.float64)
    padded = np.pad(windowed, ((0, 0), (0, FFT_LENGTH - FRAME_LENGTH)))
    power = np.abs(np.fft.rfft(padded, n=FFT_LENGTH, axis=-1)) ** 2
    mel = np.maximum(MEL_FLOOR, power @ kaldi_mel_filters().astype(np.float64))
    fbank = np.log(mel)
    if nf < max_frames:
        fbank = np.pad(fbank, ((0, max_frames - nf), (0, 0)))
    if normalize:
        fbank = (fbank - AST_MEAN) / (2.0 * AST_STD)
    return fbank.astype(np.float32)


# ---------------------------------------------------------------------------
# Host-side augmentations (reference utils.py:54-80)
# ---------------------------------------------------------------------------

def add_white_noise(data: np.ndarray, sr: int = SAMPLE_RATE, rate: float = 0.005,
                    rng: Optional[np.random.Generator] = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    # noise drawn in the wave's own dtype: an f64 draw would silently upcast
    # the whole float32 pipeline wave, doubling every downstream aug's cost.
    # standard_normal only supports f32/f64 draws; other dtypes (ints, f16)
    # keep the old draw-in-f64 + upcast behavior.
    dtype = data.dtype if data.dtype in (np.float32, np.float64) else np.float64
    return data + np.asarray(rate, dtype) * rng.standard_normal(
        len(data), dtype=dtype)


def shift_data(data: np.ndarray, sr: int = SAMPLE_RATE, rate: float = 0.1) -> np.ndarray:
    return np.roll(data, int(len(data) * rate))


def minus_sound(data: np.ndarray, sr: int = SAMPLE_RATE, rate: float = 0.0) -> np.ndarray:
    return -data


def stretch_data(data: np.ndarray, sr: int = SAMPLE_RATE, rate: float = 0.75,
                 n_fft: int = 2048, hop: int = 512) -> np.ndarray:
    """Phase-vocoder time stretch (librosa.effects.time_stretch equivalent:
    STFT -> phase vocoder at ``rate`` -> iSTFT).

    Fully vectorized: the phase accumulator is a cumulative sum of per-step
    deltas (each delta depends only on neighbouring STFT columns), and the
    overlap-add decomposes into ``n_fft // hop`` strided block adds — the
    frame-by-frame Python loops made this the host pipeline's single largest
    per-sample cost (tools/bench_pipeline.py: ~21 ms of a ~32 ms triplet).
    Math runs in the wave's own precision — float32 in the pipeline, matching
    librosa, whose STFT yields complex64 for float32 input.

    At the default n_fft/hop a float32 wave routes to the C++ front-end's
    GIL-free implementation of the same algorithm (double internals;
    parity-tested in tests/test_runtime.py); set SYNERGY_NATIVE_STRETCH=off
    to force this numpy path."""
    if len(data) < n_fft:
        return data
    if (n_fft == 2048 and hop == 512 and data.dtype == np.float32
            and os.environ.get("SYNERGY_NATIVE_STRETCH", "on") != "off"):
        from synergy_tpu.runtime import get_audio_frontend

        fe = get_audio_frontend()
        if fe is not None:
            out = fe.stretch(data, rate)
            if out is not None:
                return out
    dtype = np.dtype(data.dtype if np.issubdtype(data.dtype, np.floating)
                     else np.float64)
    window = np.hanning(n_fft).astype(dtype)
    n_frames = 1 + (len(data) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    stft = np.fft.rfft(data.astype(dtype, copy=False)[idx] * window,
                       axis=-1).T  # (freq, time)

    time_steps = np.arange(0, n_frames, rate)
    phi_advance = np.linspace(0, np.pi * hop, stft.shape[0], dtype=dtype)
    i0 = time_steps.astype(np.int64)
    i1 = np.minimum(i0 + 1, n_frames - 1)
    frac = time_steps.astype(dtype) - i0.astype(dtype)
    mags = np.abs(stft)
    angles = np.angle(stft).astype(dtype, copy=False)
    mag = (1 - frac) * mags[:, i0] + frac * mags[:, i1]  # (freq, steps)
    dphase = angles[:, i1] - angles[:, i0] - phi_advance[:, None]
    dphase -= dtype.type(2 * np.pi) * np.round(dphase / dtype.type(2 * np.pi))
    # phase at step t = phase(frame 0) + sum_{k<t} (phi_advance + dphase_k).
    # The running sum reaches ~1e6 rad, where float32 carries no phase
    # information at all — accumulate in f64 (a few % of the call) and wrap
    # to (-pi, pi] before dropping back to the working precision.
    steps_delta = phi_advance[:, None].astype(np.float64) + dphase
    phase = angles[:, :1] + np.concatenate(
        [np.zeros((stft.shape[0], 1)),
         np.cumsum(steps_delta, axis=1)[:, :-1]], axis=1)
    phase = np.mod(phase + np.pi, 2 * np.pi).astype(dtype) - dtype.type(np.pi)
    # complex exp is ~7x the cost of real cos/sin on this path
    stretched = np.empty(phase.shape,
                         np.complex64 if dtype == np.float32 else np.complex128)
    stretched.real = mag * np.cos(phase)
    stretched.imag = mag * np.sin(phase)
    # inverse STFT (overlap-add): frames t and t + n_fft//hop never overlap,
    # so each residue class r adds as one contiguous (n_r, n_fft) block view
    frames = np.fft.irfft(stretched.T, n=n_fft, axis=-1).astype(
        dtype, copy=False) * window
    n_out_frames = frames.shape[0]
    out_len = n_fft + hop * (n_out_frames - 1)
    out = np.zeros(out_len, dtype)
    norm = np.zeros(out_len, dtype)
    w2 = window ** 2
    for r in range(n_fft // hop):
        sub = frames[r:: n_fft // hop]
        if not len(sub):
            continue
        view = out[r * hop: r * hop + len(sub) * n_fft]
        view.reshape(len(sub), n_fft)[:] += sub
        nview = norm[r * hop: r * hop + len(sub) * n_fft]
        nview.reshape(len(sub), n_fft)[:] += w2
    out /= np.maximum(norm, dtype.type(1e-8))
    return out.astype(data.dtype, copy=False)


def audio_augment(data: np.ndarray, sr: int = SAMPLE_RATE, noise_rate: float = 0.005,
                  shift_rate: float = 0.1, stretch_rate: float = 0.85,
                  is_shuffle: bool = True, apply_rate: float = 0.5,
                  rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Randomly-ordered augmentation stack, each applied with prob
    ``apply_rate`` (reference utils.py:67-80; pretraining uses apply_rate=0.2,
    dataset.py:145)."""
    rng = rng or np.random.default_rng()
    methods = [
        (add_white_noise, noise_rate),
        (shift_data, shift_rate),
        (stretch_data, stretch_rate),
        (minus_sound, 0.0),
    ]
    if is_shuffle:
        perm = rng.permutation(len(methods))
        methods = [methods[i] for i in perm]
    for method, rate in methods:
        if rng.random() < apply_rate:
            if method is add_white_noise:
                data = method(data, sr, rate, rng=rng)
            else:
                data = method(data, sr, rate)
    return data


def resample(data: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (librosa.resample equivalent; host-side)."""
    if orig_sr == target_sr:
        return data
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_sr, target_sr)
    return resample_poly(data, target_sr // g, orig_sr // g).astype(
        np.float32, copy=False)


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Minimal PCM/float WAV reader (mono-ized), no external audio deps."""
    import wave as wavmod

    with wavmod.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    return data, sr
