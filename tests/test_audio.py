"""Audio front-end parity vs the HF AST feature extractor (numpy fallback),
the exact code path the reference exercises via AutoProcessor
(reference dataset.py:146-149)."""

import numpy as np
import pytest

from synergy_tpu.data import audio as A


@pytest.fixture(scope="module")
def hf_extractor():
    from transformers import ASTFeatureExtractor

    return ASTFeatureExtractor()


def _waves(rng):
    return [
        rng.standard_normal(16000).astype(np.float32) * 0.1,          # 1s
        rng.standard_normal(160000).astype(np.float32) * 0.05,        # 10s
        np.sin(2 * np.pi * 440 * np.arange(48000) / 16000).astype(np.float32),
        rng.standard_normal(200000).astype(np.float32) * 0.2,         # >10.24s
        rng.standard_normal(399).astype(np.float32),                  # < one frame
    ]


def test_mel_filters_match_hf():
    from transformers.audio_utils import mel_filter_bank

    ref = mel_filter_bank(
        num_frequency_bins=257, num_mel_filters=128, min_frequency=20,
        max_frequency=8000, sampling_rate=16000, norm=None,
        mel_scale="kaldi", triangularize_in_mel_space=True)
    ours = A.kaldi_mel_filters()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_fbank_f64_matches_ast_extractor_exactly(hf_extractor, rng):
    """The float64 twin must match HF's numpy fbank to ~1e-5 — this pins the
    algorithm (framing, DC offset, preemphasis, window, FFT, mel, log, pad,
    normalize) exactly."""
    for wave in _waves(rng):
        ref = hf_extractor(wave, sampling_rate=16000, return_tensors="np")
        ref = ref["input_values"][0]
        ours = A.extract_fbank_f64(wave)
        assert ours.shape == ref.shape == (1024, 128)
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_fbank_matches_ast_extractor(hf_extractor, rng):
    """The float32 JAX path agrees within f32 FFT precision (TPU has no f64)."""
    for wave in _waves(rng):
        ref = hf_extractor(wave, sampling_rate=16000, return_tensors="np")
        ref = ref["input_values"][0]
        ours = A.extract_fbank(wave)
        assert ours.shape == ref.shape == (1024, 128)
        np.testing.assert_allclose(ours, ref, atol=2e-3)
        assert np.abs(ours - ref).mean() < 2e-4


def test_fbank_batch_jit(rng):
    waves = np.stack([rng.standard_normal(32000).astype(np.float32) for _ in range(3)])
    out = A.log_mel_fbank_batch(waves)
    assert out.shape == (3, 1024, 128)
    single = A.extract_fbank(waves[1])
    # vmap/jit may fuse FFT differently; bound by f32 precision
    np.testing.assert_allclose(np.asarray(out[1]), single, atol=2e-3)


def test_augmentations_semantics(rng):
    data = rng.standard_normal(16000).astype(np.float32)
    assert np.allclose(A.minus_sound(data), -data)
    shifted = A.shift_data(data, rate=0.1)
    assert np.allclose(shifted, np.roll(data, 1600))
    noisy = A.add_white_noise(data, rate=0.005, rng=np.random.default_rng(0))
    assert 0 < np.abs(noisy - data).max() < 0.05
    stretched = A.stretch_data(data, rate=0.5)
    assert len(stretched) > len(data) * 1.5  # slower rate -> longer audio
    out = A.audio_augment(data, apply_rate=0.0, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(out, data)  # apply_rate=0 is identity


def _stretch_loop_reference(data, rate, n_fft=2048, hop=512):
    """Frame-by-frame phase vocoder (the original implementation) kept as the
    oracle for the vectorized stretch_data."""
    window = np.hanning(n_fft)
    n_frames = 1 + (len(data) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    stft = np.fft.rfft(data[idx] * window, axis=-1).T
    time_steps = np.arange(0, n_frames, rate)
    phi_advance = np.linspace(0, np.pi * hop, stft.shape[0])
    stretched = np.zeros((stft.shape[0], len(time_steps)), dtype=complex)
    phase_acc = np.angle(stft[:, 0])
    for t, step in enumerate(time_steps):
        i0 = int(step)
        i1 = min(i0 + 1, n_frames - 1)
        frac = step - i0
        mag = (1 - frac) * np.abs(stft[:, i0]) + frac * np.abs(stft[:, i1])
        stretched[:, t] = mag * np.exp(1j * phase_acc)
        dphase = np.angle(stft[:, i1]) - np.angle(stft[:, i0]) - phi_advance
        dphase -= 2 * np.pi * np.round(dphase / (2 * np.pi))
        phase_acc += phi_advance + dphase
    frames = np.fft.irfft(stretched.T, n=n_fft, axis=-1) * window
    out_len = n_fft + hop * (frames.shape[0] - 1)
    out = np.zeros(out_len)
    norm = np.zeros(out_len)
    for t in range(frames.shape[0]):
        out[t * hop: t * hop + n_fft] += frames[t]
        norm[t * hop: t * hop + n_fft] += window ** 2
    out /= np.maximum(norm, 1e-8)
    return out


def test_stretch_vectorization_matches_loop_reference(rng):
    """The vectorized vocoder (cumsum phase accumulator + strided overlap-add)
    must reproduce the sequential loop implementation: f64 to float rounding,
    f32 to the precision class librosa itself delivers on float32 input."""
    data = rng.standard_normal(40960)
    for rate in (0.5, 0.85, 1.3):
        ref = _stretch_loop_reference(data, rate)
        got64 = A.stretch_data(data, rate=rate)
        assert got64.shape == ref.shape
        np.testing.assert_allclose(got64, ref, atol=1e-6)
        got32 = A.stretch_data(data.astype(np.float32), rate=rate)
        assert got32.dtype == np.float32
        assert got32.shape == ref.shape
        rel_rms = (np.sqrt(np.mean((got32 - ref) ** 2))
                   / np.sqrt(np.mean(ref ** 2)))
        assert rel_rms < 0.05, rel_rms


def test_augment_preserves_float32(rng):
    """The pipeline wave is float32; an f64 upcast anywhere in the aug stack
    silently doubles every downstream host cost (bench_pipeline.py)."""
    data = rng.standard_normal(32000).astype(np.float32)
    assert A.add_white_noise(data, rng=np.random.default_rng(0)).dtype == np.float32
    assert A.stretch_data(data, rate=0.8).dtype == np.float32
    for i in range(8):
        out = A.audio_augment(data, apply_rate=1.0,
                              rng=np.random.default_rng(i))
        assert out.dtype == np.float32


def test_resample(rng):
    t = np.arange(22050 * 2) / 22050.0
    wave = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = A.resample(wave, 22050, 16000)
    assert abs(len(out) - 32000) <= 1
    # the 440 Hz tone must survive resampling
    spec = np.abs(np.fft.rfft(out[:16000]))
    assert abs(np.argmax(spec) - 440) <= 2


def test_read_wav_roundtrip(tmp_path, rng):
    import wave as wavmod

    data = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    pcm = (np.clip(data, -1, 1) * 32767).astype("<i2")
    p = tmp_path / "t.wav"
    with wavmod.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    out, sr = A.read_wav(str(p))
    assert sr == 16000
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0, atol=1e-6)


def test_ragged_fbank_matches_extract(rng):
    """Batched ragged fbank (fixed padded shape + true lengths) must equal
    per-waveform extract_fbank for every length — the augmentation path's
    no-recompile handle."""
    from synergy_tpu.data.audio import (
        FRAME_LENGTH, HOP_LENGTH, extract_fbank, log_mel_fbank_ragged,
    )

    import jax.numpy as jnp

    max_frames = 24
    n_fixed = FRAME_LENGTH + (max_frames - 1) * HOP_LENGTH
    lengths = [n_fixed, 2500, 701, FRAME_LENGTH, FRAME_LENGTH - 1]
    padded = np.zeros((len(lengths), n_fixed), np.float32)
    for i, n in enumerate(lengths):
        padded[i, :n] = rng.standard_normal(n).astype(np.float32) * 0.1
    out = np.asarray(log_mel_fbank_ragged(
        jnp.asarray(padded), jnp.asarray(np.asarray(lengths, np.int32)),
        max_frames=max_frames))
    for i, n in enumerate(lengths):
        ref = extract_fbank(padded[i, :n], max_frames=max_frames)
        np.testing.assert_allclose(out[i], ref, atol=1e-5, rtol=1e-5)
