"""MMR stack tests: pixel shuffle / SSIM / decoder parity vs torch primitives,
and the stage-2 CLI end-to-end in tiny synthetic mode."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from synergy_tpu.losses import mmr_text_loss, resize_bicubic
from synergy_tpu.ops.pixel_shuffle import pixel_shuffle_nchw, pixel_shuffle_nhwc
from synergy_tpu.ops.ssim import ssim


def test_pixel_shuffle_matches_torch(rng):
    x = rng.standard_normal((2, 16, 4, 5)).astype(np.float32)
    ref = TF.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    ours = np.asarray(pixel_shuffle_nchw(jnp.asarray(x), 2))
    np.testing.assert_allclose(ours, ref, atol=1e-7)
    # NHWC variant agrees after layout conversion
    nhwc = np.asarray(pixel_shuffle_nhwc(jnp.asarray(x.transpose(0, 2, 3, 1)), 2))
    np.testing.assert_allclose(nhwc.transpose(0, 3, 1, 2), ref, atol=1e-7)


def test_resize_bicubic_matches_torch(rng):
    x = rng.random((2, 3, 224, 224)).astype(np.float32)
    ref = TF.interpolate(torch.from_numpy(x), size=(128, 128), mode="bicubic",
                         align_corners=False).numpy()
    ours = np.asarray(resize_bicubic(jnp.asarray(x), (128, 128)))
    assert np.abs(ours - ref).max() < 1e-4
    up = np.asarray(resize_bicubic(jnp.asarray(x[..., :64, :64]), (128, 128)))
    ref_up = TF.interpolate(torch.from_numpy(x[..., :64, :64]), size=(128, 128),
                            mode="bicubic", align_corners=False).numpy()
    assert np.abs(up - ref_up).max() < 1e-4


def test_ssim_properties(rng):
    a = jnp.asarray(rng.random((2, 3, 64, 64)), jnp.float32)
    assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
    noisy = jnp.clip(a + 0.2 * jnp.asarray(rng.standard_normal(a.shape)), 0, 1)
    v = float(ssim(a, noisy))
    assert 0.0 < v < 0.9
    assert float(ssim(a, noisy)) == pytest.approx(float(ssim(noisy, a)), abs=1e-6)


def test_ssim_against_reference_impl(rng):
    """Oracle: classic Wang et al. SSIM in numpy float64 (gaussian 11/1.5,
    valid padding) — the same spec pytorch_msssim implements."""
    from scipy.ndimage import correlate1d

    def np_ssim(x, y, dr=1.0):
        coords = np.arange(11) - 5
        g = np.exp(-(coords ** 2) / (2 * 1.5 ** 2)); g /= g.sum()
        def blur(z):
            z = correlate1d(z, g, axis=-2, mode="constant")
            z = correlate1d(z, g, axis=-1, mode="constant")
            return z[..., 5:-5, 5:-5]
        c1, c2 = (0.01 * dr) ** 2, (0.03 * dr) ** 2
        mx, my = blur(x), blur(y)
        sxx = blur(x * x) - mx * mx
        syy = blur(y * y) - my * my
        sxy = blur(x * y) - mx * my
        m = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
            (mx ** 2 + my ** 2 + c1) * (sxx + syy + c2))
        return m.mean()

    x = rng.random((1, 1, 40, 40)).astype(np.float64)
    y = np.clip(x + 0.1 * rng.standard_normal(x.shape), 0, 1)
    ref = np_ssim(x, y)
    ours = float(ssim(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)))
    assert abs(ours - ref) < 1e-4


def test_mmr_text_loss(rng):
    logits = rng.standard_normal((2, 8, 50)).astype(np.float32)
    ids = rng.integers(0, 50, (2, 8))
    ce, acc, zero = mmr_text_loss(jnp.asarray(logits), jnp.asarray(ids))
    ref = TF.cross_entropy(torch.from_numpy(logits).reshape(-1, 50),
                           torch.from_numpy(ids).reshape(-1)).item()
    assert abs(float(ce) - ref) < 1e-5
    assert 0.0 <= float(acc) <= 1.0 and float(zero) == 0.0


@pytest.mark.slow
def test_decoder_shapes():
    from synergy_tpu.models.mmr import AUDDecoder, IMGDecoder, TXTDecoder
    from synergy_tpu.train.mmr import tiny_recon_config

    cfg = tiny_recon_config()
    key = jax.random.PRNGKey(0)
    emb = jnp.zeros((2, cfg.decoder_dim))
    img_dec = IMGDecoder(cfg)
    out, _ = img_dec.init_with_output(key, emb)
    assert out.shape == (2, cfg.img_channels, cfg.img_size, cfg.img_size)
    aud_dec = AUDDecoder(cfg)
    out, _ = aud_dec.init_with_output(key, emb)
    assert out.shape == (2, *cfg.aud_size)
    txt_dec = TXTDecoder(cfg)
    out, _ = txt_dec.init_with_output(key, emb[:, None, :])
    assert out.shape == (2, cfg.text_length, cfg.clip.text.vocab_size)


def test_base_decoder_shapes():
    """Base config geometry: 128x128 RGB and 256x64 spectrogram
    (reference config.py:146-192)."""
    from synergy_tpu.configs import ReconstructionConfig
    from synergy_tpu.models.mmr import AUDDecoder, IMGDecoder

    cfg = ReconstructionConfig.base()
    emb = jnp.zeros((1, cfg.decoder_dim))
    out = jax.eval_shape(
        lambda e: IMGDecoder(cfg).init_with_output(jax.random.PRNGKey(0), e)[0],
        emb)
    assert out.shape == (1, 3, 128, 128)
    out = jax.eval_shape(
        lambda e: AUDDecoder(cfg).init_with_output(jax.random.PRNGKey(0), e)[0],
        emb)
    assert out.shape == (1, 256, 64)


@pytest.mark.parametrize("mm", [
    pytest.param("aud", marks=pytest.mark.slow),
    pytest.param("img", marks=pytest.mark.slow),
    pytest.param("txt", marks=pytest.mark.slow),
])
def test_mmr_cli_tiny(tmp_path, mm):
    from synergy_tpu.train.mmr import main

    w = main([
        "--tiny", "true", "--synthetic", "true", "--MM", mm,
        "--epochs", "3", "--batch_size", "4", "--deploy_samples", "2",
        "--ckpt_dir", str(tmp_path / "none"), "--out_dir", str(tmp_path / "inf"),
    ])
    assert w is not None
    out_dir = tmp_path / "inf" / "base_caption" / mm
    assert any(out_dir.iterdir())


@pytest.mark.slow
def test_mmr_cli_multi_batch(tmp_path, capsys):
    """``--single_batch false`` runs a conventional multi-batch loop: the
    synthetic dataset holds 4 batches, frozen features are recomputed per
    batch, and the loss decreases across epochs."""
    import re

    from synergy_tpu.train.mmr import main

    w = main([
        "--tiny", "true", "--synthetic", "true", "--MM", "img",
        "--single_batch", "false", "--epochs", "2", "--batch_size", "4",
        "--deploy_samples", "1", "--learning_rate", "1e-2",
        "--ckpt_dir", str(tmp_path / "none"), "--out_dir", str(tmp_path / "inf"),
    ])
    assert w is not None
    out = capsys.readouterr().out
    m = re.search(r"trained 2 epochs \((\d+) steps\)", out)
    assert m, out
    assert int(m.group(1)) == 8  # 2 epochs x 4 batches
    losses = [float(x) for x in re.findall(r"loss=([0-9.]+)", out)]
    assert len(losses) == 2 and losses[-1] < losses[0], losses


def test_mrl_save_load_roundtrip(tmp_path):
    """The MRL artifact must round-trip params AND batch_stats (the txt
    decoder's BatchNorm running stats are part of the trained model), and
    still load legacy params-only files with template stats."""
    from flax import serialization

    from synergy_tpu.train.mmr import load_mrl, save_mrl

    params = {"dense": {"kernel": np.arange(4, dtype=np.float32).reshape(2, 2)}}
    stats = {"bn": {"mean": np.full((3,), 2.5, np.float32),
                    "var": np.full((3,), 0.25, np.float32)}}
    save_mrl(str(tmp_path / "cur"), params, stats)
    zp = jax.tree_util.tree_map(np.zeros_like, params)
    zs = jax.tree_util.tree_map(np.zeros_like, stats)
    p2, s2 = load_mrl(str(tmp_path / "cur"), zp, zs)
    np.testing.assert_array_equal(p2["dense"]["kernel"],
                                  params["dense"]["kernel"])
    np.testing.assert_array_equal(s2["bn"]["mean"], stats["bn"]["mean"])

    legacy = tmp_path / "legacy"
    legacy.mkdir()
    with open(legacy / "MRL_model.msgpack", "wb") as f:
        f.write(serialization.to_bytes(params))
    p3, s3 = load_mrl(str(legacy), zp, stats)
    np.testing.assert_array_equal(p3["dense"]["kernel"],
                                  params["dense"]["kernel"])
    np.testing.assert_array_equal(s3["bn"]["var"], stats["bn"]["var"])
