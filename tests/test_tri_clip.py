"""TriCLIP forward + 3-pair InfoNCE semantics, including parity of the
global-vs-grouped negatives math against a torch oracle of the reference loss."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from synergy_tpu.configs import CLIPConfig
from synergy_tpu.losses import clip_loss, l2_normalize, tri_clip_loss
from synergy_tpu.models.tri_clip import TriCLIP


@pytest.fixture(scope="module")
def tiny_model():
    cfg = CLIPConfig.tiny()
    model = TriCLIP(cfg)
    key = jax.random.PRNGKey(0)
    pixel = jnp.zeros((2, 3, cfg.vision.image_size, cfg.vision.image_size))
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    fbank = jnp.zeros((2, cfg.audio.max_length, cfg.audio.num_mel_bins))
    params = jax.jit(model.init)(key, pixel, ids, mask, fbank)["params"]
    return cfg, model, params


def _torch_clip_loss(sim):
    t = torch.from_numpy(np.asarray(sim))
    labels = torch.arange(len(t))
    return ((TF.cross_entropy(t, labels) + TF.cross_entropy(t.t(), labels)) / 2).item()


def test_clip_loss_matches_torch(rng):
    sim = rng.standard_normal((6, 6)).astype(np.float32) * 3
    ours = float(clip_loss(jnp.asarray(sim)))
    ref = _torch_clip_loss(sim)
    assert abs(ours - ref) < 1e-5


def test_tri_clip_loss_grouping(rng):
    """num_groups=2 must equal the mean of two independent half-batch losses
    (the reference's 2-rank DDP local-negatives semantics)."""
    d = 16
    img = l2_normalize(jnp.asarray(rng.standard_normal((8, d)), jnp.float32))
    txt = l2_normalize(jnp.asarray(rng.standard_normal((8, d)), jnp.float32))
    aud = l2_normalize(jnp.asarray(rng.standard_normal((8, d)), jnp.float32))
    s = jnp.asarray(2.6592)
    grouped = tri_clip_loss(img, txt, aud, s, s, s, num_groups=2)
    halves = [
        tri_clip_loss(img[:4], txt[:4], aud[:4], s, s, s, num_groups=1),
        tri_clip_loss(img[4:], txt[4:], aud[4:], s, s, s, num_groups=1),
    ]
    for i in range(3):
        expected = (float(halves[0][i]) + float(halves[1][i])) / 2
        assert abs(float(grouped[i]) - expected) < 1e-5


def test_tri_clip_forward_and_scales(tiny_model):
    cfg, model, params = tiny_model
    rng = np.random.default_rng(0)
    pixel = jnp.asarray(rng.standard_normal(
        (4, 3, cfg.vision.image_size, cfg.vision.image_size)), jnp.float32)
    ids = jnp.asarray(rng.integers(4, cfg.text.vocab_size, (4, 8)), jnp.int32)
    mask = jnp.ones((4, 8), jnp.int32)
    fbank = jnp.asarray(rng.standard_normal(
        (4, cfg.audio.max_length, cfg.audio.num_mel_bins)), jnp.float32)
    out = model.apply({"params": params}, pixel, ids, mask, fbank)
    for k in ("image_embeds", "text_embeds", "audio_embeds"):
        emb = np.asarray(out[k])
        assert emb.shape == (4, cfg.projection_dim)
        np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)
    assert float(out["logit_scale_IT"]) == pytest.approx(2.6592)
    losses = tri_clip_loss(
        out["image_embeds"], out["text_embeds"], out["audio_embeds"],
        out["logit_scale_IT"], out["logit_scale_TA"], out["logit_scale_AI"])
    for l in losses:
        assert np.isfinite(float(l))


@pytest.mark.slow
def test_sim_scores(tiny_model):
    cfg, model, params = tiny_model
    rng = np.random.default_rng(1)
    pixel = jnp.asarray(rng.standard_normal(
        (2, 3, cfg.vision.image_size, cfg.vision.image_size)), jnp.float32)
    ids = jnp.asarray(rng.integers(4, cfg.text.vocab_size, (5, 8)), jnp.int32)
    mask = jnp.ones((5, 8), jnp.int32)
    sim = model.apply({"params": params}, pixel, ids, mask,
                      method=TriCLIP.get_img_txt_sim_score)
    assert sim.shape == (2, 5)
    fbank = jnp.asarray(rng.standard_normal(
        (3, cfg.audio.max_length, cfg.audio.num_mel_bins)), jnp.float32)
    sim2 = model.apply({"params": params}, fbank, ids, mask,
                       method=TriCLIP.get_aud_txt_sim_score)
    assert sim2.shape == (5, 3)  # text x audio, as in reference model.py:201-203
