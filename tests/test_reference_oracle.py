"""Numerical oracle against the reference's OWN code (slow lane).

Every other parity test in this repo compares against HF modules or
hand-mirrored torch compositions; these import ``/root/reference/model.py``
itself (under tests/reference_shim.py's dependency shims) and pin our Flax
MMR stack and Tri_CLIP against the reference's first-party architecture —
the only custom model code the reference wrote (reference model.py:359-823,
205-281). Weights are random (no hub here); they are ported from the torch
modules via interop/{hf_port,mmr_port}.py, so any wiring divergence
(pixel-shuffle channel order, CBAM gating, fusion pooling, loss composition)
shows up as a numeric mismatch.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from hf_builders import build_hf_audio, build_hf_text, build_hf_vision
from reference_shim import load_reference

from synergy_tpu import losses
from synergy_tpu.configs import CLIPConfig, ReconstructionConfig
from synergy_tpu.interop import hf_port
from synergy_tpu.interop.mmr_port import port_mmr_wrapper
from synergy_tpu.models import mmr
from synergy_tpu.models.ast import ASTModel
from synergy_tpu.models.roberta import RobertaModel
from synergy_tpu.models.tri_clip import TriCLIP
from synergy_tpu.models.vit import ViTModel

pytestmark = pytest.mark.slow

TOL = 1e-4
# decoder-level oracles run both sides in float64, where an exact port
# measures ~4e-14; 1e-8 rules out any wiring difference while leaving room
# for legitimate transcendental (erf/tanh) libm variation
TOL_F64 = 1e-8
# wrapper-level recon outputs are compared in float32 through 5 stacked
# ReconBlocks (LN + convs + 4096x3072 MLPs): backend accumulation order
# alone measures ~2e-4 elementwise (the same port is exact to 4e-14 in the
# f64 decoder tests above); the loss scalars are means and stay within 1e-4
TOL_RECON_F32 = 5e-4


def _max_err(ours, ref):
    return float(np.abs(np.asarray(ours) - ref.detach().numpy()).max())


def _f64(tree):
    return jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64),
                        tree)


def _prefixed(module: torch.nn.Module, prefix: str):
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def rcfg(ref):
    return ref[1].ReconstructionConfig_BASE


@pytest.fixture(scope="module")
def our_rcfg():
    return ReconstructionConfig.base()


@pytest.fixture(scope="module")
def base_cfg():
    return CLIPConfig.base()


@pytest.fixture(scope="module")
def hf_vision(base_cfg):
    return build_hf_vision(base_cfg, seed=10)


@pytest.fixture(scope="module")
def hf_text(base_cfg):
    return build_hf_text(base_cfg, seed=11)


@pytest.fixture(scope="module")
def hf_audio(base_cfg):
    return build_hf_audio(base_cfg, seed=12)


# ---------------------------------------------------------------------------
# decoder-level oracles (reference model.py:359-609)
# ---------------------------------------------------------------------------

def test_img_decoder_oracle(ref, rcfg, our_rcfg, rng):
    """IMG_Decoder: Linear expand -> 4 Recon_Blocks (PixelShuffle+CBAM+MLP)
    -> final shuffle + 1x1 conv (reference model.py:476-514). Both sides in
    f64: an exact port measures ~4e-14, so TOL_F64 pins the wiring."""
    m, _ = ref
    torch.manual_seed(3)
    dec = m.IMG_Decoder(rcfg).eval().double()
    embed = rng.standard_normal((1, rcfg.decoder_dim))
    with torch.no_grad():
        want = dec(torch.from_numpy(embed))
    params, _ = port_mmr_wrapper(_prefixed(dec, "decoder"), "img", our_rcfg)
    with jax.enable_x64(True):
        got = mmr.IMGDecoder(our_rcfg, dtype=jnp.float64).apply(
            {"params": _f64(params["decoder"])}, jnp.asarray(embed))
        assert got.shape == tuple(want.shape) == (1, 3, 128, 128)
        assert _max_err(got, want) <= TOL_F64


def test_aud_decoder_oracle(ref, rcfg, our_rcfg, rng):
    """AUD_Decoder: same body, 1-channel 256x64 output, squeezed
    (reference model.py:569-609). f64 exactness, as above."""
    m, _ = ref
    torch.manual_seed(4)
    dec = m.AUD_Decoder(rcfg).eval().double()
    embed = rng.standard_normal((1, rcfg.decoder_dim))
    with torch.no_grad():
        want = dec(torch.from_numpy(embed))
    params, _ = port_mmr_wrapper(_prefixed(dec, "decoder"), "aud", our_rcfg)
    with jax.enable_x64(True):
        got = mmr.AUDDecoder(our_rcfg, dtype=jnp.float64).apply(
            {"params": _f64(params["decoder"])}, jnp.asarray(embed))
        assert got.shape == tuple(want.shape) == (1, 256, 64)
        assert _max_err(got, want) <= TOL_F64


def test_txt_decoder_oracle(ref, rcfg, our_rcfg, rng):
    """TXT_Decoder: Conv1d token expander (with BatchNorm1d running stats),
    learned pos-emb, post-LN torch TransformerEncoder, tied vocab head
    (reference model.py:516-567). f64 exactness, as above."""
    m, _ = ref
    torch.manual_seed(5)
    dec = m.TXT_Decoder(rcfg).eval().double()
    # randomize the BN running stats so the batch_stats port is actually
    # exercised (fresh stats are mean 0 / var 1, which a broken port could
    # fake with an identity)
    with torch.no_grad():
        dec.dim_to_tokens[1].running_mean.normal_(0.0, 0.5)
        dec.dim_to_tokens[1].running_var.uniform_(0.5, 2.0)
    embed = rng.standard_normal((2, 1, rcfg.decoder_dim))
    with torch.no_grad():
        want = dec(torch.from_numpy(embed))
    params, stats = port_mmr_wrapper(_prefixed(dec, "decoder"), "txt",
                                     our_rcfg)
    with jax.enable_x64(True):
        got = mmr.TXTDecoder(our_rcfg, dtype=jnp.float64).apply(
            {"params": _f64(params["decoder"]),
             "batch_stats": _f64(stats["decoder"])},
            jnp.asarray(embed))
        assert got.shape == tuple(want.shape) == (2, 32, 50265)
        assert _max_err(got, want) <= TOL_F64


# ---------------------------------------------------------------------------
# wrapper-level oracles: frozen towers + fusion + decoder + loss
# (reference model.py:611-823)
# ---------------------------------------------------------------------------

def test_img_txt_2_aud_oracle(ref, rcfg, our_rcfg, base_cfg, hf_vision,
                              hf_text, rng):
    """IMG_TXT_2_AUD full forward: pooler-CLS fusion, AUD decoder, and the
    alpha*(1-SSIM)+(1-alpha)*MSE loss on the bicubic-resized label
    (reference model.py:611-683)."""
    m, _ = ref
    torch.manual_seed(6)
    wrapper = m.IMG_TXT_2_AUD(rcfg, hf_vision, hf_text).eval()

    pixels = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    ids = rng.integers(4, base_cfg.text.vocab_size, (2, 32)).astype(np.int64)
    ids[:, 0] = base_cfg.text.bos_token_id
    mask = np.ones_like(ids)
    label = rng.random((2, 1024, 128)).astype(np.float32)

    with torch.no_grad():
        want_recon = wrapper(torch.from_numpy(pixels), torch.from_numpy(ids),
                             torch.from_numpy(mask))
        want_loss = wrapper(torch.from_numpy(pixels), torch.from_numpy(ids),
                            torch.from_numpy(mask),
                            label=torch.from_numpy(label))

    vit = ViTModel(base_cfg.vision)
    rob = RobertaModel(base_cfg.text)
    _, img_pooled = vit.apply({"params": hf_port.port_vision(hf_vision)},
                              jnp.asarray(pixels))
    _, txt_pooled = rob.apply({"params": hf_port.port_text(hf_text)},
                              jnp.asarray(ids), jnp.asarray(mask))
    params, _ = port_mmr_wrapper(wrapper.state_dict(), "aud", our_rcfg)
    got_recon = mmr.ImgTxt2Aud(our_rcfg).apply({"params": params},
                                               img_pooled, txt_pooled)
    got_loss = losses.mmr_audio_loss(got_recon, jnp.asarray(label))

    assert _max_err(got_recon, want_recon) <= TOL_RECON_F32
    for g, w, name in zip(got_loss, want_loss, ("total", "mse", "ssim")):
        assert abs(float(g) - float(w)) <= TOL, (name, float(g), float(w))


def test_txt_aud_2_img_oracle(ref, rcfg, our_rcfg, base_cfg, hf_text,
                              hf_audio, rng):
    """TXT_AUD_2_IMG full forward: avg-pooled last-hidden-state fusion, IMG
    decoder, MSE+L1+SSIM loss (reference model.py:685-757)."""
    m, _ = ref
    torch.manual_seed(7)
    wrapper = m.TXT_AUD_2_IMG(rcfg, hf_text, hf_audio).eval()

    ids = rng.integers(4, base_cfg.text.vocab_size, (2, 32)).astype(np.int64)
    ids[:, 0] = base_cfg.text.bos_token_id
    mask = np.ones_like(ids)
    fbank = rng.standard_normal((2, base_cfg.audio.max_length,
                                 base_cfg.audio.num_mel_bins)
                                ).astype(np.float32)
    label = rng.random((2, 3, 224, 224)).astype(np.float32)

    with torch.no_grad():
        want_recon = wrapper(torch.from_numpy(ids), torch.from_numpy(mask),
                             torch.from_numpy(fbank))
        want_loss = wrapper(torch.from_numpy(ids), torch.from_numpy(mask),
                            torch.from_numpy(fbank),
                            label=torch.from_numpy(label))

    rob = RobertaModel(base_cfg.text)
    ast = ASTModel(base_cfg.audio)
    txt_lhs, _ = rob.apply({"params": hf_port.port_text(hf_text)},
                           jnp.asarray(ids), jnp.asarray(mask))
    aud_lhs, _ = ast.apply({"params": hf_port.port_audio(hf_audio)},
                           jnp.asarray(fbank))
    params, _ = port_mmr_wrapper(wrapper.state_dict(), "img", our_rcfg)
    got_recon = mmr.TxtAud2Img(our_rcfg).apply({"params": params},
                                               txt_lhs, aud_lhs)
    got_loss = losses.mmr_image_loss(got_recon, jnp.asarray(label))

    assert _max_err(got_recon, want_recon) <= TOL_RECON_F32
    for g, w, name in zip(got_loss, want_loss, ("total", "recon", "ssim")):
        assert abs(float(g) - float(w)) <= TOL, (name, float(g), float(w))


def test_img_aud_2_txt_oracle(ref, rcfg, our_rcfg, base_cfg, hf_vision,
                              hf_audio, rng):
    """IMG_AUD_2_TXT full forward: avg-pooled fusion, TXT decoder, CE over
    vocab + token accuracy (reference model.py:759-823)."""
    m, _ = ref
    torch.manual_seed(8)
    wrapper = m.IMG_AUD_2_TXT(rcfg, hf_vision, hf_audio).eval()

    pixels = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    fbank = rng.standard_normal((2, base_cfg.audio.max_length,
                                 base_cfg.audio.num_mel_bins)
                                ).astype(np.float32)
    label_ids = rng.integers(0, base_cfg.text.vocab_size, (2, 32)
                             ).astype(np.int64)

    with torch.no_grad():
        want_logits = wrapper(torch.from_numpy(pixels),
                              torch.from_numpy(fbank))
        want_ce, want_acc, _ = wrapper(torch.from_numpy(pixels),
                                       torch.from_numpy(fbank),
                                       label=torch.from_numpy(label_ids))

    vit = ViTModel(base_cfg.vision)
    ast = ASTModel(base_cfg.audio)
    img_lhs, _ = vit.apply({"params": hf_port.port_vision(hf_vision)},
                           jnp.asarray(pixels))
    aud_lhs, _ = ast.apply({"params": hf_port.port_audio(hf_audio)},
                           jnp.asarray(fbank))
    params, stats = port_mmr_wrapper(wrapper.state_dict(), "txt", our_rcfg)
    got_logits = mmr.ImgAud2Txt(our_rcfg).apply(
        {"params": params, "batch_stats": stats}, img_lhs, aud_lhs)
    got_ce, got_acc, _ = losses.mmr_text_loss(got_logits,
                                              jnp.asarray(label_ids))

    assert _max_err(got_logits, want_logits) <= TOL_RECON_F32
    assert abs(float(got_ce) - float(want_ce)) <= TOL
    assert abs(float(got_acc) - float(want_acc)) <= TOL


# ---------------------------------------------------------------------------
# Tri_CLIP oracle (reference model.py:60-281)
# ---------------------------------------------------------------------------

def test_tri_clip_oracle(ref, base_cfg, hf_vision, hf_text, hf_audio, rng,
                         monkeypatch):
    """Reference Tri_CLIP end to end: the pretraining forward's 3 losses and
    both zero-shot similarity scores, against our TriCLIP + tri_clip_loss.
    from_pretrained is patched to return the config-built towers (the hub is
    unreachable; reference model.py:71-74)."""
    m, c = ref

    def fake(module):
        return type("F", (), {"from_pretrained":
                              staticmethod(lambda path: module)})

    monkeypatch.setattr(m, "CLIPVisionModel", fake(hf_vision))
    monkeypatch.setattr(m, "AutoModel", fake(hf_text))
    monkeypatch.setattr(m, "ASTModel", fake(hf_audio))
    torch.manual_seed(9)
    ref_tri = m.Tri_CLIP(c.CLIPConfig_BASE).eval()

    batch = 4
    pixels = rng.standard_normal((batch, 3, 224, 224)).astype(np.float32)
    ids = rng.integers(4, base_cfg.text.vocab_size, (batch, 32)
                       ).astype(np.int64)
    ids[:, 0] = base_cfg.text.bos_token_id
    mask = np.ones_like(ids)
    fbank = rng.standard_normal((batch, base_cfg.audio.max_length,
                                 base_cfg.audio.num_mel_bins)
                                ).astype(np.float32)

    with torch.no_grad():
        want_it, want_ta, want_ai = ref_tri(
            pixel_values=torch.from_numpy(pixels),
            input_ids=torch.from_numpy(ids),
            att_mask=torch.from_numpy(mask),
            input_values=torch.from_numpy(fbank))
        want_it_score = ref_tri.get_img_txt_sim_score(
            pixel_values=torch.from_numpy(pixels),
            input_ids=torch.from_numpy(ids),
            att_mask=torch.from_numpy(mask))
        want_ta_score = ref_tri.get_aud_txt_sim_score(
            input_ids=torch.from_numpy(ids),
            att_mask=torch.from_numpy(mask),
            input_values=torch.from_numpy(fbank))

    params = hf_port.port_tri_clip(ref_tri.state_dict())
    model = TriCLIP(base_cfg)
    out = model.apply({"params": params}, jnp.asarray(pixels),
                      jnp.asarray(ids), jnp.asarray(mask),
                      jnp.asarray(fbank))
    got_it, got_ta, got_ai = losses.tri_clip_loss(
        out["image_embeds"], out["text_embeds"], out["audio_embeds"],
        out["logit_scale_IT"], out["logit_scale_TA"], out["logit_scale_AI"])
    assert abs(float(got_it) - float(want_it)) <= TOL
    assert abs(float(got_ta) - float(want_ta)) <= TOL
    assert abs(float(got_ai) - float(want_ai)) <= TOL

    got_it_score = model.apply({"params": params}, jnp.asarray(pixels),
                               jnp.asarray(ids), jnp.asarray(mask),
                               method=TriCLIP.get_img_txt_sim_score)
    got_ta_score = model.apply({"params": params}, jnp.asarray(fbank),
                               jnp.asarray(ids), jnp.asarray(mask),
                               method=TriCLIP.get_aud_txt_sim_score)
    assert _max_err(got_it_score, want_it_score) <= TOL
    assert _max_err(got_ta_score, want_ta_score) <= TOL
