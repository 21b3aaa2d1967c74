"""Fidelity gate at the reference's REAL architecture sizes (slow lane).

Round-1 parity tests ran at toy dims (hidden 64, 2 layers); these rerun the
same <=1e-4 oracle comparisons at Base scale — ViT-B/16 (768/12L, 197
tokens), RoBERTa-base (768/12L, vocab 50265), AST 12-12 (768/12L, 852
tokens) — against randomly-initialized HF torch modules (the real pretrained
weights cannot be downloaded here; fidelity is an architecture property, not
a weights property). Also drives the port CLI end-to-end at Base scale:
reference-format .tar -> export -> TriCLIP features vs the torch math
(reference model.py:71-124, main_pretraining.py:45-47).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from synergy_tpu.configs import CLIPConfig
from synergy_tpu.interop import hf_port
from synergy_tpu.models.ast import ASTModel
from synergy_tpu.models.roberta import RobertaModel
from synergy_tpu.models.tri_clip import TriCLIP
from synergy_tpu.models.vit import ViTModel

pytestmark = pytest.mark.slow

TOL = 1e-4


def _max_err(ours, ref):
    return float(np.abs(np.asarray(ours) - ref.detach().numpy()).max())


@pytest.fixture(scope="module")
def base_cfg():
    return CLIPConfig.base()


@pytest.fixture(scope="module")
def hf_vision_base(base_cfg):
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(0)
    v = base_cfg.vision
    return CLIPVisionModel(CLIPVisionConfig(
        hidden_size=v.hidden_size, intermediate_size=v.intermediate_size,
        num_hidden_layers=v.num_hidden_layers,
        num_attention_heads=v.num_attention_heads,
        image_size=v.image_size, patch_size=v.patch_size,
        layer_norm_eps=v.layer_norm_eps)).eval()


@pytest.fixture(scope="module")
def hf_text_base(base_cfg):
    from transformers import RobertaConfig
    from transformers import RobertaModel as HFRoberta

    torch.manual_seed(1)
    t = base_cfg.text
    # layer_norm_eps must mirror the REAL roberta-base checkpoint (1e-5,
    # which our TextConfig carries); programmatic RobertaConfig() defaults
    # to BERT's 1e-12, and at Base-scale embedding variances the eps
    # difference alone is a ~2e-2 output divergence.
    return HFRoberta(RobertaConfig(
        vocab_size=t.vocab_size, hidden_size=t.hidden_size,
        intermediate_size=t.intermediate_size,
        num_hidden_layers=t.num_hidden_layers,
        num_attention_heads=t.num_attention_heads,
        max_position_embeddings=t.max_position_embeddings,
        type_vocab_size=t.type_vocab_size, pad_token_id=t.pad_token_id,
        layer_norm_eps=t.layer_norm_eps,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)).eval()


@pytest.fixture(scope="module")
def hf_audio_base(base_cfg):
    from transformers import ASTConfig
    from transformers import ASTModel as HFAst

    torch.manual_seed(2)
    a = base_cfg.audio
    return HFAst(ASTConfig(
        hidden_size=a.hidden_size, intermediate_size=a.intermediate_size,
        num_hidden_layers=a.num_hidden_layers,
        num_attention_heads=a.num_attention_heads,
        patch_size=a.patch_size, frequency_stride=a.frequency_stride,
        time_stride=a.time_stride, max_length=a.max_length,
        num_mel_bins=a.num_mel_bins, layer_norm_eps=a.layer_norm_eps,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)).eval()


def test_vit_base_parity(base_cfg, hf_vision_base, rng):
    """ViT-B/16: 768 hidden, 12 layers, 197 tokens (reference config.py:7-25)."""
    cfg = base_cfg.vision
    assert cfg.seq_len == 197
    model = ViTModel(cfg)
    params = hf_port.port_vision(hf_vision_base)
    pixels = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref = hf_vision_base(pixel_values=torch.from_numpy(pixels))
    lhs, pooled = model.apply({"params": params}, jnp.asarray(pixels))
    assert lhs.shape == (2, 197, 768)
    assert _max_err(lhs, ref.last_hidden_state) <= TOL
    assert _max_err(pooled, ref.pooler_output) <= TOL


def test_roberta_base_parity(base_cfg, hf_text_base, rng):
    """RoBERTa-base: 768 hidden, 12 layers, vocab 50265, pad-offset position
    ids (reference config.py:28-52)."""
    cfg = base_cfg.text
    model = RobertaModel(cfg)
    params = hf_port.port_text(hf_text_base)
    ids = rng.integers(4, cfg.vocab_size, (2, 32)).astype(np.int64)
    ids[:, 0] = cfg.bos_token_id
    ids[0, 28:] = cfg.pad_token_id
    mask = (ids != cfg.pad_token_id).astype(np.int64)
    with torch.no_grad():
        ref = hf_text_base(input_ids=torch.from_numpy(ids),
                           attention_mask=torch.from_numpy(mask))
    lhs, pooled = model.apply({"params": params}, jnp.asarray(ids),
                              jnp.asarray(mask))
    assert _max_err(lhs * mask[..., None],
                    ref.last_hidden_state * torch.from_numpy(mask)[..., None]
                    ) <= TOL
    assert _max_err(pooled, ref.pooler_output) <= TOL


def test_ast_base_parity(base_cfg, hf_audio_base, rng):
    """AST 12-12: 768 hidden, 12 layers, 852 tokens incl. CLS+distill
    (reference config.py:82-102)."""
    cfg = base_cfg.audio
    assert cfg.seq_len == 852
    model = ASTModel(cfg)
    params = hf_port.port_audio(hf_audio_base)
    fbank = rng.standard_normal((1, cfg.max_length, cfg.num_mel_bins)
                                ).astype(np.float32)
    with torch.no_grad():
        ref = hf_audio_base(input_values=torch.from_numpy(fbank))
    lhs, pooled = model.apply({"params": params}, jnp.asarray(fbank))
    assert lhs.shape == (1, 852, 768)
    assert _max_err(lhs, ref.last_hidden_state) <= TOL
    assert _max_err(pooled, ref.pooler_output) <= TOL


def test_port_cli_base_roundtrip(tmp_path, base_cfg, hf_vision_base,
                                 hf_text_base, hf_audio_base, rng):
    """Base-scale end-to-end: reference-format .tar -> port CLI -> export ->
    TriCLIP get_*_features vs the reference's torch math (model.py:84-124)."""
    from synergy_tpu.interop.port_cli import main as port_main
    from synergy_tpu.train.checkpoint import load_tri_clip_params

    torch.manual_seed(3)

    class TorchTri(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.vision_model = hf_vision_base
            self.text_model = hf_text_base
            self.audio_model = hf_audio_base
            d, p = 768, base_cfg.projection_dim
            self.vision_projection = torch.nn.Linear(d, p, bias=False)
            self.text_projection = torch.nn.Linear(d, p, bias=False)
            self.audio_projection = torch.nn.Linear(d, p, bias=False)
            self.logit_scale_for_IT = torch.nn.Parameter(torch.tensor(2.6592))
            self.logit_scale_for_TA = torch.nn.Parameter(torch.tensor(2.6592))
            self.logit_scale_for_AI = torch.nn.Parameter(torch.tensor(2.6592))

    m = TorchTri().eval()
    tar = str(tmp_path / "CLIP_model_base_prompt.tar")
    torch.save({"model_state_dict": m.state_dict()}, tar)
    port_main(["--checkpoint", tar, "--ckpt_dir", str(tmp_path / "ck")])
    params = load_tri_clip_params(str(tmp_path / "ck"), "base_prompt")

    model = TriCLIP(base_cfg)
    pixel = rng.standard_normal((1, 3, 224, 224)).astype(np.float32)
    ids = rng.integers(4, base_cfg.text.vocab_size, (1, 32)).astype(np.int64)
    ids[:, 0] = 0
    mask = np.ones_like(ids)
    fbank = rng.standard_normal(
        (1, base_cfg.audio.max_length, base_cfg.audio.num_mel_bins)
    ).astype(np.float32)

    with torch.no_grad():
        ref_img = m.vision_projection(
            m.vision_model(pixel_values=torch.from_numpy(pixel)).pooler_output)
        ref_txt = m.text_projection(
            m.text_model(input_ids=torch.from_numpy(ids),
                         attention_mask=torch.from_numpy(mask)).pooler_output)
        ref_aud = m.audio_projection(
            m.audio_model(input_values=torch.from_numpy(fbank)).pooler_output)

    img = model.apply({"params": params}, jnp.asarray(pixel),
                      method=TriCLIP.get_image_features)
    txt = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask),
                      method=TriCLIP.get_text_features)
    aud = model.apply({"params": params}, jnp.asarray(fbank),
                      method=TriCLIP.get_audio_features)
    assert _max_err(img, ref_img) <= TOL, "image features"
    assert _max_err(txt, ref_txt) <= TOL, "text features"
    assert _max_err(aud, ref_aud) <= TOL, "audio features"
