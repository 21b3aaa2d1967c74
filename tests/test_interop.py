"""Full-model interop: reference-format checkpoint loading and end-to-end
TriCLIP parity (<=1e-4) against a torch composition of the same weights."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from synergy_tpu.configs import AudioConfig, CLIPConfig, TextConfig, VisionConfig
from synergy_tpu.interop import hf_port
from synergy_tpu.models.tri_clip import TriCLIP

TOL = 1e-4


@pytest.fixture(scope="module")
def torch_tri_clip():
    """A torch model with the reference Tri_CLIP's structure and state-dict
    naming (three HF towers + bias-free projections + three logit scales,
    reference model.py:60-82), randomly initialized."""
    from transformers import ASTConfig, CLIPVisionConfig, RobertaConfig
    from transformers import ASTModel as HFAst
    from transformers import CLIPVisionModel
    from transformers import RobertaModel as HFRoberta

    torch.manual_seed(0)

    class TorchTri(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.vision_model = CLIPVisionModel(CLIPVisionConfig(
                hidden_size=64, intermediate_size=256, num_hidden_layers=2,
                num_attention_heads=4, image_size=32, patch_size=16))
            self.text_model = HFRoberta(RobertaConfig(
                vocab_size=512, hidden_size=64, intermediate_size=256,
                num_hidden_layers=2, num_attention_heads=4,
                max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
                attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0))
            self.audio_model = HFAst(ASTConfig(
                hidden_size=64, intermediate_size=256, num_hidden_layers=2,
                num_attention_heads=4, patch_size=16, frequency_stride=16,
                time_stride=16, max_length=64, num_mel_bins=64,
                attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0))
            self.vision_projection = torch.nn.Linear(64, 32, bias=False)
            self.text_projection = torch.nn.Linear(64, 32, bias=False)
            self.audio_projection = torch.nn.Linear(64, 32, bias=False)
            self.logit_scale_for_IT = torch.nn.Parameter(torch.tensor(2.6592))
            self.logit_scale_for_TA = torch.nn.Parameter(torch.tensor(2.6592))
            self.logit_scale_for_AI = torch.nn.Parameter(torch.tensor(2.6592))

    return TorchTri().eval()


@pytest.fixture(scope="module")
def jax_cfg():
    return CLIPConfig(
        vision=VisionConfig(hidden_size=64, intermediate_size=256,
                            num_hidden_layers=2, num_attention_heads=4,
                            image_size=32, patch_size=16),
        text=TextConfig(vocab_size=512, hidden_size=64, intermediate_size=256,
                        num_hidden_layers=2, num_attention_heads=4,
                        max_position_embeddings=66, attention_dropout=0.0,
                        hidden_dropout=0.0),
        audio=AudioConfig(hidden_size=64, intermediate_size=256,
                          num_hidden_layers=2, num_attention_heads=4,
                          patch_size=16, frequency_stride=16, time_stride=16,
                          max_length=64, num_mel_bins=64),
        projection_dim=32,
    )


def _reference_forward(m, pixel, ids, mask, fbank):
    """The reference Tri_CLIP forward math (model.py:205-266) in torch."""
    with torch.no_grad():
        img = m.vision_projection(m.vision_model(pixel_values=pixel).pooler_output)
        txt = m.text_projection(
            m.text_model(input_ids=ids, attention_mask=mask).pooler_output)
        aud = m.audio_projection(m.audio_model(input_values=fbank).pooler_output)
        norm = lambda x: x / x.norm(p=2, dim=-1, keepdim=True)
        return norm(img), norm(txt), norm(aud)


@pytest.mark.slow
def test_tri_clip_checkpoint_roundtrip_and_parity(tmp_path, torch_tri_clip,
                                                  jax_cfg, rng):
    m = torch_tri_clip
    # save in the reference's .tar format (main_pretraining.py:45-47)
    tar = str(tmp_path / "CLIP_model_base_prompt.tar")
    torch.save({"model_state_dict": m.state_dict()}, tar)
    params = hf_port.load_reference_checkpoint(tar)

    model = TriCLIP(jax_cfg)
    pixel = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(4, 512, (2, 8)).astype(np.int64)
    ids[:, 0] = 0
    mask = np.ones_like(ids)
    fbank = rng.standard_normal((2, 64, 64)).astype(np.float32)

    ref_img, ref_txt, ref_aud = _reference_forward(
        m, torch.from_numpy(pixel), torch.from_numpy(ids),
        torch.from_numpy(mask), torch.from_numpy(fbank))

    out = model.apply({"params": params}, jnp.asarray(pixel),
                      jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(fbank))
    for ours, ref, what in [
        (out["image_embeds"], ref_img, "image"),
        (out["text_embeds"], ref_txt, "text"),
        (out["audio_embeds"], ref_aud, "audio"),
    ]:
        err = np.abs(np.asarray(ours) - ref.numpy()).max()
        assert err <= TOL, f"{what}: {err}"
    assert float(out["logit_scale_IT"]) == pytest.approx(2.6592, abs=1e-6)

    # similarity heads match the reference's zero-shot scores (model.py:126-203)
    sim = model.apply({"params": params}, jnp.asarray(pixel),
                      jnp.asarray(ids), jnp.asarray(mask),
                      method=TriCLIP.get_img_txt_sim_score)
    ref_sim = (ref_img @ ref_txt.t() * torch.exp(m.logit_scale_for_IT)).detach()
    assert np.abs(np.asarray(sim) - ref_sim.numpy()).max() <= 5e-4


@pytest.mark.slow
def test_hf_dir_port_roundtrip_and_parity(tmp_path, torch_tri_clip, jax_cfg,
                                          rng):
    """Port path (b): per-tower HF ``save_pretrained`` directories — the
    reference's own per-modality artifact (main_pretraining.py:39-59:
    save_pretrained + sibling projection_head.tar per tower). Round trip:
    save -> port_cli --hf_*_dir -> load_tri_clip_params -> <=1e-4 features."""
    from synergy_tpu.interop.port_cli import main as port_main
    from synergy_tpu.train.checkpoint import load_tri_clip_params

    m = torch_tri_clip
    dirs = {}
    for modal, tower, proj in [
        ("image", m.vision_model, m.vision_projection),
        ("text", m.text_model, m.text_projection),
        ("audio", m.audio_model, m.audio_projection),
    ]:
        d = str(tmp_path / f"CLIP_{modal}_model_base" / "prompt")
        tower.save_pretrained(d)
        torch.save({"model_state_dict": proj.state_dict()},
                   str(tmp_path / f"CLIP_{modal}_model_base" / "prompt"
                       / "projection_head.tar"))
        dirs[modal] = d

    ck = str(tmp_path / "ck")
    port_main(["--hf_vision_dir", dirs["image"], "--hf_text_dir", dirs["text"],
               "--hf_audio_dir", dirs["audio"], "--ckpt_dir", ck])
    params = load_tri_clip_params(ck, "base_prompt")
    assert float(np.asarray(params["logit_scale_IT"])) == pytest.approx(2.6592)

    model = TriCLIP(jax_cfg)
    pixel = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(4, 512, (2, 8)).astype(np.int64)
    ids[:, 0] = 0
    mask = np.ones_like(ids)
    fbank = rng.standard_normal((2, 64, 64)).astype(np.float32)
    ref_img, ref_txt, ref_aud = _reference_forward(
        m, torch.from_numpy(pixel), torch.from_numpy(ids),
        torch.from_numpy(mask), torch.from_numpy(fbank))
    out = model.apply({"params": params}, jnp.asarray(pixel),
                      jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(fbank))
    for ours, ref, what in [
        (out["image_embeds"], ref_img, "image"),
        (out["text_embeds"], ref_txt, "text"),
        (out["audio_embeds"], ref_aud, "audio"),
    ]:
        err = np.abs(np.asarray(ours) - ref.numpy()).max()
        assert err <= TOL, f"{what}: {err}"


def test_hf_dir_port_requires_projection(tmp_path, torch_tri_clip):
    """Stock HF checkpoints carry no tri-modal projection head; the port must
    fail loudly, not silently produce an incomplete export."""
    from synergy_tpu.interop.hf_port import port_tri_clip_from_dirs

    m = torch_tri_clip
    dirs = {}
    for modal, tower in [("image", m.vision_model), ("text", m.text_model),
                         ("audio", m.audio_model)]:
        d = str(tmp_path / modal)
        tower.save_pretrained(d)  # no projection_head.tar
        dirs[modal] = d
    with pytest.raises(FileNotFoundError, match="projection_head"):
        port_tri_clip_from_dirs(dirs["image"], dirs["text"], dirs["audio"])


def test_port_cli_feeds_downstream(tmp_path, torch_tri_clip):
    """The migration CLI writes an export that eval entry points load."""
    from synergy_tpu.interop.port_cli import main as port_main
    from synergy_tpu.train.checkpoint import load_tri_clip_params

    tar = str(tmp_path / "CLIP_model_base_prompt.tar")
    torch.save({"model_state_dict": torch_tri_clip.state_dict()}, tar)
    port_main(["--checkpoint", tar, "--ckpt_dir", str(tmp_path / "ck")])
    params = load_tri_clip_params(str(tmp_path / "ck"), "base_prompt")
    assert float(np.asarray(params["logit_scale_IT"])) == pytest.approx(2.6592)
    assert "kernel" in params["vision_projection"]


# ---------------------------------------------------------------------------
# export direction (interop/export_hf.py): flax -> torch/HF artifacts
# ---------------------------------------------------------------------------


def test_export_inverts_port_bitwise(torch_tri_clip):
    """port -> export must reproduce the reference state dict bit-for-bit
    (transposes are lossless; no leaf may drift or go missing)."""
    from synergy_tpu.interop import export_hf

    sd_ref = torch_tri_clip.state_dict()
    params = hf_port.port_tri_clip(sd_ref)
    sd_out = export_hf.export_tri_clip_state_dict(params)
    ref_keys = {k for k in sd_ref if "position_ids" not in k}
    assert set(sd_out) == ref_keys
    for k in sd_out:
        np.testing.assert_array_equal(
            np.asarray(sd_out[k]), sd_ref[k].detach().numpy(), err_msg=k)


def test_export_cli_writes_reference_tar(tmp_path, torch_tri_clip):
    """export_cli reads the per-tower export and writes a CLIP_model_*.tar
    the port path loads back bit-identically (full cycle: torch -> flax ->
    C12 export -> reference tar -> flax)."""
    import jax

    from synergy_tpu.interop import export_cli
    from synergy_tpu.train import checkpoint as ckpt

    params = hf_port.port_tri_clip(torch_tri_clip.state_dict())
    ckpt.export_towers(str(tmp_path), "base_prompt", params)
    out = export_cli.main(["--ckpt_dir", str(tmp_path),
                           "--out", str(tmp_path / "CLIP_model_roundtrip.tar")])
    back = hf_port.load_reference_checkpoint(out)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))


def test_export_hf_tower_dirs_roundtrip(tmp_path, torch_tri_clip):
    """Per-tower HF save_pretrained dirs + projection_head.tar — the exact
    artifact the reference's FT scripts load (main_pretraining.py:31-59) —
    must round-trip through HF from_pretrained bit-identically."""
    import jax

    from synergy_tpu.interop import export_hf

    params = hf_port.port_tri_clip(torch_tri_clip.state_dict())
    cfgs = {"vision": torch_tri_clip.vision_model.config,
            "text": torch_tri_clip.text_model.config,
            "audio": torch_tri_clip.audio_model.config}
    paths = export_hf.export_hf_tower_dirs(params, str(tmp_path / "hf"),
                                           configs=cfgs)
    for modality in ("vision", "text", "audio"):
        tower, proj = hf_port.load_hf_tower_dir(paths[modality], modality)
        flat_a = jax.tree_util.tree_leaves_with_path(params[modality])
        flat_b = jax.tree_util.tree_leaves_with_path(tower)
        assert [p for p, _ in flat_a] == [p for p, _ in flat_b], modality
        for (path, a), (_, b) in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"{modality}{path}")
        np.testing.assert_array_equal(
            np.asarray(proj["kernel"]),
            np.asarray(params[f"{modality}_projection"]["kernel"]),
            err_msg=f"{modality} projection")
