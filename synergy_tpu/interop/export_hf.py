"""Flax -> PyTorch (HF) weight export: the reverse of hf_port.py.

Completes the migration story in both directions: checkpoints trained here
can be written in the reference's own artifact formats, so its downstream
scripts — and any HF/torch tooling — consume them unchanged:

  * ``export_tri_clip_state_dict`` -> the flat ``Tri_CLIP`` torch state dict
    (reference model.py:60-82 key names);
  * ``export_reference_checkpoint`` -> ``CLIP_model_{size}_{des}.tar``
    (torch.save dict with 'model_state_dict', main_pretraining.py:45-47);
  * ``export_hf_tower_dirs`` -> per-modality HF ``save_pretrained``
    directories with a sibling ``projection_head.tar`` — the exact per-tower
    contract main_pretraining.py:31-59 writes and DT/FT_*.py:111-145 load.

Inverse-mapping invariants are pinned by a port->export->port roundtrip test
(tests/test_interop.py): every leaf must come back bit-identical.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _unstack_layers(encoder: Dict[str, Any]) -> Dict[str, Any]:
    """scan_layers checkpoints stack per-layer params under 'layers' along a
    leading axis; present them as layer_{i} dicts (the unrolled format)."""
    if "layers" not in encoder:
        return encoder
    import jax

    stacked = encoder["layers"]
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return {f"layer_{i}": jax.tree_util.tree_map(lambda x: x[i], stacked)
            for i in range(n)}


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _linear(out: Dict[str, np.ndarray], prefix: str, p: Dict[str, Any]):
    out[f"{prefix}.weight"] = _np(p["kernel"]).T
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _layernorm(out: Dict[str, np.ndarray], prefix: str, p: Dict[str, Any]):
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])


def _conv_nchw(kernel) -> np.ndarray:
    # flax (H, W, I, O) -> torch conv weight (O, I, H, W)
    return _np(kernel).transpose(3, 2, 0, 1)


def export_vision(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """ViTModel (flax) params -> CLIPVisionModel state dict."""
    sd: Dict[str, np.ndarray] = {}
    p = "vision_model."
    emb = params["embeddings"]
    sd[p + "embeddings.class_embedding"] = _np(emb["class_embedding"])
    sd[p + "embeddings.position_embedding.weight"] = _np(
        emb["position_embedding"])
    sd[p + "embeddings.patch_embedding.weight"] = _conv_nchw(
        emb["patch_embedding"]["kernel"])
    _layernorm(sd, p + "pre_layrnorm", params["pre_layernorm"])  # HF typo
    _layernorm(sd, p + "post_layernorm", params["post_layernorm"])
    for name, layer in sorted(_unstack_layers(params["encoder"]).items(),
                              key=lambda kv: int(kv[0].split("_")[1])):
        lp = f"{p}encoder.layers.{int(name.split('_')[1])}."
        _layernorm(sd, lp + "layer_norm1", layer["ln1"])
        _layernorm(sd, lp + "layer_norm2", layer["ln2"])
        _linear(sd, lp + "self_attn.q_proj", layer["attn"]["query"])
        _linear(sd, lp + "self_attn.k_proj", layer["attn"]["key"])
        _linear(sd, lp + "self_attn.v_proj", layer["attn"]["value"])
        _linear(sd, lp + "self_attn.out_proj", layer["attn"]["out"])
        _linear(sd, lp + "mlp.fc1", layer["mlp"]["fc1"])
        _linear(sd, lp + "mlp.fc2", layer["mlp"]["fc2"])
    return sd


def export_text(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """RobertaModel (flax) params -> RobertaModel state dict."""
    sd: Dict[str, np.ndarray] = {}
    emb = params["embeddings"]
    sd["embeddings.word_embeddings.weight"] = _np(
        emb["word_embeddings"]["embedding"])
    sd["embeddings.position_embeddings.weight"] = _np(
        emb["position_embeddings"]["embedding"])
    sd["embeddings.token_type_embeddings.weight"] = _np(
        emb["token_type_embeddings"]["embedding"])
    _layernorm(sd, "embeddings.LayerNorm", emb["layer_norm"])
    _linear(sd, "pooler.dense", params["pooler"])
    for name, layer in _unstack_layers(params["encoder"]).items():
        lp = f"encoder.layer.{int(name.split('_')[1])}."
        _linear(sd, lp + "attention.self.query", layer["attn"]["query"])
        _linear(sd, lp + "attention.self.key", layer["attn"]["key"])
        _linear(sd, lp + "attention.self.value", layer["attn"]["value"])
        _linear(sd, lp + "attention.output.dense", layer["attn"]["out"])
        _layernorm(sd, lp + "attention.output.LayerNorm", layer["ln1"])
        _linear(sd, lp + "intermediate.dense", layer["mlp"]["fc1"])
        _linear(sd, lp + "output.dense", layer["mlp"]["fc2"])
        _layernorm(sd, lp + "output.LayerNorm", layer["ln2"])
    return sd


def export_audio(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """ASTModel (flax) params -> ASTModel state dict."""
    sd: Dict[str, np.ndarray] = {}
    emb = params["embeddings"]
    sd["embeddings.cls_token"] = _np(emb["cls_token"])
    sd["embeddings.distillation_token"] = _np(emb["distillation_token"])
    sd["embeddings.position_embeddings"] = _np(
        emb["position_embeddings"])[None]
    sd["embeddings.patch_embeddings.projection.weight"] = _conv_nchw(
        emb["patch_embedding"]["kernel"])
    sd["embeddings.patch_embeddings.projection.bias"] = _np(
        emb["patch_embedding"]["bias"])
    _layernorm(sd, "layernorm", params["layernorm"])
    for name, layer in _unstack_layers(params["encoder"]).items():
        lp = f"encoder.layer.{int(name.split('_')[1])}."
        _layernorm(sd, lp + "layernorm_before", layer["ln1"])
        _layernorm(sd, lp + "layernorm_after", layer["ln2"])
        _linear(sd, lp + "attention.attention.query", layer["attn"]["query"])
        _linear(sd, lp + "attention.attention.key", layer["attn"]["key"])
        _linear(sd, lp + "attention.attention.value", layer["attn"]["value"])
        _linear(sd, lp + "attention.output.dense", layer["attn"]["out"])
        _linear(sd, lp + "intermediate.dense", layer["mlp"]["fc1"])
        _linear(sd, lp + "output.dense", layer["mlp"]["fc2"])
    return sd


def export_tri_clip_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """TriCLIP (flax) params -> the reference's flat Tri_CLIP state dict.

    Key names match reference model.py:60-82 (towers as submodules, bias-free
    projections, three logit scales); ``port_tri_clip`` inverts this exactly.
    """
    sd: Dict[str, np.ndarray] = {}
    # CLIPVisionModel nests its graph under 'vision_model.' — inside Tri_CLIP
    # the attribute is also 'vision_model', hence the doubled prefix
    for k, v in export_vision(params["vision"]).items():
        sd[f"vision_model.{k}"] = v
    for k, v in export_text(params["text"]).items():
        sd[f"text_model.{k}"] = v
    for k, v in export_audio(params["audio"]).items():
        sd[f"audio_model.{k}"] = v
    for ours, theirs in (("vision_projection", "vision_projection"),
                         ("text_projection", "text_projection"),
                         ("audio_projection", "audio_projection")):
        sd[f"{theirs}.weight"] = _np(params[ours]["kernel"]).T
    sd["logit_scale_for_IT"] = _np(params["logit_scale_IT"])
    sd["logit_scale_for_TA"] = _np(params["logit_scale_TA"])
    sd["logit_scale_for_AI"] = _np(params["logit_scale_AI"])
    return sd


def _to_torch(sd: Dict[str, np.ndarray]):
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(v.astype(np.float32)))
            for k, v in sd.items()}


def export_reference_checkpoint(params: Dict[str, Any], tar_path: str):
    """Write ``CLIP_model_{size}_{des}.tar`` exactly as the reference's
    save_model does (torch.save({'model_state_dict': ...}),
    main_pretraining.py:45-47)."""
    import torch

    torch.save({"model_state_dict": _to_torch(
        export_tri_clip_state_dict(params))}, tar_path)


def _hf_configs(is_base: bool):
    """HF config objects mirroring configs.py Base/Large (reference
    config.py:7-102, 200-292; the AST tower stays Base-sized even in the
    LARGE config, config.py:273-289)."""
    from transformers import ASTConfig, CLIPVisionConfig, RobertaConfig

    if is_base:
        vision = CLIPVisionConfig(
            hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
            num_attention_heads=12, image_size=224, patch_size=16,
            hidden_act="quick_gelu")
    else:
        vision = CLIPVisionConfig(
            hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
            num_attention_heads=16, image_size=224, patch_size=14,
            hidden_act="quick_gelu")
    if is_base:
        text = RobertaConfig(
            vocab_size=50265, hidden_size=768, num_hidden_layers=12,
            num_attention_heads=12, intermediate_size=3072,
            max_position_embeddings=514, type_vocab_size=1,
            layer_norm_eps=1e-5)
    else:
        text = RobertaConfig(
            vocab_size=50265, hidden_size=1024, num_hidden_layers=24,
            num_attention_heads=16, intermediate_size=4096,
            max_position_embeddings=514, type_vocab_size=1,
            layer_norm_eps=1e-5)
    audio = ASTConfig(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, frequency_stride=12 if is_base else 10,
        time_stride=12 if is_base else 10, max_length=1024, num_mel_bins=128)
    return {"vision": vision, "text": text, "audio": audio}


def export_hf_tower_dirs(params: Dict[str, Any], out_dir: str,
                         is_base: bool = True,
                         configs: Dict[str, Any] = None) -> Dict[str, str]:
    """Write per-modality HF ``save_pretrained`` dirs + projection_head.tar.

    Mirrors the reference's per-tower export (main_pretraining.py:31-59):
    ``{out_dir}/{vision,text,audio}/`` each loadable with the HF
    ``from_pretrained`` the downstream scripts use (DT/FT_image_task.py:115,
    DT/FT_audio_task.py:133, DT/FT_text_task.py:645), plus the sibling
    ``projection_head.tar`` holding the bias-free projection.
    """
    import os

    import torch
    from transformers import ASTModel, CLIPVisionModel, RobertaModel

    cfgs = configs or _hf_configs(is_base)
    builders = {"vision": (CLIPVisionModel, export_vision),
                "text": (RobertaModel, export_text),
                "audio": (ASTModel, export_audio)}
    paths = {}
    for modality, (cls, exporter) in builders.items():
        hf = cls(cfgs[modality])
        if modality == "text":
            hf = hf.eval()
            # RobertaModel default adds a pooler; ours has one too — but HF
            # registers position_ids as a buffer excluded from state dicts in
            # recent versions, so strict load works on parameters alone
        sd = _to_torch(exporter(params[modality]))
        missing, unexpected = hf.load_state_dict(sd, strict=False)
        unexpected = [k for k in unexpected]
        missing = [k for k in missing if "position_ids" not in k]
        if missing or unexpected:
            raise ValueError(
                f"{modality} export does not match the HF module: "
                f"missing={missing[:4]} unexpected={unexpected[:4]}")
        d = os.path.join(out_dir, modality)
        hf.save_pretrained(d, safe_serialization=False)
        proj = params[f"{modality}_projection"]
        torch.save({"model_state_dict": {
            "weight": torch.from_numpy(
                _np(proj["kernel"]).T.astype(np.float32).copy())}},
            os.path.join(d, "projection_head.tar"))
        paths[modality] = d
    return paths
