"""PyTorch (HF) -> Flax weight conversion for the three towers.

This is the fidelity gate of the rebuild: given the same inputs, each ported
tower must agree with its HF torch counterpart to <=1e-4 (BASELINE.md). Used
both for porting real pretrained checkpoints (when available on disk) and for
parity tests against randomly-initialized HF modules (no network access).

Covers:
  * ``CLIPVisionModel``            -> models/vit.py     (reference model.py:71)
  * ``RobertaModel`` (AutoModel)   -> models/roberta.py (reference model.py:72)
  * ``ASTModel``                   -> models/ast.py     (reference model.py:74)
  * full ``Tri_CLIP`` checkpoints  -> models/tri_clip.py (projections + scales,
    reference model.py:76-82)
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _linear(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _conv_nchw(weight) -> np.ndarray:
    # torch conv weight (O, I, H, W) -> flax (H, W, I, O)
    return _np(weight).transpose(2, 3, 1, 0)


def _pack_layers(layer_dicts, scan_layers: bool) -> Dict[str, Any]:
    """Per-layer param dicts -> encoder tree. With scan_layers (the model
    default) parameters are stacked along a leading layer axis under
    'layers' (models/layers.py TransformerEncoder)."""
    if scan_layers:
        import jax

        return {"layers": jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *layer_dicts)}
    return {f"layer_{i}": d for i, d in enumerate(layer_dicts)}


def port_vision(hf_model, scan_layers: bool = False) -> Dict[str, Any]:
    """CLIPVisionModel -> ViTModel params."""
    sd = {k: v for k, v in hf_model.state_dict().items()}
    p = "vision_model."
    params: Dict[str, Any] = {
        "embeddings": {
            "class_embedding": _np(sd[p + "embeddings.class_embedding"]),
            "position_embedding": _np(sd[p + "embeddings.position_embedding.weight"]),
            "patch_embedding": {
                "kernel": _conv_nchw(sd[p + "embeddings.patch_embedding.weight"]),
            },
        },
        "pre_layernorm": _layernorm(sd, p + "pre_layrnorm"),
        "post_layernorm": _layernorm(sd, p + "post_layernorm"),
    }
    layers = []
    for i in range(hf_model.config.num_hidden_layers):
        lp = f"{p}encoder.layers.{i}."
        layers.append({
            "ln1": _layernorm(sd, lp + "layer_norm1"),
            "ln2": _layernorm(sd, lp + "layer_norm2"),
            "attn": {
                "query": _linear(sd, lp + "self_attn.q_proj"),
                "key": _linear(sd, lp + "self_attn.k_proj"),
                "value": _linear(sd, lp + "self_attn.v_proj"),
                "out": _linear(sd, lp + "self_attn.out_proj"),
            },
            "mlp": {
                "fc1": _linear(sd, lp + "mlp.fc1"),
                "fc2": _linear(sd, lp + "mlp.fc2"),
            },
        })
    params["encoder"] = _pack_layers(layers, scan_layers)
    return params


def port_text(hf_model, scan_layers: bool = False) -> Dict[str, Any]:
    """RobertaModel -> RobertaModel (flax) params."""
    sd = {k: v for k, v in hf_model.state_dict().items()}
    params: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {"embedding": _np(sd["embeddings.word_embeddings.weight"])},
            "position_embeddings": {"embedding": _np(sd["embeddings.position_embeddings.weight"])},
            "token_type_embeddings": {"embedding": _np(sd["embeddings.token_type_embeddings.weight"])},
            "layer_norm": _layernorm(sd, "embeddings.LayerNorm"),
        },
        "pooler": _linear(sd, "pooler.dense"),
    }
    layers = []
    for i in range(hf_model.config.num_hidden_layers):
        lp = f"encoder.layer.{i}."
        layers.append({
            "attn": {
                "query": _linear(sd, lp + "attention.self.query"),
                "key": _linear(sd, lp + "attention.self.key"),
                "value": _linear(sd, lp + "attention.self.value"),
                "out": _linear(sd, lp + "attention.output.dense"),
            },
            "ln1": _layernorm(sd, lp + "attention.output.LayerNorm"),
            "mlp": {
                "fc1": _linear(sd, lp + "intermediate.dense"),
                "fc2": _linear(sd, lp + "output.dense"),
            },
            "ln2": _layernorm(sd, lp + "output.LayerNorm"),
        })
    params["encoder"] = _pack_layers(layers, scan_layers)
    return params


def port_audio(hf_model, scan_layers: bool = False) -> Dict[str, Any]:
    """ASTModel -> ASTModel (flax) params."""
    sd = {k: v for k, v in hf_model.state_dict().items()}
    params: Dict[str, Any] = {
        "embeddings": {
            "cls_token": _np(sd["embeddings.cls_token"]),
            "distillation_token": _np(sd["embeddings.distillation_token"]),
            "position_embeddings": _np(sd["embeddings.position_embeddings"])[0],
            "patch_embedding": {
                "kernel": _conv_nchw(sd["embeddings.patch_embeddings.projection.weight"]),
                "bias": _np(sd["embeddings.patch_embeddings.projection.bias"]),
            },
        },
        "layernorm": _layernorm(sd, "layernorm"),
    }
    layers = []
    for i in range(hf_model.config.num_hidden_layers):
        lp = f"encoder.layer.{i}."
        layers.append({
            "ln1": _layernorm(sd, lp + "layernorm_before"),
            "ln2": _layernorm(sd, lp + "layernorm_after"),
            "attn": {
                "query": _linear(sd, lp + "attention.attention.query"),
                "key": _linear(sd, lp + "attention.attention.key"),
                "value": _linear(sd, lp + "attention.attention.value"),
                "out": _linear(sd, lp + "attention.output.dense"),
            },
            "mlp": {
                "fc1": _linear(sd, lp + "intermediate.dense"),
                "fc2": _linear(sd, lp + "output.dense"),
            },
        })
    params["encoder"] = _pack_layers(layers, scan_layers)
    return params


class _SubDict:
    """View of a torch state dict under a prefix, presenting .state_dict()/
    .config like an HF module so the port_* functions can consume it."""

    def __init__(self, sd: Dict[str, Any], prefix: str, num_hidden_layers: int):
        self._sd = {k[len(prefix):]: v for k, v in sd.items()
                    if k.startswith(prefix)}

        class _Cfg:
            pass

        self.config = _Cfg()
        self.config.num_hidden_layers = num_hidden_layers

    def state_dict(self):
        return self._sd


def _count_layers(sd: Dict[str, Any], pattern: str) -> int:
    import re

    layers = {int(m.group(1)) for k in sd
              if (m := re.match(pattern, k)) is not None}
    return max(layers) + 1 if layers else 0


def port_tri_clip(torch_state_dict: Dict[str, Any], hf_vision=None,
                  hf_text=None, hf_audio=None) -> Dict[str, Any]:
    """Full reference Tri_CLIP state dict ('model_state_dict' inside the
    CLIP_model_{size}_{captiontype}.tar written by main_pretraining.py:31-59)
    -> TriCLIP (flax) params. HF modules are optional; by default the towers
    are read from the flat state dict itself."""
    sd = torch_state_dict
    if hf_vision is None:
        hf_vision = _SubDict(sd, "vision_model.", _count_layers(
            sd, r"vision_model\.vision_model\.encoder\.layers\.(\d+)\."))
        # port_vision expects the 'vision_model.' HF prefix intact
        hf_vision._sd = {k[len("vision_model."):]: v for k, v in sd.items()
                         if k.startswith("vision_model.")}
    if hf_text is None:
        hf_text = _SubDict(sd, "text_model.", _count_layers(
            sd, r"text_model\.encoder\.layer\.(\d+)\."))
    if hf_audio is None:
        hf_audio = _SubDict(sd, "audio_model.", _count_layers(
            sd, r"audio_model\.encoder\.layer\.(\d+)\."))
    return {
        "vision": port_vision(hf_vision),
        "text": port_text(hf_text),
        "audio": port_audio(hf_audio),
        "vision_projection": {"kernel": _np(sd["vision_projection.weight"]).T},
        "text_projection": {"kernel": _np(sd["text_projection.weight"]).T},
        "audio_projection": {"kernel": _np(sd["audio_projection.weight"]).T},
        "logit_scale_IT": _np(sd["logit_scale_for_IT"]),
        "logit_scale_TA": _np(sd["logit_scale_for_TA"]),
        "logit_scale_AI": _np(sd["logit_scale_for_AI"]),
    }


def load_reference_checkpoint(tar_path: str) -> Dict[str, Any]:
    """Load a reference ``CLIP_model_*.tar`` (torch.save dict with
    'model_state_dict', main_pretraining.py:45-47) into TriCLIP params."""
    import torch

    blob = torch.load(tar_path, map_location="cpu", weights_only=True)
    sd = blob.get("model_state_dict", blob)
    return port_tri_clip(sd)


def load_hf_tower_dir(path: str, modality: str, scan_layers: bool = False):
    """Load one tower from an HF ``save_pretrained`` directory — the
    reference's own per-modality artifact (main_pretraining.py:39-59 writes
    ``CLIP_{image,text,audio}_model_{size}/{des}/`` via save_pretrained with a
    sibling ``projection_head.tar``), or any local snapshot of the stock
    checkpoints (openai/clip-vit-*, FacebookAI/roberta-*, MIT/ast-*).

    Returns ``(flax_tower_params, projection_params_or_None)``.
    """
    import os

    if modality == "vision":
        from transformers import CLIPVisionModel

        hf = CLIPVisionModel.from_pretrained(path)
        tower = port_vision(hf, scan_layers)
    elif modality == "text":
        from transformers import AutoModel

        hf = AutoModel.from_pretrained(path)
        tower = port_text(hf, scan_layers)
    elif modality == "audio":
        from transformers import ASTModel

        hf = ASTModel.from_pretrained(path)
        tower = port_audio(hf, scan_layers)
    else:
        raise ValueError(f"unknown modality {modality!r}")

    proj = None
    proj_path = os.path.join(path, "projection_head.tar")
    if os.path.exists(proj_path):
        import torch

        blob = torch.load(proj_path, map_location="cpu", weights_only=True)
        sd = blob.get("model_state_dict", blob)
        proj = {"kernel": _np(sd["weight"]).T}  # bias-free (model.py:76-78)
    return tower, proj


def port_tri_clip_from_dirs(
    vision_dir: str, text_dir: str, audio_dir: str,
    scan_layers: bool = False, logit_scale_init: float = 2.6592,
) -> Dict[str, Any]:
    """Assemble full TriCLIP params from three per-tower HF directories.

    Every directory must carry the reference's ``projection_head.tar``
    (stock HF checkpoints have no tri-modal projection — pretrain from those
    instead of porting). Logit scales are not part of the per-tower artifact;
    they start at the config init 2.6592 (reference config.py:112).
    """
    params: Dict[str, Any] = {}
    for modality, d in (("vision", vision_dir), ("text", text_dir),
                        ("audio", audio_dir)):
        tower, proj = load_hf_tower_dir(d, modality, scan_layers)
        if proj is None:
            raise FileNotFoundError(
                f"{d}/projection_head.tar not found — the per-tower export "
                "contract (reference main_pretraining.py:44-59) includes the "
                "projection head; stock HF checkpoints have none (run "
                "pretraining instead)")
        params[modality] = tower
        params[f"{modality}_projection"] = proj
    for name in ("logit_scale_IT", "logit_scale_TA", "logit_scale_AI"):
        params[name] = np.asarray(logit_scale_init, np.float32)
    return params
