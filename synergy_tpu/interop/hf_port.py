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


def port_vision(hf_model) -> Dict[str, Any]:
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
        "encoder": {},
    }
    n_layers = hf_model.config.num_hidden_layers
    for i in range(n_layers):
        lp = f"{p}encoder.layers.{i}."
        params["encoder"][f"layer_{i}"] = {
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
        }
    return params


def port_text(hf_model) -> Dict[str, Any]:
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
        "encoder": {},
    }
    for i in range(hf_model.config.num_hidden_layers):
        lp = f"encoder.layer.{i}."
        params["encoder"][f"layer_{i}"] = {
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
        }
    return params


def port_audio(hf_model) -> Dict[str, Any]:
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
        "encoder": {},
    }
    for i in range(hf_model.config.num_hidden_layers):
        lp = f"encoder.layer.{i}."
        params["encoder"][f"layer_{i}"] = {
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
        }
    return params


def port_tri_clip(torch_state_dict: Dict[str, Any], hf_vision, hf_text,
                  hf_audio) -> Dict[str, Any]:
    """Full reference Tri_CLIP checkpoint ('model_state_dict' from
    main_pretraining.py save_model) -> TriCLIP (flax) params."""
    sd = torch_state_dict
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
