"""Port reference MMR-wrapper weights (torch state_dict) into our Flax MMR
modules (models/mmr.py).

The reference's stage-2 checkpoints (``MRL_model_*.tar``, written by
``main_MMR.save_model``, reference main_MMR.py:26-37) hold one of the three
wrapper modules — ``IMG_TXT_2_AUD`` / ``TXT_AUD_2_IMG`` / ``IMG_AUD_2_TXT``
(reference model.py:611-823). This module maps those state dicts onto the
param trees of ``ImgTxt2Aud`` / ``TxtAud2Img`` / ``ImgAud2Txt``:

  * bias-free dim mappers (model.py:619-621,695-697,768-770)
  * ``MultiModal_Encoder`` LN->bottleneck-MLP residual + enc_to_dec
    (model.py:359-384)
  * pixel-shuffle decoders: initial Linear+Unflatten, Recon_Block chain
    (PixelShuffle conv OIHW->HWIO, LayerNorm([C,H,W]) params ->(H,W,C),
    CBAM 1x1 convs -> Dense kernels, spatial 7x7 conv, per-channel MLP),
    final PixelShuffle + 1x1 conv (model.py:386-514, 569-609)
  * transformer text decoder: Conv1d(k=1) expanders -> Dense kernels,
    BatchNorm1d -> flax BatchNorm (params + batch_stats), packed
    ``in_proj_weight`` split into q/k/v, post-LN layers, tied vocab head
    (model.py:516-567)

The frozen tower weights embedded in the wrapper state dict
(``img_encoder.* / txt_encoder.* / aud_encoder.*``) are ignored here — port
those with ``hf_port.port_vision/port_text/port_audio``.

Returned as ``(params, batch_stats)`` ready for
``module.apply({"params": params, "batch_stats": batch_stats}, ...)``
(batch_stats is empty for the img/aud wrappers — only the text decoder has a
BatchNorm).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from synergy_tpu.configs import ReconstructionConfig
from synergy_tpu.interop.hf_port import _layernorm, _np


def _dense(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch Linear -> flax Dense (kernel transposed); bias optional."""
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv2d(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch Conv2d OIHW -> flax Conv HWIO; bias optional."""
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv1x1_as_dense(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch Conv2d(in, out, 1) / Conv1d(in, out, 1) -> flax Dense kernel
    (in, out); bias optional."""
    w = _np(sd[f"{prefix}.weight"])
    w = w.reshape(w.shape[0], w.shape[1])  # (out, in)
    out = {"kernel": w.T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _ln_chw(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch LayerNorm([C, H, W]) -> LayerNormCHW params stored (H, W, C)."""
    return {
        "scale": _np(sd[f"{prefix}.weight"]).transpose(1, 2, 0),
        "bias": _np(sd[f"{prefix}.bias"]).transpose(1, 2, 0),
    }


def _mm_encoder(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """MultiModal_Encoder (reference model.py:359-384): encoder.0 LN,
    encoder.1/.4 Linears, enc_to_dec."""
    return {
        "norm": _layernorm(sd, f"{prefix}.encoder.0"),
        "fc1": _dense(sd, f"{prefix}.encoder.1"),
        "fc2": _dense(sd, f"{prefix}.encoder.4"),
        "enc_to_dec": _dense(sd, f"{prefix}.enc_to_dec"),
    }


def _cbam(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """CBAM (reference model.py:399-427): two shared bias-free 1x1 convs for
    the channel gate + one 7x7 bias-free conv for the spatial gate."""
    return {
        "ca_fc1": _conv1x1_as_dense(sd, f"{prefix}.channel_attention.1"),
        "ca_fc2": _conv1x1_as_dense(sd, f"{prefix}.channel_attention.3"),
        "sa_conv": _conv2d(sd, f"{prefix}.spatial_attention.0"),
    }


def _recon_block(sd: Dict[str, Any], prefix: str, has_shuffle: bool
                 ) -> Dict[str, Any]:
    """Recon_Block (reference model.py:448-474)."""
    out = {
        "att_norm": _ln_chw(sd, f"{prefix}.attention.0"),
        "cbam": _cbam(sd, f"{prefix}.attention.1"),
        "ff_norm": _ln_chw(sd, f"{prefix}.feedforward.0"),
        "mlp": {
            "fc1": _dense(sd, f"{prefix}.feedforward.1.layer.0"),
            "fc2": _dense(sd, f"{prefix}.feedforward.1.layer.2"),
        },
    }
    if has_shuffle:
        out["shuffle"] = {"conv": _conv2d(sd, f"{prefix}.pixel_shuffle.conv")}
    return out


def _shuffle_decoder(sd: Dict[str, Any], prefix: str,
                     layer_info) -> Dict[str, Any]:
    """IMG_Decoder / AUD_Decoder body (reference model.py:476-514, 569-609)."""
    body: Dict[str, Any] = {"initial": _dense(sd, f"{prefix}.initial_layer.0")}
    pairs = list(zip(layer_info[:-1], layer_info[1:]))
    for idx, ((up_p, *_), _out_row) in enumerate(pairs, start=1):
        body[f"recon_{idx}"] = _recon_block(
            sd, f"{prefix}.recon_layer.recon_layer_{idx}", up_p > 1)
    body["final_shuffle"] = {
        "conv": _conv2d(sd, f"{prefix}.final_layer.0.conv")}
    body["final_conv"] = _conv2d(sd, f"{prefix}.final_layer.1")
    return {"body": body}


def _txt_decoder(sd: Dict[str, Any], prefix: str, depth: int
                 ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """TXT_Decoder (reference model.py:516-567). Returns (params,
    batch_stats)."""
    params: Dict[str, Any] = {
        "expand1": _conv1x1_as_dense(sd, f"{prefix}.dim_to_tokens.0"),
        "expand2": _conv1x1_as_dense(sd, f"{prefix}.dim_to_tokens.3"),
        "bn": {
            "scale": _np(sd[f"{prefix}.dim_to_tokens.1.weight"]),
            "bias": _np(sd[f"{prefix}.dim_to_tokens.1.bias"]),
        },
        "pos_embedding": _np(sd[f"{prefix}.decoder_pos_emb"]),
        "to_words": _dense(sd, f"{prefix}.to_words"),
    }
    layers: Dict[str, Any] = {}
    for i in range(depth):
        lp = f"{prefix}.decoder.layers.{i}"
        in_w = _np(sd[f"{lp}.self_attn.in_proj_weight"])  # (3D, D)
        in_b = _np(sd[f"{lp}.self_attn.in_proj_bias"])
        d = in_w.shape[1]
        wq, wk, wv = in_w[:d], in_w[d:2 * d], in_w[2 * d:]
        bq, bk, bv = in_b[:d], in_b[d:2 * d], in_b[2 * d:]
        layers[f"layer_{i}"] = {
            "attn": {
                "query": {"kernel": wq.T, "bias": bq},
                "key": {"kernel": wk.T, "bias": bk},
                "value": {"kernel": wv.T, "bias": bv},
                "out": _dense(sd, f"{lp}.self_attn.out_proj"),
            },
            "mlp": {
                "fc1": _dense(sd, f"{lp}.linear1"),
                "fc2": _dense(sd, f"{lp}.linear2"),
            },
            "ln1": _layernorm(sd, f"{lp}.norm1"),
            "ln2": _layernorm(sd, f"{lp}.norm2"),
        }
    params["decoder"] = layers
    batch_stats = {
        "bn": {
            "mean": _np(sd[f"{prefix}.dim_to_tokens.1.running_mean"]),
            "var": _np(sd[f"{prefix}.dim_to_tokens.1.running_var"]),
        }
    }
    return params, batch_stats


_MAPPER_KEYS = ("img_dim_mapper", "txt_dim_mapper", "aud_dim_mapper")


def port_mmr_wrapper(sd: Dict[str, Any], target: str,
                     config: ReconstructionConfig | None = None
                     ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Map a reference MMR wrapper state_dict onto our Flax wrapper params.

    ``target`` is the reconstructed modality: ``"aud"`` (IMG_TXT_2_AUD),
    ``"img"`` (TXT_AUD_2_IMG) or ``"txt"`` (IMG_AUD_2_TXT) — matching the
    reference's ``--MM`` flag (main_MMR.py:98-109).
    """
    cfg = config or ReconstructionConfig.base()
    params: Dict[str, Any] = {}
    for name in _MAPPER_KEYS:
        if f"{name}.weight" in sd:
            params[name] = _dense(sd, name)
    if "mm_encoder.enc_to_dec.weight" in sd:
        params["mm_encoder"] = _mm_encoder(sd, "mm_encoder")
    batch_stats: Dict[str, Any] = {}
    if target == "aud":
        params["decoder"] = _shuffle_decoder(
            sd, "decoder", cfg.aud_decoder_layer_info)
    elif target == "img":
        params["decoder"] = _shuffle_decoder(
            sd, "decoder", cfg.img_decoder_layer_info)
    elif target == "txt":
        dec, bs = _txt_decoder(sd, "decoder", cfg.decoder_depth)
        params["decoder"] = dec
        batch_stats = {"decoder": bs}
    else:
        raise ValueError(f"target must be img/txt/aud, got {target!r}")
    return params, batch_stats
