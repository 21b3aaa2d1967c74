"""Audio Spectrogram Transformer (AST) tower in Flax.

Behavioral equivalent of HF ``ASTModel`` as used by the reference
(reference model.py:74; dims reference config.py:82-102, 272-292): a 16x16
conv patch embed applied at (frequency_stride, time_stride) over the
(1024 frames, 128 mel) fbank, CLS + distillation tokens, learned position
embeddings, pre-LN ViT encoder with exact gelu, final LayerNorm over the
sequence, and pooler = mean(CLS, distill). Base strides 12/12 -> 852 tokens;
"Large" strides 10/10 -> 1214 tokens (reference config.py:137-139, 327-329).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from synergy_tpu.configs import AudioConfig
from synergy_tpu.models.layers import TransformerEncoder, _ConvParams
from synergy_tpu.ops.patchify import patch_embed


class ASTEmbeddings(nn.Module):
    config: AudioConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        # (B, time=1024, mel=128) -> NHWC with H=mel (frequency), W=time,
        # matching HF's unsqueeze(1).transpose(2, 3) conv layout.
        x = jnp.transpose(input_values, (0, 2, 1))[..., None].astype(self.dtype)
        # nn.Conv-compatible params; compute via one-hot gather matmuls
        # (ops/patchify.py — the overlapping stride-12 conv measured 14 TF/s
        # on v5e, 5.5x slower than this formulation, and pinned a relayout
        # copy on its input)
        kernel, bias = _ConvParams(cfg.hidden_size, cfg.patch_size,
                                   use_bias=True, name="patch_embedding")(1)
        patches = patch_embed(x, kernel.astype(self.dtype),
                              bias.astype(self.dtype),
                              (cfg.frequency_stride, cfg.time_stride))
        b = patches.shape[0]
        patches = patches.reshape(b, -1, cfg.hidden_size)  # freq-major order
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.hidden_size), jnp.float32)
        dist = self.param("distillation_token", nn.initializers.zeros,
                          (1, 1, cfg.hidden_size), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size))
        dist = jnp.broadcast_to(dist.astype(self.dtype), (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, dist, patches], axis=1)
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (cfg.seq_len, cfg.hidden_size), jnp.float32)
        return x + pos.astype(self.dtype)


class ASTModel(nn.Module):
    config: AudioConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    remat: bool = False
    scan_layers: bool = False

    @nn.compact
    def __call__(self, input_values: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        x = ASTEmbeddings(cfg, self.dtype, name="embeddings")(input_values)
        x = TransformerEncoder(
            num_layers=cfg.num_hidden_layers,
            num_heads=cfg.num_attention_heads,
            head_dim=cfg.head_dim,
            intermediate_size=cfg.intermediate_size,
            act=cfg.hidden_act,
            layer_norm_eps=cfg.layer_norm_eps,
            pre_norm=True,
            dropout=cfg.hidden_dropout,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            scan_layers=self.scan_layers,
            ln_impl=cfg.ln_impl,
            name="encoder",
        )(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layernorm")(x)
        pooled = (x[:, 0, :] + x[:, 1, :]) / 2.0
        return x, pooled
