"""CLIP vision tower (ViT) in Flax.

Behavioral equivalent of HF ``CLIPVisionModel`` as instantiated by the
reference (reference model.py:71; dims reference config.py:7-25, 201-219):
conv patch embed (no bias), class token, learned position embeddings,
pre-LN encoder with quick_gelu, and pooler = post_layernorm(CLS of last
hidden state). Returns ``(last_hidden_state, pooler_output)`` to mirror the
reference's ``outputs[0] / outputs[1]`` access pattern.

Weight-port parity vs the HF torch module is asserted (<=1e-4) in
tests/test_towers.py via interop/hf_port.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from synergy_tpu.configs import VisionConfig
from synergy_tpu.models.layers import TransformerEncoder, _ConvParams
from synergy_tpu.ops.patchify import patch_embed


class ViTEmbeddings(nn.Module):
    config: VisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        # accept NCHW (reference/HF layout); patchify runs NHWC on TPU
        x = jnp.transpose(pixel_values, (0, 2, 3, 1)).astype(self.dtype)
        # param layout/init identical to nn.Conv(use_bias=False); the compute
        # is a reshape + matmul (ops/patchify.py) — the XLA conv runs far off
        # the MXU rate at these shapes
        kernel = _ConvParams(cfg.hidden_size, cfg.patch_size, use_bias=False,
                             name="patch_embedding")(x.shape[-1])[0]
        patches = patch_embed(x, kernel.astype(self.dtype), None,
                              (cfg.patch_size, cfg.patch_size))
        b = patches.shape[0]
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(stddev=0.02),
            (cfg.hidden_size,), jnp.float32,
        ).astype(self.dtype)
        cls = jnp.broadcast_to(cls, (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(stddev=0.02),
            (cfg.seq_len, cfg.hidden_size), jnp.float32,
        ).astype(self.dtype)
        return x + pos


class ViTModel(nn.Module):
    config: VisionConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    remat: bool = False
    scan_layers: bool = False

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        x = ViTEmbeddings(cfg, self.dtype, name="embeddings")(pixel_values)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="pre_layernorm")(x)
        x = TransformerEncoder(
            num_layers=cfg.num_hidden_layers,
            num_heads=cfg.num_attention_heads,
            head_dim=cfg.head_dim,
            intermediate_size=cfg.intermediate_size,
            act=cfg.hidden_act,
            layer_norm_eps=cfg.layer_norm_eps,
            pre_norm=True,
            dropout=cfg.dropout,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            scan_layers=self.scan_layers,
            ln_impl=cfg.ln_impl,
            name="encoder",
        )(x)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="post_layernorm")(x[:, 0, :])
        return x, pooled
