"""RoBERTa text tower in Flax.

Behavioral equivalent of HF ``AutoModel('FacebookAI/roberta-base')`` as used
by the reference (reference model.py:72; dims reference config.py:28-52,
222-244): learned position embeddings with the RoBERTa pad-offset convention
(position ids start at pad_token_id+1 and only advance on non-pad tokens),
post-LN encoder with exact gelu, and a tanh pooler over the CLS token —
``outputs[1]`` is what Tri_CLIP projects (reference model.py:237-238).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from synergy_tpu.configs import TextConfig
from synergy_tpu.models.layers import TransformerEncoder, mask_to_bias


def create_position_ids(input_ids: jnp.ndarray, pad_token_id: int) -> jnp.ndarray:
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + pad_token_id


class RobertaEmbeddings(nn.Module):
    config: TextConfig
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, input_ids, position_ids=None):
        cfg = self.config
        if position_ids is None:
            position_ids = create_position_ids(input_ids, cfg.pad_token_id)
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, name="position_embeddings")(position_ids)
        token_type = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                              dtype=self.dtype, name="token_type_embeddings")(
            jnp.zeros_like(input_ids))
        x = word + pos + token_type
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm")(x)
        return nn.Dropout(cfg.hidden_dropout,
                          deterministic=self.deterministic)(x)


class RobertaModel(nn.Module):
    config: TextConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    deterministic: bool = True
    remat: bool = False
    scan_layers: bool = False

    @nn.compact
    def __call__(self, input_ids, attention_mask=None,
                 position_ids=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        x = RobertaEmbeddings(cfg, self.dtype, self.deterministic,
                              name="embeddings")(input_ids, position_ids)
        bias = mask_to_bias(attention_mask, jnp.float32)
        x = TransformerEncoder(
            num_layers=cfg.num_hidden_layers,
            num_heads=cfg.num_attention_heads,
            head_dim=cfg.head_dim,
            intermediate_size=cfg.intermediate_size,
            act=cfg.hidden_act,
            layer_norm_eps=cfg.layer_norm_eps,
            pre_norm=False,
            dropout=cfg.hidden_dropout,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            deterministic=self.deterministic,
            remat=self.remat,
            scan_layers=self.scan_layers,
            ln_impl=cfg.ln_impl,
            name="encoder",
        )(x, bias)
        pooled = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="pooler")(x[:, 0, :])
        pooled = jnp.tanh(pooled)
        return x, pooled
