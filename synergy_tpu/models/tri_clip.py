"""Tri-modal CLIP: three towers + three projections + three logit scales.

Flax re-design of the reference ``Tri_CLIP`` (reference model.py:60-281):
  * towers: ViT / RoBERTa / AST (models/{vit,roberta,ast}.py)
  * one bias-free linear projection per modality into the shared space
    (reference model.py:76-78)
  * three independent learnable logit scales, init 2.6592
    (reference model.py:80-82, config.py:112)
  * features = projection(pooler_output) (reference model.py:84-124)

The forward returns L2-normalized embeddings + scales; losses live in
losses.py so negatives semantics (global vs rank-local) is a training-step
decision, not a model one. ``get_img_txt_sim_score`` / ``get_aud_txt_sim_score``
mirror the reference's zero-shot entry points (reference model.py:126-203).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from synergy_tpu.configs import CLIPConfig
from synergy_tpu.losses import l2_normalize
from synergy_tpu.models.ast import ASTModel
from synergy_tpu.models.roberta import RobertaModel
from synergy_tpu.models.vit import ViTModel


class TriCLIP(nn.Module):
    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    deterministic: bool = True
    remat: bool = False
    scan_layers: bool = False

    def setup(self):
        cfg = self.config
        self.vision = ViTModel(cfg.vision, self.dtype, self.attn_impl,
                               self.remat, self.scan_layers, name="vision")
        self.text = RobertaModel(cfg.text, self.dtype, self.attn_impl,
                                 self.deterministic, self.remat,
                                 self.scan_layers, name="text")
        self.audio = ASTModel(cfg.audio, self.dtype, self.attn_impl,
                              self.remat, self.scan_layers, name="audio")
        proj = lambda name: nn.Dense(cfg.projection_dim, use_bias=False,
                                     dtype=self.dtype, name=name)
        self.vision_projection = proj("vision_projection")
        self.text_projection = proj("text_projection")
        self.audio_projection = proj("audio_projection")
        init = nn.initializers.constant(cfg.logit_scale_init_value)
        self.logit_scale_IT = self.param("logit_scale_IT", init, (), jnp.float32)
        self.logit_scale_TA = self.param("logit_scale_TA", init, (), jnp.float32)
        self.logit_scale_AI = self.param("logit_scale_AI", init, (), jnp.float32)

    # --- per-modality features (reference model.py:84-124) ---
    def get_image_features(self, pixel_values):
        _, pooled = self.vision(pixel_values)
        return self.vision_projection(pooled)

    def get_text_features(self, input_ids, attention_mask=None, position_ids=None):
        _, pooled = self.text(input_ids, attention_mask, position_ids)
        return self.text_projection(pooled)

    def get_audio_features(self, input_values):
        _, pooled = self.audio(input_values)
        return self.audio_projection(pooled)

    # --- zero-shot similarity scores (reference model.py:126-203) ---
    def get_img_txt_sim_score(self, pixel_values, input_ids, attention_mask=None):
        img = l2_normalize(self.get_image_features(pixel_values).astype(jnp.float32))
        txt = l2_normalize(self.get_text_features(input_ids, attention_mask).astype(jnp.float32))
        return img @ txt.T * jnp.exp(self.logit_scale_IT)

    def get_aud_txt_sim_score(self, input_values, input_ids, attention_mask=None):
        aud = l2_normalize(self.get_audio_features(input_values).astype(jnp.float32))
        txt = l2_normalize(self.get_text_features(input_ids, attention_mask).astype(jnp.float32))
        return txt @ aud.T * jnp.exp(self.logit_scale_TA)

    def encode_towers(self, pixel_values, input_ids, attention_mask, input_values):
        """Raw tower outputs: ((lhs, pooled) x3) — the reference's
        return_lhs path feeding MMR (reference model.py:279-280)."""
        return (self.vision(pixel_values),
                self.text(input_ids, attention_mask),
                self.audio(input_values))

    def __call__(self, pixel_values, input_ids, attention_mask,
                 input_values) -> Dict[str, Any]:
        img = self.get_image_features(pixel_values).astype(jnp.float32)
        txt = self.get_text_features(input_ids, attention_mask).astype(jnp.float32)
        aud = self.get_audio_features(input_values).astype(jnp.float32)
        return {
            "image_embeds": l2_normalize(img),
            "text_embeds": l2_normalize(txt),
            "audio_embeds": l2_normalize(aud),
            "logit_scale_IT": self.logit_scale_IT,
            "logit_scale_TA": self.logit_scale_TA,
            "logit_scale_AI": self.logit_scale_AI,
        }
