"""Typed configuration tree for Synergy-TPU.

TPU-native re-design of the reference's config system (reference: ``config.py:1-374``,
which expresses Base/Large hyperparameters as ``@dataclass`` class-attribute namespaces).
Here each config is a frozen, hashable dataclass so it can be passed statically through
``jax.jit`` / ``nnx``/``linen`` module trees without retracing hazards.

Numeric parity notes (all cite /root/reference/config.py):
  * Vision Base  = CLIP ViT-B/16  (lines 7-25);  Large = ViT-L/14 (lines 201-219).
  * Text   Base  = roberta-base   (lines 28-52); Large = roberta-large (lines 222-244).
  * Audio  Base  = AST 12-12 stride (lines 82-102); the "Large" audio tower keeps
    hidden 768 / 12 layers, only strides shrink to 10 (lines 272-292).
  * logit_scale_init_value = 2.6592 (lines 112, 306).
  * Reconstruction decoder layer tables: lines 152-158 / 186-192 (Base),
    340-347 / 361-368 (Large).
The reference declares ``time_stride``/``layer_norm_eps`` for audio as bare annotations
(config.py:88,94) so they are *absent* at runtime and HF defaults win (stride given via
model name, eps 1e-12); we make the real values explicit. The ``hidden_act='glue'`` typo
(config.py:90) is dead config — AST uses gelu; we say gelu.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _freeze(obj):
    return obj


@dataclass(frozen=True)
class VisionConfig:
    """CLIP ViT vision tower config (reference config.py:7-25, 201-219)."""

    model_link: str = "openai/clip-vit-base-patch16"
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    attention_dropout: float = 0.0
    dropout: float = 0.0
    initializer_range: float = 0.02
    initializer_factor: float = 1.0
    ln_impl: Optional[str] = None

    @property
    def seq_len(self) -> int:
        """Token count incl. CLS: Base 197, Large 257 (reference config.py:137,327)."""
        return (self.image_size // self.patch_size) ** 2 + 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def base(cls) -> "VisionConfig":
        return cls()

    @classmethod
    def large(cls) -> "VisionConfig":
        return cls(
            model_link="openai/clip-vit-large-patch14",
            hidden_size=1024,
            intermediate_size=4096,
            num_hidden_layers=24,
            num_attention_heads=16,
            patch_size=14,
            # LN-stat/fc2-dW fusion boundary: an optimization_barrier
            # between residual sum and LN stats measured -4% Large step time
            # but +3.7% on Base, so routed here, not globally
            # (tools/exp_ln.py A/B -- docs/BENCHMARKS.md)
            ln_impl="barrier",
        )


@dataclass(frozen=True)
class TextConfig:
    """RoBERTa text tower config (reference config.py:28-52, 222-244)."""

    model_link: str = "FacebookAI/roberta-base"
    vocab_size: int = 50265
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5
    attention_dropout: float = 0.1
    hidden_dropout: float = 0.1
    bos_token_id: int = 0
    pad_token_id: int = 1
    eos_token_id: int = 2
    initializer_range: float = 0.02
    ln_impl: Optional[str] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def base(cls) -> "TextConfig":
        return cls()

    @classmethod
    def large(cls) -> "TextConfig":
        return cls(
            model_link="FacebookAI/roberta-large",
            hidden_size=1024,
            intermediate_size=4096,
            num_hidden_layers=24,
            num_attention_heads=16,
            # same math as "gelu" (≤4e-6); analytic custom JVP avoids the
            # u16 predicate residuals that feed Large's HLO-remat HBM pressure:
            # +10.4% Large train, measured REGRESSION on Base, so routed
            # here, not globally (models/layers.py exact_gelu docstring)
            hidden_act="gelu_xjvp",
            ln_impl="barrier",  # see VisionConfig.large()
        )


@dataclass(frozen=True)
class AudioConfig:
    """AST audio tower config (reference config.py:82-102, 272-292).

    Input is a (max_length=1024 frames, num_mel_bins=128) log-mel fbank. Patches are
    16x16 convs applied at (frequency_stride, time_stride); Base uses 12/12 (852 tokens
    incl. CLS+distill), the "Large" config only changes strides to 10/10 (1214 tokens).
    """

    model_link: str = "MIT/ast-finetuned-audioset-12-12-0.447"
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    patch_size: int = 16
    frequency_stride: int = 12
    time_stride: int = 12
    max_length: int = 1024
    num_mel_bins: int = 128
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-12
    attention_dropout: float = 0.0
    hidden_dropout: float = 0.0
    qkv_bias: bool = True
    initializer_range: float = 0.02
    ln_impl: Optional[str] = None

    @property
    def freq_patches(self) -> int:
        return (self.num_mel_bins - self.patch_size) // self.frequency_stride + 1

    @property
    def time_patches(self) -> int:
        return (self.max_length - self.patch_size) // self.time_stride + 1

    @property
    def seq_len(self) -> int:
        """Token count incl. CLS+distill: Base 852, Large 1214 (config.py:139,329)."""
        return self.freq_patches * self.time_patches + 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def base(cls) -> "AudioConfig":
        return cls()

    @classmethod
    def large(cls) -> "AudioConfig":
        return cls(
            model_link="MIT/ast-finetuned-audioset-10-10-0.4593",
            frequency_stride=10,
            time_stride=10,
            # see TextConfig.large(): Large-only analytic-JVP GELU routing
            hidden_act="gelu_xjvp",
            ln_impl="barrier",  # see VisionConfig.large()
        )


@dataclass(frozen=True)
class CLIPConfig:
    """Tri-modal CLIP config (reference config.py:105-118, 295-308)."""

    vision: VisionConfig = field(default_factory=VisionConfig.base)
    text: TextConfig = field(default_factory=TextConfig.base)
    audio: AudioConfig = field(default_factory=AudioConfig.base)
    projection_dim: int = 768
    logit_scale_init_value: float = 2.6592
    num_of_modality: int = 3
    is_base: bool = True

    @classmethod
    def base(cls) -> "CLIPConfig":
        return cls()

    @classmethod
    def large(cls) -> "CLIPConfig":
        return cls(
            vision=VisionConfig.large(),
            text=TextConfig.large(),
            audio=AudioConfig.large(),
            projection_dim=1024,
            is_base=False,
        )

    @classmethod
    def tiny(cls) -> "CLIPConfig":
        """Miniature config for tests / dry runs (not in the reference)."""
        return cls(
            vision=VisionConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=2, image_size=32, patch_size=16),
            text=TextConfig(
                vocab_size=1024, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=2,
                max_position_embeddings=66),
            audio=AudioConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=2, max_length=64, num_mel_bins=64,
                frequency_stride=16, time_stride=16),
            projection_dim=32,
        )


@dataclass(frozen=True)
class ReconstructionConfig:
    """Missing-Modality-Reconstruction config (reference config.py:121-196, 310-374).

    ``img_decoder_layer_info``/``aud_decoder_layer_info`` rows are
    (upscale_p, channels, height, width); consecutive rows are paired into Recon blocks
    (reference model.py:487-493).
    """

    clip: CLIPConfig = field(default_factory=CLIPConfig.base)
    projection_dim: int = 768
    vision_length: int = 197
    text_length: int = 32
    audio_length: int = 852
    img_tokens: int = 96
    txt_tokens: int = 96
    aud_tokens: int = 96
    encoder_dim: int = 768
    encoder_bottleneck_dim: int = 128
    encoder_dropout: float = 0.1
    img_size: int = 128
    img_channels: int = 3
    img_decoder_layer_info: Tuple[Tuple[int, int, int, int], ...] = (
        (2, 1024, 4, 4),
        (2, 512, 8, 8),
        (2, 256, 16, 16),
        (2, 128, 32, 32),
        (2, 64, 64, 64),
    )
    decoder_dim: int = 512
    decoder_depth: int = 4
    decoder_heads: int = 8
    decoder_head_dim: int = 128
    decoder_mlp_dim: int = 128
    decoder_dropout: float = 0.1
    aud_size: Tuple[int, int] = (256, 64)
    aud_channels: int = 1
    aud_decoder_layer_info: Tuple[Tuple[int, int, int, int], ...] = (
        (2, 1024, 8, 2),
        (2, 512, 16, 4),
        (2, 256, 32, 8),
        (2, 128, 64, 16),
        (2, 64, 128, 32),
    )

    @classmethod
    def base(cls) -> "ReconstructionConfig":
        return cls()

    @classmethod
    def large(cls) -> "ReconstructionConfig":
        return cls(
            clip=CLIPConfig.large(),
            projection_dim=1024,
            vision_length=257,
            audio_length=1214,
            img_tokens=192,
            txt_tokens=192,
            aud_tokens=192,
            encoder_dim=1024,
            img_decoder_layer_info=(
                (2, 2048, 2, 2),
                (2, 1024, 4, 4),
                (2, 512, 8, 8),
                (2, 256, 16, 16),
                (2, 128, 32, 32),
                (2, 64, 64, 64),
            ),
            decoder_dim=768,
            decoder_depth=6,
            decoder_heads=12,
            decoder_head_dim=192,
            decoder_mlp_dim=192,
            aud_decoder_layer_info=(
                (2, 2048, 4, 1),
                (2, 1024, 8, 2),
                (2, 512, 16, 4),
                (2, 256, 32, 8),
                (2, 128, 64, 16),
                (2, 64, 128, 32),
            ),
        )


@dataclass(frozen=True)
class TrainConfig:
    """Stage-1 pretraining hyperparameters (reference main_pretraining.py:69-95,265-281).

    Batch/accumulation defaults mirror the reference: Base 35/4, Large 14/8 per replica
    (main_pretraining.py:79-80); lr 5e-6 AdamW (:139, :275); loss weights alpha/beta/gamma
    (:166-167, :277-279). ``global_negatives`` is our TPU-native upgrade: all-gather the
    embeddings over the data mesh before the 3 similarity matrices (the reference keeps
    InfoNCE negatives rank-local under DDP, model.py:252-272). Set False for reference
    loss-curve parity.
    """

    seed: int = 17
    epochs: int = 32
    per_device_batch: int = 35
    accum_steps: int = 4
    seq_max_length: int = 32
    learning_rate: float = 5e-6
    weight_decay: float = 0.0
    alpha: float = 1.0
    beta: float = 1.0
    gamma: float = 1.0
    is_base: bool = True
    is_captioned: bool = False
    global_negatives: bool = True
    compute_dtype: str = "bfloat16"

    @classmethod
    def for_size(cls, is_base: bool, **kw) -> "TrainConfig":
        defaults = dict(per_device_batch=35, accum_steps=4) if is_base else dict(
            per_device_batch=14, accum_steps=8)
        defaults.update(kw)
        return cls(is_base=is_base, **defaults)


def clip_config(is_base: bool = True) -> CLIPConfig:
    return CLIPConfig.base() if is_base else CLIPConfig.large()


def recon_config(is_base: bool = True) -> ReconstructionConfig:
    return ReconstructionConfig.base() if is_base else ReconstructionConfig.large()
