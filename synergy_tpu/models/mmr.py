"""Missing-Modality Reconstruction (MMR) stack in Flax.

Re-design of the reference's stage-2 model zoo (reference model.py:283-823):
  * ``MultiModalEncoder``  — residual bottleneck MLP + enc->dec projection
    (model.py:359-384)
  * ``PixelShuffleBlock``  — 3x3 conv -> pixel shuffle -> ReLU (model.py:386-397)
  * ``CBAM``               — channel+spatial attention (model.py:399-427);
    the reference sums two *sigmoided* channel gates (range [0,2]) — we keep
    that exact behavior.
  * ``SpatialMLP``         — per-channel MLP over flattened HxW (model.py:429-446)
  * ``ReconBlock``         — shuffle + LN/CBAM residual + LN/MLP residual
    (model.py:448-474)
  * ``IMGDecoder``/``AUDDecoder`` — linear expand + ReconBlock chain + final
    shuffle to pixels (model.py:476-514, 569-609)
  * ``TXTDecoder``         — conv1d token expander + post-LN transformer +
    vocab head (model.py:516-567; the ffn dim is torch's
    TransformerEncoderLayer default 2048)
  * task wrappers ``ImgTxt2Aud``/``TxtAud2Img``/``ImgAud2Txt``
    (model.py:611-823): frozen-tower features (stop_gradient here vs torch
    no_grad), bias-free dim mappers, sum fusion, decoder, and the
    ``alpha*(1-SSIM) + (1-alpha)*recon`` losses.

Decoder feature maps run NHWC (TPU conv layout); LayerNorm over (C, H, W)
keeps torch's normalized axes (all but batch) with params stored HWC.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from synergy_tpu.configs import ReconstructionConfig
from synergy_tpu.models.layers import TransformerEncoder
from synergy_tpu.ops.pixel_shuffle import pixel_shuffle_nhwc

# torch nn.Linear / nn.Conv default init: kaiming_uniform(a=sqrt(5)) ==
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for the kernel, same bound for the
# bias. This is NOT cosmetic: with flax's default (lecun_normal + zero
# bias) the conv decoders stall at the batch-mean solution (MSE == label
# variance, flat for hundreds of steps), while from the torch init the
# SAME modules + optimizer memorize the reference's single-batch regime
# (measured against /root/reference/model.py's own training trajectory —
# see docs/BENCHMARKS.md MMR quality endpoint).
TORCH_KERNEL_INIT = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _dense(features: int, fan_in: int, use_bias: bool = True,
           dtype=jnp.float32, name: str = None) -> nn.Dense:
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name,
                    kernel_init=TORCH_KERNEL_INIT,
                    bias_init=torch_bias_init(fan_in))


class MultiModalEncoder(nn.Module):
    """x + MLP(LN(x)) then enc->dec projection (reference model.py:359-384)."""

    config: ReconstructionConfig
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        h = _dense(cfg.encoder_bottleneck_dim, cfg.encoder_dim,
                   dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(cfg.encoder_dropout,
                       deterministic=self.deterministic)(h)
        h = _dense(cfg.encoder_dim, cfg.encoder_bottleneck_dim,
                   dtype=self.dtype, name="fc2")(h)
        x = x + h
        return _dense(cfg.decoder_dim, cfg.encoder_dim, dtype=self.dtype,
                      name="enc_to_dec")(x)


class PixelShuffleBlock(nn.Module):
    out_ch: int
    upscale: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC
        x = nn.Conv(self.out_ch * self.upscale ** 2, (3, 3), padding=1,
                    dtype=self.dtype, name="conv",
                    kernel_init=TORCH_KERNEL_INIT,
                    bias_init=torch_bias_init(x.shape[-1] * 9))(x)
        x = pixel_shuffle_nhwc(x, self.upscale)
        return jax.nn.relu(x)


class CBAM(nn.Module):
    channels: int
    reduction_ratio: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC
        red = max(1, self.channels // self.reduction_ratio)
        fc1 = _dense(red, self.channels, use_bias=False, dtype=self.dtype,
                     name="ca_fc1")
        fc2 = _dense(self.channels, red, use_bias=False, dtype=self.dtype,
                     name="ca_fc2")

        def gate(pooled):  # (B, C)
            return jax.nn.sigmoid(fc2(jax.nn.relu(fc1(pooled))))

        max_pool = jnp.max(x, axis=(1, 2))
        avg_pool = jnp.mean(x, axis=(1, 2))
        # reference sums the two sigmoided gates (model.py:417-419)
        ca = gate(max_pool) + gate(avg_pool)
        x = x * ca[:, None, None, :]

        max_sp = jnp.max(x, axis=-1, keepdims=True)
        avg_sp = jnp.mean(x, axis=-1, keepdims=True)
        sp = jnp.concatenate([max_sp, avg_sp], axis=-1)
        sa = nn.Conv(1, (7, 7), padding=3, use_bias=False, dtype=self.dtype,
                     name="sa_conv", kernel_init=TORCH_KERNEL_INIT)(sp)
        return x * jax.nn.sigmoid(sa)


class LayerNormCHW(nn.Module):
    """torch nn.LayerNorm([C, H, W]) over NHWC data: normalizes over all
    non-batch axes with a per-element (H, W, C) affine."""

    shape_hwc: Tuple[int, int, int]
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, self.shape_hwc,
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, self.shape_hwc,
                          jnp.float32)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class SpatialMLP(nn.Module):
    """Per-channel MLP over flattened HxW (reference model.py:429-446)."""

    spatial: int
    hidden: int = 3072
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC
        b, h, w, c = x.shape
        y = x.transpose(0, 3, 1, 2).reshape(b, c, h * w)
        y = _dense(self.hidden, h * w, dtype=self.dtype, name="fc1")(y)
        y = jax.nn.relu(y)
        y = _dense(self.spatial, self.hidden, dtype=self.dtype, name="fc2")(y)
        return y.reshape(b, c, h, w).transpose(0, 2, 3, 1)


class ReconBlock(nn.Module):
    out_ch: int
    out_h: int
    out_w: int
    upscale: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC
        if self.upscale > 1:
            x = PixelShuffleBlock(self.out_ch, self.upscale, self.dtype,
                                  name="shuffle")(x)
        att = LayerNormCHW((self.out_h, self.out_w, self.out_ch),
                           dtype=self.dtype, name="att_norm")(x)
        att = CBAM(self.out_ch, dtype=self.dtype, name="cbam")(att)
        x = x + att
        ff = LayerNormCHW((self.out_h, self.out_w, self.out_ch),
                          dtype=self.dtype, name="ff_norm")(x)
        ff = SpatialMLP(self.out_h * self.out_w, dtype=self.dtype,
                        name="mlp")(ff)
        return x + ff


class _ShuffleDecoder(nn.Module):
    """Shared pixel-shuffle decoder body (IMG/AUD differ only in layer info
    and output channels; reference model.py:476-514 vs 569-609)."""

    config: ReconstructionConfig
    layer_info: Tuple[Tuple[int, int, int, int], ...]
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embed):  # (B, decoder_dim) -> NHWC image
        info = self.layer_info
        _, c0, h0, w0 = info[0]
        x = _dense(c0 * h0 * w0, embed.shape[-1], dtype=self.dtype,
                   name="initial")(embed)
        # torch unflattens to (C, H, W); keep that ordering, then go NHWC
        x = x.reshape(-1, c0, h0, w0).transpose(0, 2, 3, 1)
        for idx, ((up_p, _, _, _), (_, oc, oh, ow)) in enumerate(
                zip(info[:-1], info[1:]), start=1):
            x = ReconBlock(oc, oh, ow, up_p, self.dtype,
                           name=f"recon_{idx}")(x)
        x = PixelShuffleBlock(self.channels, 2, self.dtype, name="final_shuffle")(x)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="final_conv",
                    kernel_init=TORCH_KERNEL_INIT,
                    bias_init=torch_bias_init(self.channels))(x)
        return x


class IMGDecoder(nn.Module):
    config: ReconstructionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embed):
        cfg = self.config
        x = _ShuffleDecoder(cfg, tuple(cfg.img_decoder_layer_info),
                            cfg.img_channels, self.dtype, name="body")(embed)
        return x.transpose(0, 3, 1, 2)  # NCHW out, like the reference


class AUDDecoder(nn.Module):
    config: ReconstructionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embed, squeeze: bool = True):
        cfg = self.config
        x = _ShuffleDecoder(cfg, tuple(cfg.aud_decoder_layer_info),
                            cfg.aud_channels, self.dtype, name="body")(embed)
        x = x.transpose(0, 3, 1, 2)
        return x[:, 0] if squeeze else x


class TXTDecoder(nn.Module):
    config: ReconstructionConfig
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, txt_embed):  # (B, 1, decoder_dim)
        cfg = self.config
        # conv1d(k=1) over the token axis == Dense over that axis
        x = jnp.swapaxes(txt_embed, 1, 2)  # (B, D, 1)
        x = _dense(cfg.txt_tokens, 1, dtype=self.dtype, name="expand1")(x)
        x = nn.BatchNorm(use_running_average=self.deterministic,
                         momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         axis=-1, name="bn")(x)
        x = jax.nn.relu(x)
        x = _dense(cfg.text_length, cfg.txt_tokens, dtype=self.dtype,
                   name="expand2")(x)
        x = jnp.swapaxes(x, 1, 2)  # (B, text_length, D)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, cfg.text_length, cfg.decoder_dim), jnp.float32)
        x = x + pos.astype(self.dtype)
        x = TransformerEncoder(
            num_layers=cfg.decoder_depth,
            num_heads=cfg.decoder_heads,
            head_dim=cfg.decoder_dim // cfg.decoder_heads,
            intermediate_size=2048,  # torch TransformerEncoderLayer default
            act="gelu",
            pre_norm=False,
            dropout=cfg.decoder_dropout,
            dtype=self.dtype,
            deterministic=self.deterministic,
            # trained from scratch (unlike the HF towers, which port
            # pretrained weights): match torch nn.TransformerEncoderLayer's
            # init so the from-scratch trajectory matches the reference's —
            # the same init-distribution effect the conv decoders measured
            torch_init=True,
            name="decoder",
        )(x)
        # torch kernel init; the bias is explicitly ZERO-initialized in the
        # reference (model.py:549-551 replaces to_words.bias with zeros)
        return nn.Dense(cfg.clip.text.vocab_size, dtype=self.dtype,
                        name="to_words", kernel_init=TORCH_KERNEL_INIT)(x)


class ImgTxt2Aud(nn.Module):
    """Fuse image+text pooler features, decode the spectrogram
    (reference model.py:611-683). Tower features come in pre-computed (and
    stop_gradient-ed by the caller == the reference's torch.no_grad)."""

    config: ReconstructionConfig
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, img_pooled, txt_pooled):
        cfg = self.config
        img = nn.Dense(cfg.encoder_dim, use_bias=False, dtype=self.dtype,
                       kernel_init=TORCH_KERNEL_INIT,
                       name="img_dim_mapper")(img_pooled)[:, None, :]
        txt = nn.Dense(cfg.encoder_dim, use_bias=False, dtype=self.dtype,
                       kernel_init=TORCH_KERNEL_INIT,
                       name="txt_dim_mapper")(txt_pooled)[:, None, :]
        mm = img + txt
        mm = MultiModalEncoder(cfg, self.dtype, self.deterministic,
                               name="mm_encoder")(mm)[:, 0, :]
        return AUDDecoder(cfg, self.dtype, name="decoder")(mm)


class TxtAud2Img(nn.Module):
    """Fuse avg-pooled text+audio last-hidden-states, decode the image
    (reference model.py:685-757)."""

    config: ReconstructionConfig
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, txt_lhs, aud_lhs):
        cfg = self.config
        txt = jnp.mean(txt_lhs, axis=1, keepdims=True)
        aud = jnp.mean(aud_lhs, axis=1, keepdims=True)
        txt = nn.Dense(cfg.encoder_dim, use_bias=False, dtype=self.dtype,
                       kernel_init=TORCH_KERNEL_INIT,
                       name="txt_dim_mapper")(txt)
        aud = nn.Dense(cfg.encoder_dim, use_bias=False, dtype=self.dtype,
                       kernel_init=TORCH_KERNEL_INIT,
                       name="aud_dim_mapper")(aud)
        mm = txt + aud
        mm = MultiModalEncoder(cfg, self.dtype, self.deterministic,
                               name="mm_encoder")(mm)[:, 0, :]
        return IMGDecoder(cfg, self.dtype, name="decoder")(mm)


class ImgAud2Txt(nn.Module):
    """Fuse avg-pooled image+audio last-hidden-states, decode token logits
    (reference model.py:759-823)."""

    config: ReconstructionConfig
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, img_lhs, aud_lhs):
        cfg = self.config
        img = jnp.mean(img_lhs, axis=1, keepdims=True)
        aud = jnp.mean(aud_lhs, axis=1, keepdims=True)
        img = nn.Dense(cfg.encoder_dim, use_bias=False, dtype=self.dtype,
                       kernel_init=TORCH_KERNEL_INIT,
                       name="img_dim_mapper")(img)
        aud = nn.Dense(cfg.encoder_dim, use_bias=False, dtype=self.dtype,
                       kernel_init=TORCH_KERNEL_INIT,
                       name="aud_dim_mapper")(aud)
        mm = img + aud
        mm = MultiModalEncoder(cfg, self.dtype, self.deterministic,
                               name="mm_encoder")(mm)
        return TXTDecoder(cfg, self.dtype, self.deterministic,
                          name="decoder")(mm)
