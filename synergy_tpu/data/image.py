"""Image preprocessing as pure, jittable JAX functions.

TPU-native replacement for the reference's torchvision transform chains:
  * train chain (reference main_pretraining.py:102-116): Resize(224) ->
    RandomResizedCrop(224) -> RandomChoice(HFlip p=.5, VFlip p=.15) ->
    RandomApply(ColorJitter(.075 x4), p=.5) -> ToTensor -> Normalize(CLIP).
  * eval chain (HF CLIPImageProcessor, used by Dataset_Step23 at
    reference dataset.py:216-217): resize shortest edge 224 bicubic ->
    center crop 224 -> rescale 1/255 -> Normalize(CLIP).

Everything here operates on float32 HWC images in [0, 1] (batch variants via
vmap) and is designed to run *on device*, fused into the training step, so the
host pipeline only decodes JPEGs. Crops are expressed with
``jax.image.scale_and_translate`` so shapes stay static under jit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize(img: jnp.ndarray, mean=CLIP_MEAN, std=CLIP_STD) -> jnp.ndarray:
    mean = jnp.asarray(mean, img.dtype)
    std = jnp.asarray(std, img.dtype)
    return (img - mean) / std


def resize(img: jnp.ndarray, size: Tuple[int, int], method: str = "bilinear",
           antialias: bool = True) -> jnp.ndarray:
    return jax.image.resize(
        img, (*size, img.shape[-1]), method=method, antialias=antialias)


def resize_shortest_edge(img: jnp.ndarray, size: int,
                         method: str = "bicubic") -> jnp.ndarray:
    """Resize so the shortest edge equals ``size`` (static shapes only)."""
    h, w = img.shape[0], img.shape[1]
    if h <= w:
        out = (size, int(round(w * size / h)))
    else:
        out = (int(round(h * size / w)), size)
    return resize(img, out, method=method)


def center_crop(img: jnp.ndarray, size: int) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    top = (h - size) // 2
    left = (w - size) // 2
    return jax.lax.dynamic_slice(img, (top, left, 0), (size, size, img.shape[-1]))


def crop_and_resize(img: jnp.ndarray, top, left, height, width,
                    out_size: int, method: str = "bilinear") -> jnp.ndarray:
    """Crop box (possibly traced coords) then resize to (out_size, out_size),
    with static output shape, via scale_and_translate."""
    scale_y = out_size / height
    scale_x = out_size / width
    # output pixel o maps to input (o + 0.5)/scale - 0.5 + top, i.e.
    # translation = (0.5*scale - 0.5) - top*scale
    translate_y = (0.5 * scale_y - 0.5) - top * scale_y
    translate_x = (0.5 * scale_x - 0.5) - left * scale_x
    return jax.image.scale_and_translate(
        img,
        (out_size, out_size, img.shape[-1]),
        (0, 1),
        jnp.stack([scale_y, scale_x]).astype(img.dtype),
        jnp.stack([translate_y, translate_x]).astype(img.dtype),
        method="linear" if method == "bilinear" else method,
        antialias=True,
    )


def random_resized_crop(key: jax.Array, img: jnp.ndarray, out_size: int = 224,
                        scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)) -> jnp.ndarray:
    """torchvision RandomResizedCrop semantics: 10 attempts sampling
    area in ``scale``*area and log-uniform aspect in ``ratio``; first fit wins,
    else center-crop fallback."""
    h, w = img.shape[0], img.shape[1]
    area = h * w
    k_area, k_ratio, k_top, k_left = jax.random.split(key, 4)
    n = 10
    target_area = area * jax.random.uniform(
        k_area, (n,), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        k_ratio, (n,), minval=np.log(ratio[0]), maxval=np.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    cw = jnp.round(jnp.sqrt(target_area * aspect)).astype(jnp.int32)
    ch = jnp.round(jnp.sqrt(target_area / aspect)).astype(jnp.int32)
    ok = (cw > 0) & (cw <= w) & (ch > 0) & (ch <= h)
    idx = jnp.argmax(ok)  # first valid attempt
    any_ok = jnp.any(ok)
    cw_i = cw[idx]
    ch_i = ch[idx]
    u_top = jax.random.uniform(k_top)
    u_left = jax.random.uniform(k_left)
    top = jnp.floor(u_top * (h - ch_i + 1).astype(img.dtype)).astype(jnp.int32)
    left = jnp.floor(u_left * (w - cw_i + 1).astype(img.dtype)).astype(jnp.int32)
    # fallback: central crop at clamped aspect
    in_ratio = w / h
    fb_w = jnp.where(in_ratio < ratio[0], w,
                     jnp.where(in_ratio > ratio[1],
                               jnp.round(h * ratio[1]), w)).astype(jnp.int32)
    fb_h = jnp.where(in_ratio < ratio[0], jnp.round(fb_w / ratio[0]),
                     jnp.where(in_ratio > ratio[1], h, h)).astype(jnp.int32)
    fb_top = (h - fb_h) // 2
    fb_left = (w - fb_w) // 2
    ch_f = jnp.where(any_ok, ch_i, fb_h)
    cw_f = jnp.where(any_ok, cw_i, fb_w)
    top_f = jnp.where(any_ok, top, fb_top)
    left_f = jnp.where(any_ok, left, fb_left)
    return crop_and_resize(img, top_f, left_f, ch_f, cw_f, out_size)


def _rgb_to_grayscale(img: jnp.ndarray) -> jnp.ndarray:
    weights = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.sum(img * weights, axis=-1, keepdims=True)


def adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img, factor):
    mean = jnp.mean(_rgb_to_grayscale(img))
    return jnp.clip(mean + factor * (img - mean), 0.0, 1.0)


def adjust_saturation(img, factor):
    gray = _rgb_to_grayscale(img)
    return jnp.clip(gray + factor * (img - gray), 0.0, 1.0)


def adjust_hue(img, delta):
    """Shift hue by ``delta`` (fraction of a full turn), HSV round-trip."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    spread = maxc - minc
    s = jnp.where(maxc > 0, spread / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.where(spread > 0, spread, 1.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(spread > 0, h, 0.0)
    h = (h + delta) % 1.0
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [v, q, p, p, t, v])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [t, v, v, q, p, p])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [p, p, t, v, v, q])
    return jnp.stack([r2, g2, b2], axis=-1)


def color_jitter(key: jax.Array, img: jnp.ndarray, brightness=0.075,
                 contrast=0.075, saturation=0.075, hue=0.075) -> jnp.ndarray:
    """torchvision ColorJitter: uniform factors, applied in random order."""
    k_perm, k_b, k_c, k_s, k_h = jax.random.split(key, 5)
    fb = jax.random.uniform(k_b, minval=1 - brightness, maxval=1 + brightness)
    fc = jax.random.uniform(k_c, minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(k_s, minval=1 - saturation, maxval=1 + saturation)
    fh = jax.random.uniform(k_h, minval=-hue, maxval=hue)
    order = jax.random.permutation(k_perm, 4)

    def apply_op(img, op_idx):
        return jax.lax.switch(
            op_idx,
            [
                lambda x: adjust_brightness(x, fb),
                lambda x: adjust_contrast(x, fc),
                lambda x: adjust_saturation(x, fs),
                lambda x: adjust_hue(x, fh),
            ],
            img,
        )

    def body(carry, idx):
        return apply_op(carry, idx), None

    out, _ = jax.lax.scan(body, img, order)
    return out


def train_transform(key: jax.Array, img: jnp.ndarray, out_size: int = 224) -> jnp.ndarray:
    """Full reference train augmentation chain on one HWC [0,1] image,
    returning a normalized CHW tensor (matching the reference's ToTensor+
    Normalize output layout, main_pretraining.py:102-116)."""
    k_crop, k_choice, k_flip_h, k_flip_v, k_apply, k_jitter = jax.random.split(key, 6)
    img = resize(img, (out_size, out_size))
    img = random_resized_crop(k_crop, img, out_size)
    # RandomChoice([HFlip(p=.5), VFlip(p=.15)]): pick one transform, then that
    # transform flips with its own probability.
    pick_h = jax.random.bernoulli(k_choice, 0.5)
    do_h = jnp.logical_and(pick_h, jax.random.bernoulli(k_flip_h, 0.5))
    do_v = jnp.logical_and(~pick_h, jax.random.bernoulli(k_flip_v, 0.15))
    img = jnp.where(do_h, img[:, ::-1, :], img)
    img = jnp.where(do_v, img[::-1, :, :], img)
    jittered = color_jitter(k_jitter, img)
    img = jnp.where(jax.random.bernoulli(k_apply, 0.5), jittered, img)
    img = normalize(img)
    return jnp.transpose(img, (2, 0, 1))


def eval_transform(img: jnp.ndarray, out_size: int = 224) -> jnp.ndarray:
    """HF CLIPImageProcessor chain: shortest-edge bicubic resize, center crop,
    normalize; returns CHW."""
    img = resize_shortest_edge(img, out_size, method="bicubic")
    img = center_crop(img, out_size)
    img = normalize(img)
    return jnp.transpose(img, (2, 0, 1))


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def ft_train_transform(key: jax.Array, img: jnp.ndarray, out_size: int = 224,
                       mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                       flip_h_p: float = 0.5, flip_v_p: float = 0.15,
                       jitter: float = 0.075, jitter_p: float = 0.5
                       ) -> jnp.ndarray:
    """The reference's fine-tune train chain (DT/FT_image_task.py:134-288):
    Resize(224,224) -> RandomChoice([HFlip(p_h), VFlip(p_v)]) ->
    RandomApply([ColorJitter(s,s,s,s)], p) -> Normalize(mean,std).
    Unlike the stage-1 pretraining chain there is NO RandomResizedCrop, and
    mean/std + probabilities are dataset-specific. HWC [0,1] in, CHW out."""
    k_choice, k_h, k_v, k_apply, k_jit = jax.random.split(key, 5)
    img = resize(img, (out_size, out_size))
    pick_h = jax.random.bernoulli(k_choice, 0.5)
    do_h = jnp.logical_and(pick_h, jax.random.bernoulli(k_h, flip_h_p))
    do_v = jnp.logical_and(~pick_h, jax.random.bernoulli(k_v, flip_v_p))
    img = jnp.where(do_h, img[:, ::-1, :], img)
    img = jnp.where(do_v, img[::-1, :, :], img)
    jittered = color_jitter(k_jit, img, jitter, jitter, jitter, jitter)
    img = jnp.where(jax.random.bernoulli(k_apply, jitter_p), jittered, img)
    img = normalize(img, mean, std)
    return jnp.transpose(img, (2, 0, 1))


def ft_eval_transform(img: jnp.ndarray, out_size: int = 224,
                      mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)) -> jnp.ndarray:
    """The reference's fine-tune eval chain: Resize((224,224)) + Normalize
    with dataset-specific stats (DT/FT_image_task.py valid_transforms blocks).
    HWC [0,1] in, CHW out."""
    img = resize(img, (out_size, out_size))
    img = normalize(img, mean, std)
    return jnp.transpose(img, (2, 0, 1))


@functools.partial(jax.jit, static_argnames=("out_size",))
def train_transform_batch(key: jax.Array, imgs: jnp.ndarray, out_size: int = 224):
    """vmapped train chain over a (B, H, W, C) [0,1] batch -> (B, C, S, S)."""
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(lambda k, im: train_transform(k, im, out_size))(keys, imgs)
