"""Shared zero-shot evaluation core.

Protocol parity with the reference (ZS/ZS_image_task.py:1455-1489): draw
``try_num`` (128) random test samples (with replacement), score each against
every class prompt with the stage-1 similarity heads, softmax, accumulate
top-1/top-5. We encode the class prompts once (the reference re-tokenizes
them every iteration — same math, pointless host work) and batch the sampled
images/audios through one jitted call.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from synergy_tpu.configs import CLIPConfig
from synergy_tpu.data.audio import extract_fbank
from synergy_tpu.data.image import eval_transform, resize
from synergy_tpu.losses import l2_normalize
from synergy_tpu.models.tri_clip import TriCLIP
from synergy_tpu.train import checkpoint as ckpt


def build_tri_clip(args) -> Tuple[TriCLIP, Dict, str]:
    """Returns (model, params, weights_provenance) — the provenance string
    ("checkpoint:<dir>/<tag>" or "random-init") flows into the metric-JSON
    accumulator so committed artifacts can never pass random-weights numbers
    off as trained results."""
    cfg = (CLIPConfig.tiny() if getattr(args, "tiny", False)
           else (CLIPConfig.base() if args.IS_BASE else CLIPConfig.large()))
    model = TriCLIP(cfg)
    tag = ckpt.size_tag(args.IS_BASE, args.IS_CAPTIONED)
    try:
        params = ckpt.load_tri_clip_params(args.ckpt_dir, tag)
        print(f"[zs] loaded checkpoint {args.ckpt_dir}/{tag}")
        provenance = f"checkpoint:{args.ckpt_dir}/{tag}"
    except (FileNotFoundError, OSError):
        print(f"[zs] WARNING: no checkpoint under {args.ckpt_dir}/{tag}; "
              "random weights")
        key = jax.random.PRNGKey(args.SEED)
        img = jnp.zeros((1, 3, cfg.vision.image_size, cfg.vision.image_size))
        ids = jnp.ones((1, 8), jnp.int32)
        fb = jnp.zeros((1, cfg.audio.max_length, cfg.audio.num_mel_bins))
        params = jax.jit(model.init)(
            key, img, ids, jnp.ones((1, 8), jnp.int32), fb)["params"]
        provenance = "random-init"
    return model, params, provenance


def encode_prompts(model: TriCLIP, params, tokenizer, prompts: List[str],
                   max_length: int = 32) -> jnp.ndarray:
    toks = tokenizer(prompts, max_length=max_length)
    feats = jax.jit(lambda p, i, m: model.apply(
        {"params": p}, i, m, method=TriCLIP.get_text_features))(
        params, jnp.asarray(toks["input_ids"]),
        jnp.asarray(toks["attention_mask"]))
    return l2_normalize(feats.astype(jnp.float32))


def preprocess_images(images_uint8: np.ndarray, image_size: int) -> jnp.ndarray:
    """uint8 (B,H,W,3) -> normalized (B,3,S,S) via the CLIP eval chain."""
    imgs = jnp.asarray(images_uint8, jnp.float32) / 255.0
    if imgs.shape[1] < image_size:  # upscale small sources (e.g. CIFAR 32px)
        imgs = jax.vmap(lambda im: resize(im, (image_size, image_size)))(imgs)
        from synergy_tpu.data.image import normalize

        return jnp.transpose(normalize(imgs), (0, 3, 1, 2))
    return jax.vmap(lambda im: eval_transform(im, image_size))(imgs)


def zs_image_scores(model, params, pixel_values, text_embeds) -> np.ndarray:
    img = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, method=TriCLIP.get_image_features))(params, pixel_values)
    img = l2_normalize(img.astype(jnp.float32))
    scale = jnp.exp(jnp.asarray(params["logit_scale_IT"]))
    return np.asarray(img @ text_embeds.T * scale)


def zs_audio_scores(model, params, fbanks, text_embeds) -> np.ndarray:
    aud = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, method=TriCLIP.get_audio_features))(params, fbanks)
    aud = l2_normalize(aud.astype(jnp.float32))
    scale = jnp.exp(jnp.asarray(params["logit_scale_TA"]))
    # reference returns text x audio (model.py:201-203); per-sample scores are
    # the transpose
    return np.asarray(aud @ text_embeds.T * scale)


def topk_from_scores(scores: np.ndarray, labels: np.ndarray) -> Dict[str, float]:
    order = np.argsort(-scores, axis=1)
    top1 = float((order[:, 0] == labels).mean() * 100)
    k = min(5, scores.shape[1])
    top5 = float(np.mean([l in o[:k] for o, l in zip(order, labels)]) * 100)
    return {"top1": top1, "top5": top5}


def prepare_fbanks(waves, cfg) -> jnp.ndarray:
    fbs = np.stack([extract_fbank(w) for w in waves])
    return jnp.asarray(fbs)[:, : cfg.audio.max_length, : cfg.audio.num_mel_bins]
