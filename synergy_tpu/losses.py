"""Losses: 3-pair InfoNCE (contrastive) and reconstruction losses.

Contrastive (reference model.py:52-58, 252-272): symmetric cross-entropy
against the diagonal of a logit-scaled cosine-similarity matrix, for the
three pairs (image-text, text-audio, audio-image).

TPU-native negatives semantics: the reference keeps InfoNCE negatives
rank-local under DDP (each of the two GPUs sees a 35-sample matrix,
reference model.py:268-272 inside DDP forward). Here the loss is written over
the *global* batch; under pjit/GSPMD with the batch sharded on the 'data' mesh
axis, XLA inserts the all-gathers over ICI automatically (the upgrade named in
BASELINE.json). ``num_groups`` restores reference parity: with
``num_groups=W`` the batch is treated as W independent groups of
``B/W`` samples and negatives never cross groups — bitwise the reference's
per-rank loss (mean over groups == mean over ranks).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def cross_entropy_with_integer_labels(logits: jnp.ndarray,
                                      labels: jnp.ndarray) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    label_logits = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return logz - label_logits


def contrastive_loss(logits: jnp.ndarray) -> jnp.ndarray:
    """CE against arange over the last two dims (..., N, N) (reference
    model.py:52-53)."""
    n = logits.shape[-1]
    labels = jnp.broadcast_to(jnp.arange(n), logits.shape[:-1])
    return jnp.mean(cross_entropy_with_integer_labels(logits, labels))


def clip_loss(similarity: jnp.ndarray) -> jnp.ndarray:
    """Symmetric InfoNCE (reference model.py:55-58)."""
    caption_loss = contrastive_loss(similarity)
    image_loss = contrastive_loss(jnp.swapaxes(similarity, -1, -2))
    return (caption_loss + image_loss) / 2.0


def _pair_logits(a: jnp.ndarray, b: jnp.ndarray, logit_scale: jnp.ndarray,
                 num_groups: int) -> jnp.ndarray:
    n, d = a.shape
    g = num_groups
    a = a.reshape(g, n // g, d)
    b = b.reshape(g, n // g, d)
    return jnp.einsum("gid,gjd->gij", a, b,
                      preferred_element_type=jnp.float32) * jnp.exp(logit_scale)


def tri_clip_loss(
    img_embeds: jnp.ndarray,
    txt_embeds: jnp.ndarray,
    aud_embeds: jnp.ndarray,
    logit_scale_it: jnp.ndarray,
    logit_scale_ta: jnp.ndarray,
    logit_scale_ai: jnp.ndarray,
    num_groups: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (IT, TA, AI) losses from L2-normalized embeddings
    (reference model.py:252-272). ``num_groups=1`` = global negatives;
    ``num_groups=world_size`` = reference rank-local negatives."""
    logits_it = _pair_logits(img_embeds, txt_embeds, logit_scale_it, num_groups)
    logits_ta = _pair_logits(txt_embeds, aud_embeds, logit_scale_ta, num_groups)
    logits_ai = _pair_logits(aud_embeds, img_embeds, logit_scale_ai, num_groups)
    return clip_loss(logits_it), clip_loss(logits_ta), clip_loss(logits_ai)


def l2_normalize(x: jnp.ndarray, axis: int = -1,
                 eps: float = 1e-12) -> jnp.ndarray:
    """Safe L2 normalization: an all-zero row (e.g. a padded serving-bucket
    row) maps to zeros, not NaN (0/0)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


# ---------------------------------------------------------------------------
# MMR reconstruction losses (reference model.py:634-639, 708-712, 775-779)
# ---------------------------------------------------------------------------

def resize_bicubic(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bicubic resize of the trailing two spatial dims with torch semantics
    (a=-0.75 cubic kernel, as torchvision Resize(BICUBIC) on tensors)."""
    from synergy_tpu.ops.resize import resize_bicubic_torch

    return resize_bicubic_torch(x, size)


def mmr_image_loss(recon: jnp.ndarray, label: jnp.ndarray, alpha: float = 0.75):
    """recon (B,3,128,128); label (B,3,H,W) resized bicubic to recon size.
    recon_loss = MSE + L1; total = alpha*(1-SSIM) + (1-alpha)*recon_loss
    (reference model.py:703-712)."""
    from synergy_tpu.ops.ssim import ssim

    label = resize_bicubic(label, recon.shape[-2:])
    recon_loss = jnp.mean((recon - label) ** 2) + jnp.mean(jnp.abs(recon - label))
    ssim_loss = 1.0 - ssim(recon, label, data_range=1.0)
    return alpha * ssim_loss + (1 - alpha) * recon_loss, recon_loss, ssim_loss


def mmr_audio_loss(recon: jnp.ndarray, label: jnp.ndarray, alpha: float = 0.75):
    """recon (B,256,64); label (B,1024,128) spectrogram resized bicubic.
    recon_loss = MSE only (reference model.py:629-639)."""
    from synergy_tpu.ops.ssim import ssim

    label = resize_bicubic(label[:, None], recon.shape[-2:])[:, 0]
    recon_loss = jnp.mean((recon - label) ** 2)
    ssim_loss = 1.0 - ssim(recon[:, None], label[:, None], data_range=1.0)
    return alpha * ssim_loss + (1 - alpha) * recon_loss, recon_loss, ssim_loss


def mmr_text_loss(logits: jnp.ndarray, input_ids: jnp.ndarray):
    """CE over the vocab at every position + token accuracy (reference
    model.py:775-779; note the reference does NOT ignore pad tokens)."""
    v = logits.shape[-1]
    ce = jnp.mean(cross_entropy_with_integer_labels(
        logits.reshape(-1, v), input_ids.reshape(-1)))
    acc = jnp.mean((jnp.argmax(logits, axis=-1) == input_ids).astype(jnp.float32))
    return ce, acc, jnp.zeros(())
