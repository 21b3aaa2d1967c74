"""Bicubic resize matching PyTorch semantics (cubic kernel a=-0.75,
align_corners=False, border replicate, no antialias) — what torchvision's
``Resize(interpolation=BICUBIC)`` applies to the MMR labels (reference
model.py:629-632, 703-706). ``jax.image.resize`` uses the Keys kernel
(a=-0.5), which diverges from torch; here each axis resize is a precomputed
dense (out, in) weight matrix — a pair of small matmuls on the MXU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _cubic_weight(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    t = np.abs(t)
    w = np.where(
        t <= 1.0,
        (a + 2.0) * t ** 3 - (a + 3.0) * t ** 2 + 1.0,
        np.where(t < 2.0, a * t ** 3 - 5.0 * a * t ** 2 + 8.0 * a * t - 4.0 * a,
                 0.0),
    )
    return w


@functools.lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) bicubic interpolation matrix, torch semantics."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    out = np.zeros((out_size, in_size), np.float64)
    for o in range(out_size):
        x = (o + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        for k in range(-1, 3):
            idx = np.clip(x0 + k, 0, in_size - 1)  # border replicate
            out[o, idx] += _cubic_weight(np.array(x - (x0 + k)))
    return out.astype(np.float32)


def resize_bicubic_torch(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Resize the trailing two dims of ``x`` to ``size``; any leading dims."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = size
    mh = jnp.asarray(_resize_matrix(h_in, h_out))
    mw = jnp.asarray(_resize_matrix(w_in, w_out))
    y = jnp.einsum("oh,...hw->...ow", mh, x.astype(jnp.float32))
    y = jnp.einsum("pw,...ow->...op", mw, y)
    return y.astype(x.dtype)
