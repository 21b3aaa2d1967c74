"""Pixel shuffle as reshape/transpose (XLA fuses it; no kernel needed).

torch.nn.PixelShuffle semantics (used throughout the reference's MMR decoders,
reference model.py:386-397): out[b, c, h*r+i, w*r+j] = in[b, c*r^2 + i*r + j, h, w].
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle_nhwc(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C*r^2) -> (B, H*r, W*r, C), matching torch channel ordering."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, i, W, j, C)
    return x.reshape(b, h * r, w * r, c)


def pixel_shuffle_nchw(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, C*r^2, H, W) -> (B, C, H*r, W*r) (torch layout)."""
    b, crr, h, w = x.shape
    c = crr // (r * r)
    x = x.reshape(b, c, r, r, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, C, H, i, W, j)
    return x.reshape(b, c, h * r, w * r)
