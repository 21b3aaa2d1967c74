"""SSIM in pure JAX (pytorch_msssim-compatible).

Used by the MMR reconstruction losses (reference model.py:634-639, 708-712,
via ``pytorch_msssim.ssim(data_range=1.0, size_average=True)``): gaussian
window 11, sigma 1.5, K1=0.01, K2=0.03, separable depthwise filtering with
VALID padding, averaged over all positions/channels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache()
def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable gaussian filter over (B, C, H, W), VALID padding."""
    k = kernel.shape[0]
    kh = kernel.reshape(1, 1, k, 1)
    kw = kernel.reshape(1, 1, 1, k)
    b, c, h, w = x.shape
    x = x.reshape(b * c, 1, h, w)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return x.reshape(b, c, x.shape[-2], x.shape[-1])


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, data_range: float = 1.0,
         size_average: bool = True, win_size: int = 11,
         win_sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03):
    """img1/img2: (B, C, H, W). Returns scalar (size_average) or (B,)."""
    # shrink the window for small inputs (VALID conv would otherwise produce
    # an empty map and a NaN mean)
    max_win = min(img1.shape[-2], img1.shape[-1])
    if win_size > max_win:
        win_size = max_win if max_win % 2 == 1 else max_win - 1
    kernel = jnp.asarray(_gaussian_kernel(win_size, win_sigma))
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)

    mu1 = _blur(img1, kernel)
    mu2 = _blur(img2, kernel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, kernel) - mu1_sq
    sigma2_sq = _blur(img2 * img2, kernel) - mu2_sq
    sigma12 = _blur(img1 * img2, kernel) - mu1_mu2

    cs = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))
