"""Patch embedding as MXU matmuls instead of a strided convolution.

Both towers' patchify convs (reference: HF CLIPVisionModel / ASTModel patch
embeddings, SURVEY C4/C6) lower to XLA:TPU convolutions that run far off
the matmul rate at these shapes — profiled 14 TF/s on the AST Base shape
(16x16 kernel, stride 12, (35,128,1024,1) input) vs ~150 TF/s for the
step's dot fusions, plus an input relayout copy the conv's layout pins.
Measured fwd+bwd at that shape: conv 7.42 ms, this formulation 1.35 ms
(bit-identical output).

Two cases:

* non-overlapping (stride == kernel, the ViT towers): pure
  reshape/transpose into (B, NH, NW, KH*KW*C) patch rows, then one matmul.
* overlapping (the AST towers, stride 12 < kernel 16): separable ONE-HOT
  gather matmuls along H then W. A dense (H, NH*KH) 0/1 matrix replicates
  each input row into every patch that reads it — a matmul the MXU eats,
  and (unlike jnp gather indexing) its transpose under AD is another dense
  matmul, never a scatter. The one-hot flop overhead is ~2x the patch
  matmul itself, which at MXU rate is still ~5x faster than the conv.

The weight stays in Flax nn.Conv's HWIO layout — (KH, KW, C, D), reshaped
row-major so patch element order (kh, kw, c) matches `kernel.reshape(-1, D)`
— keeping checkpoints and the HF port (interop/hf_port.py) unchanged.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _one_hot_windows(size: int, num: int, kernel: int, stride: int,
                     dtype) -> jnp.ndarray:
    """(size, num*kernel) 0/1 matrix: column n*kernel+k reads row n*stride+k."""
    m = np.zeros((size, num * kernel), np.float32)
    rows = (np.arange(num)[:, None] * stride + np.arange(kernel)[None, :])
    m[rows.reshape(-1), np.arange(num * kernel)] = 1.0
    return jnp.asarray(m, dtype)


def patch_embed(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: Optional[jnp.ndarray],
                strides: Tuple[int, int]) -> jnp.ndarray:
    """VALID-padded strided patch embedding.

    x: (B, H, W, C) NHWC; kernel: (KH, KW, C, D) HWIO; returns (B, NH, NW, D)
    equal to ``lax.conv_general_dilated(x, kernel, strides, "VALID")``.
    """
    b, h, w, c = x.shape
    kh, kw, _, d = kernel.shape
    sh, sw = strides
    nh = (h - kh) // sh + 1
    nw = (w - kw) // sw + 1

    if (sh, sw) == (kh, kw) and h == nh * kh and w == nw * kw:
        p = x.reshape(b, nh, kh, nw, kw, c).transpose(0, 1, 3, 2, 4, 5)
    else:
        eye_h = _one_hot_windows(h, nh, kh, sh, x.dtype)
        eye_w = _one_hot_windows(w, nw, kw, sw, x.dtype)
        xh = jnp.einsum("bhwc,hm->bmwc", x, eye_h)
        xw = jnp.einsum("bmwc,wn->bmnc", xh, eye_w)
        p = xw.reshape(b, nh, kh, nw, kw, c).transpose(0, 1, 3, 2, 4, 5)
    y = p.reshape(b, nh, nw, kh * kw * c) @ kernel.reshape(kh * kw * c, d)
    if bias is not None:
        y = y + bias
    return y


__all__ = ["patch_embed"]
