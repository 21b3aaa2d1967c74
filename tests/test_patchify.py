"""patch_embed (ops/patchify.py) must match the strided VALID conv exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synergy_tpu.ops.patchify import patch_embed


def _conv(x, kernel, bias, strides):
    y = jax.lax.conv_general_dilated(
        x, kernel, strides, "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if bias is None else y + bias


@pytest.mark.parametrize("h,w,c,k,sh,sw,use_bias", [
    (128, 256, 1, 16, 12, 12, True),    # AST Base geometry (short time axis)
    (128, 160, 1, 16, 10, 10, True),    # AST Large strides
    (64, 64, 3, 16, 16, 16, False),     # ViT non-overlapping
    (24, 24, 3, 4, 4, 4, False),        # tiny config
    (30, 40, 2, 8, 6, 4, True),         # uneven strides + truncated tail
])
def test_patch_embed_matches_conv(h, w, c, k, sh, sw, use_bias):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((k, k, c, 4)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((4,)), jnp.float32) if use_bias \
        else None
    ours = patch_embed(x, kernel, bias, (sh, sw))
    ref = _conv(x, kernel, bias, (sh, sw))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=0, atol=1e-5)

    # weight gradients flow through dense matmuls and must match the conv's
    def loss(fn, kk):
        return jnp.sum(fn(x, kk, bias, (sh, sw)) ** 2)

    g_ours = jax.grad(lambda kk: loss(patch_embed, kk))(kernel)
    g_ref = jax.grad(lambda kk: loss(_conv, kk))(kernel)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-3)
