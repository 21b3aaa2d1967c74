"""Flash-attention kernel correctness vs the XLA reference path (interpreter
mode on CPU), including padded/ragged sequence lengths and gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from synergy_tpu.ops.attention import mask_to_bias, xla_attention
from synergy_tpu.ops import flash_attention as fa


def _rand_qkv(rng, b=2, h=3, sq=200, sk=200, d=64):
    q = jnp.asarray(rng.standard_normal((b, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, sk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, sk, d)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("seq", [128, 200, 852, 1214])
def test_flash_matches_xla(rng, seq):
    q, k, v = _rand_qkv(rng, b=1, h=2, sq=seq, sk=seq, d=64)
    ref = xla_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_bf16(rng):
    q, k, v = _rand_qkv(rng, b=1, h=1, sq=256, sk=256, d=64)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    ref = xla_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2)


def test_flash_loop_path_long_sequence(rng):
    """kv > 2048 engages the classic flash loop (block policy fallback)."""
    from synergy_tpu.ops.flash_attention import _block_policy

    bq, bk, kvp = _block_policy(2560, 2560)
    assert bk == 1024 and kvp == 3072  # loop path
    q, k, v = _rand_qkv(rng, b=1, h=1, sq=2560, sk=2560, d=32)
    ref = xla_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_odd_head_dim(rng):
    """d=80 exercises the head-dim padding path."""
    q, k, v = _rand_qkv(rng, b=1, h=2, sq=300, sk=300, d=80)
    ref = xla_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(q, k, v)
        g1 = jax.grad(lambda q, k, v: jnp.sum(fa.flash_attention(q, k, v) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    g2 = jax.grad(lambda q, k, v: jnp.sum(xla_attention(q, k, v) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        err = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert err <= 2e-4 * max(1.0, float(np.abs(np.asarray(b)).max()))


def test_flash_with_bias_falls_back(rng):
    q, k, v = _rand_qkv(rng, b=2, h=2, sq=32, sk=32, d=16)
    mask = np.ones((2, 32), np.int32)
    mask[0, 20:] = 0
    bias = mask_to_bias(jnp.asarray(mask))
    out = fa.flash_attention(q, k, v, bias)
    ref = xla_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("seq", [
    128,
    pytest.param(200, marks=pytest.mark.slow),
    pytest.param(852, marks=pytest.mark.slow),
])
def test_flash_grad(rng, seq):
    q, k, v = _rand_qkv(rng, b=1, h=2, sq=seq, sk=seq, d=32)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g1, g2):
        err = np.abs(np.asarray(a) - np.asarray(b)).max()
        scale = max(1.0, float(np.abs(np.asarray(b)).max()))
        assert err <= 2e-4 * scale, f"d{name}: {err} (scale {scale})"


def test_flash_grads_at_audio_lengths(rng):
    """Gradient parity at the AST Base length (one-pass whole-seq backward)."""
    q, k, v = _rand_qkv(rng, b=1, h=1, sq=852, sk=852, d=64)

    def loss(fn, *a):
        return jnp.sum(fn(*a) ** 2)

    g_ref = jax.grad(lambda *a: loss(xla_attention, *a), argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda *a: loss(fa.flash_attention, *a),
                     argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, g_ref):
        scale = max(1.0, float(np.abs(np.asarray(b)).max()))
        err = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert err <= 2e-4 * scale, f"d{name}: {err} vs scale {scale}"


def test_flash_grads_loop_path(rng):
    """Gradient parity when kv > 2048 forces the two-kernel flash loop."""
    q, k, v = _rand_qkv(rng, b=1, h=1, sq=2304, sk=2304, d=32)

    def loss(fn, *a):
        return jnp.sum(fn(*a) ** 2)

    g_ref = jax.grad(lambda *a: loss(xla_attention, *a), argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda *a: loss(fa.flash_attention, *a),
                     argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, g_ref):
        scale = max(1.0, float(np.abs(np.asarray(b)).max()))
        err = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert err <= 2e-4 * scale, f"d{name}: {err} vs scale {scale}"


def test_packed_flash_matches_xla(rng):
    """Packed-heads variant: (b, s, h*d) in/out, no transposes anywhere."""
    b, s, h, d = 2, 640, 4, 64
    q3 = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    v3 = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)

    def split(t):
        return t.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    def merge(t):
        return t.transpose(0, 2, 1, 3).reshape(b, s, h * d)

    ref = merge(xla_attention(split(q3), split(k3), split(v3)))
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention_packed(q3, k3, v3, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_flash_grads(rng):
    b, s, h, d = 1, 852, 2, 64
    q3 = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    v3 = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)

    def split(t):
        return t.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    def merge(t):
        return t.transpose(0, 2, 1, 3).reshape(b, s, h * d)

    def loss_ref(q, k, v):
        return jnp.sum(merge(xla_attention(split(q), split(k), split(v))) ** 2)

    def loss_packed(q, k, v):
        return jnp.sum(fa.flash_attention_packed(q, k, v, h) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q3, k3, v3)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss_packed, argnums=(0, 1, 2))(q3, k3, v3)
    for name, a, b_ in zip("qkv", g, g_ref):
        scale = max(1.0, float(np.abs(np.asarray(b_)).max()))
        err = np.abs(np.asarray(a) - np.asarray(b_)).max()
        assert err <= 2e-4 * scale, f"d{name}: {err} vs scale {scale}"


def test_packed_flash_routing_gate():
    """packed_flash_supported engages exactly for the audio-tower regime
    plus ViT-L's 257 tokens (measured crossover at 256, see gate docstring)."""
    on_tpu = jax.default_backend() == "tpu"
    assert fa.packed_flash_supported(852, 12, 64, None) == on_tpu
    assert fa.packed_flash_supported(1214, 12, 64, None) == on_tpu
    assert fa.packed_flash_supported(257, 16, 64, None) == on_tpu  # ViT-L
    assert not fa.packed_flash_supported(197, 12, 64, None)   # short seq
    assert not fa.packed_flash_supported(852, 11, 64, None)   # odd heads
    assert not fa.packed_flash_supported(852, 12, 80, None)   # d != 64
    assert not fa.packed_flash_supported(852, 12, 64, jnp.ones((1, 1, 1, 852)))
    assert not fa.packed_flash_supported(4096, 12, 64, None)  # loop regime


def test_packed_flash_odd_sequence_vitl(rng):
    """ViT-L's 257-token (CLS + 16x16 patches) sequence is NOT a multiple of
    the 8-sublane tile; the packed kernel's whole-seq slabs must still be
    exact (fwd verified on-chip at 3.9e-3 bf16; this pins the fp32 math)."""
    b, s, h, d = 1, 257, 2, 64
    q3 = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    v3 = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)

    def split(t):
        return t.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    def merge(t):
        return t.transpose(0, 2, 1, 3).reshape(b, s, h * d)

    ref = merge(xla_attention(split(q3), split(k3), split(v3)))
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention_packed(q3, k3, v3, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def loss_ref(q, k, v):
        return jnp.sum(merge(xla_attention(split(q), split(k), split(v))) ** 2)

    def loss_packed(q, k, v):
        return jnp.sum(fa.flash_attention_packed(q, k, v, h) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q3, k3, v3)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss_packed, argnums=(0, 1, 2))(q3, k3, v3)
    for name, a, b_ in zip("qkv", g, g_ref):
        scale = max(1.0, float(np.abs(np.asarray(b_)).max()))
        err = np.abs(np.asarray(a) - np.asarray(b_)).max()
        assert err <= 2e-4 * scale, f"d{name}: {err} vs scale {scale}"
