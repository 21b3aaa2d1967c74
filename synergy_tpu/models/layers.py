"""Shared Flax transformer building blocks for all three towers.

One encoder implementation serves CLIP-ViT (pre-LN, quick_gelu), RoBERTa
(post-LN, gelu) and AST (pre-LN ViT, gelu) — the reference gets these from
three separate HF implementations (reference model.py:71-74); structurally
they differ only in norm placement and activation.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from synergy_tpu.ops.attention import dot_product_attention, mask_to_bias


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


@jax.custom_jvp
def exact_gelu(x):
    """0.5·x·(1+erf(x/√2)) with an analytic derivative (Φ(x) + x·φ(x)).

    Same primal as ``jax.nn.gelu(approximate=False)`` to ≤4e-6 abs (plain f32
    erf saturates where the erfc-stabilized lowering resolves the ~1e-32
    deep tail — far below bf16 resolution); the custom JVP matters for the
    backward's compiled form: autodiff through XLA's select-stabilized erfc
    lowering makes the MLP backward save a BIT-PACKED u16 predicate tensor
    per layer ((seq, hidden) — 7.5 MB/layer at the AST-Large shape) and
    drags the fc2 dW fusions to ~3x roofline. The analytic form is smooth
    erf+exp — no predicates, nothing extra saved.

    Registered as ACTIVATIONS['gelu_xjvp'] and routed per config, because
    the win is a property of overall HBM pressure, not of the op: Large
    train 206.4 → 187.0 ms/step (+10.4%, reproduced), but Base 202.9 →
    210.5 ms/step (−3.7%, reproduced) where XLA already folds the predicate
    save into matmul epilogues for free (docs/BENCHMARKS.md, Large profile).
    Only TextConfig.large()/AudioConfig.large() select it."""
    return 0.5 * x * (1.0 + jax.lax.erf(x * _INV_SQRT2))


@exact_gelu.defjvp
def _exact_gelu_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    cdf = 0.5 * (1.0 + jax.lax.erf(x * _INV_SQRT2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * x * x)
    return x * cdf, t * (cdf + x * pdf)


ACTIVATIONS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_xjvp": exact_gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
}


def _ln_fwd_impl(x, scale, bias, eps):
    # flax nn.LayerNorm numerics: stats in f32 (flax _compute_stats upcasts),
    # normalize + affine in f32, result cast back to the input dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    y = xc * r * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype), (x, mu, r)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_saved(x, scale, bias, eps):
    return _ln_fwd_impl(x, scale, bias, eps)[0]


def _ln_saved_fwd(x, scale, bias, eps):
    y, (x_, mu, r) = _ln_fwd_impl(x, scale, bias, eps)
    return y, (x_, mu, r, scale)


def _ln_saved_bwd(eps, res, dy):
    x, mu, r, scale = res
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    xhat = (xf - mu) * r
    reduce_rows = tuple(range(dy.ndim - 1))
    dscale = jnp.sum(dyf * xhat, axis=reduce_rows).astype(scale.dtype)
    dbias = jnp.sum(dyf, axis=reduce_rows).astype(scale.dtype)
    dxhat = dyf * scale.astype(jnp.float32)
    m1 = jnp.mean(dxhat, -1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, -1, keepdims=True)
    dx = (r * (dxhat - m1 - xhat * m2)).astype(x.dtype)
    return dx, dscale, dbias


_ln_saved.defvjp(_ln_saved_fwd, _ln_saved_bwd)


class LayerNorm(nn.Module):
    """nn.LayerNorm-compatible module (same {scale, bias} param tree) with
    env-routable compute, for measuring the LN-stat/fc2-dW fusion boundary
    (docs/BENCHMARKS.md Large profile: `convert_reduce` fusions at ~2x
    roofline are the last identified off-roofline family).

    Routing: the SYNERGY_LN_IMPL env var (A/B harness, tools/exp_ln.py)
    overrides the ``impl`` module field (config routing); default 'flax'.
    'flax' — same math as nn.LayerNorm; 'saved' — custom-VJP that saves
    (x, mean, rstd) so the backward never recomputes LN stats inside the
    fc2 dW/dx fusions; 'barrier' — optimization_barrier between the
    residual sum and the LN stats, splitting the forward fusion (measured
    −4% Large step time, +3.7% regression on Base — docs/BENCHMARKS.md)."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    impl: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (x.shape[-1],))
        impl = os.environ.get("SYNERGY_LN_IMPL") or self.impl or "flax"
        if impl == "barrier":
            x = jax.lax.optimization_barrier(x)
            y, _ = _ln_fwd_impl(x, scale, bias, self.epsilon)
            return y
        if impl == "saved":
            return _ln_saved(x, scale, bias, self.epsilon)
        # 'flax' default with the same param tree: plain autodiff math
        y, _ = _ln_fwd_impl(x, scale, bias, self.epsilon)
        return y


def _make_layer_norm(ln_impl, epsilon, dtype, name):
    """nn.LayerNorm when the resolved impl is 'flax' (production default);
    the routed twin otherwise (identical {scale, bias} param tree). The
    SYNERGY_LN_IMPL env var (A/B harness) overrides config routing."""
    impl = os.environ.get("SYNERGY_LN_IMPL") or ln_impl or "flax"
    if impl == "flax":
        return nn.LayerNorm(epsilon=epsilon, dtype=dtype, name=name)
    return LayerNorm(epsilon=epsilon, dtype=dtype, impl=impl, name=name)


# torch nn.TransformerEncoderLayer init, for modules the reference builds
# from torch's stock layer and trains FROM SCRATCH (the MMR TXT decoder,
# reference model.py:543-546). Init distribution is NOT cosmetic there —
# see the measured stall note at models/mmr.py TORCH_KERNEL_INIT. torch's
# MultiheadAttention xavier_uniform-inits the COMBINED (3E, E) in_proj, so
# the per-projection bound is sqrt(6/(E+3E)) == variance_scaling(0.5,
# fan_avg, uniform); out_proj/linear kernels are kaiming_uniform(a=sqrt(5))
# == variance_scaling(1/3, fan_in, uniform); attention biases are zeroed by
# torch's reset, linear biases are U(+-1/sqrt(fan_in)).
_TORCH_QKV_INIT = nn.initializers.variance_scaling(0.5, "fan_avg", "uniform")
_TORCH_LINEAR_INIT = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def _torch_bias_init(fan_in: int):
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MultiHeadAttention(nn.Module):
    """Standard MHA with separate q/k/v/out projections (HF layout)."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    torch_init: bool = False

    @nn.compact
    def __call__(self, x, bias=None):
        d_model = self.num_heads * self.head_dim
        qkv_kw = ({"kernel_init": _TORCH_QKV_INIT} if self.torch_init else {})
        out_kw = ({"kernel_init": _TORCH_LINEAR_INIT} if self.torch_init
                  else {})
        dense = lambda name: nn.Dense(d_model, dtype=self.dtype, name=name,
                                      **qkv_kw)
        q = dense("query")(x)
        k = dense("key")(x)
        v = dense("value")(x)

        impl = self.attn_impl or os.environ.get("SYNERGY_ATTN_IMPL", "auto")
        if impl in ("auto", "pallas", "packed"):
            from synergy_tpu.ops.flash_attention import (
                flash_attention_packed, packed_flash_supported)

            if packed_flash_supported(x.shape[1], self.num_heads,
                                      self.head_dim, bias):
                # consume the projections in their natural (b, s, h*d)
                # layout: the (b,s,h,d)->(b,h,s,d) transpose below is a real
                # HBM relayout copy on q/k/v/out fwd AND bwd at the Pallas
                # call boundary (15.4 ms of the 230 ms Base step, profiled)
                out = flash_attention_packed(q, k, v, self.num_heads)
                return nn.Dense(d_model, dtype=self.dtype, name="out",
                                **out_kw)(out)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

        out = dot_product_attention(split(q), split(k), split(v), bias,
                                    impl=self.attn_impl)
        b, h, s, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return nn.Dense(d_model, dtype=self.dtype, name="out", **out_kw)(out)


class _DenseParams(nn.Module):
    """Declares an nn.Dense-compatible {kernel, bias} param pair without
    binding the compute, so MLPBlock can route the math to a fused Pallas
    kernel. Param tree/init are bit-identical to nn.Dense (lecun_normal /
    zeros, f32 param dtype) — checkpoints and the HF port are unaffected.
    ``torch_init=True`` switches to torch nn.Linear defaults (same tree)."""

    features: int
    torch_init: bool = False

    @nn.compact
    def __call__(self, in_features: int):
        if self.torch_init:
            kinit, binit = _TORCH_LINEAR_INIT, _torch_bias_init(in_features)
        else:
            kinit = nn.initializers.lecun_normal()
            binit = nn.initializers.zeros_init()
        kernel = self.param("kernel", kinit, (in_features, self.features))
        bias = self.param("bias", binit, (self.features,))
        return kernel, bias


class _ConvParams(nn.Module):
    """Declares an nn.Conv-compatible {kernel, bias} param pair (HWIO layout,
    lecun_normal / zeros, f32) without binding the compute, so the towers can
    route patchify to the matmul formulation (ops/patchify.py). Checkpoints
    and the HF port see the exact nn.Conv param tree."""

    features: int
    kernel_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,)) if self.use_bias else None
        return kernel, bias


def _resolve_mlp_impl(n_rows: int, d_in: int, d_ff: int, d_out: int,
                      override: Optional[str]) -> str:
    """'fused' routes to the Pallas fused-MLP kernel (ops/fused_mlp.py).

    Auto policy (measured on v5e, see docs/BENCHMARKS.md): the fused kernel
    wins when there are enough rows to fill the MXU pipeline and all dims are
    lane-aligned; tiny/ragged shapes and non-TPU backends use plain XLA."""
    mode = override or os.environ.get("SYNERGY_FUSED_MLP", "auto")
    if mode in ("0", "off", "false", "xla"):
        return "xla"
    if mode in ("1", "on", "true", "fused", "pallas"):
        return "fused"
    on_tpu = jax.default_backend() == "tpu"
    aligned = d_in % 128 == 0 and d_ff % 128 == 0 and d_out % 128 == 0
    return "fused" if (on_tpu and aligned and n_rows >= 1024) else "xla"


class MLPBlock(nn.Module):
    intermediate_size: int
    hidden_size: int
    act: str
    dtype: jnp.dtype = jnp.float32
    mlp_impl: Optional[str] = None
    torch_init: bool = False

    @nn.compact
    def __call__(self, x):
        w1, b1 = _DenseParams(self.intermediate_size, self.torch_init,
                              name="fc1")(x.shape[-1])
        w2, b2 = _DenseParams(self.hidden_size, self.torch_init,
                              name="fc2")(self.intermediate_size)
        n_rows = 1
        for s in x.shape[:-1]:
            n_rows *= s
        impl = _resolve_mlp_impl(n_rows, x.shape[-1], self.intermediate_size,
                                 self.hidden_size, self.mlp_impl)
        if impl == "fused":
            from synergy_tpu.ops.fused_mlp import fused_mlp

            return fused_mlp(x.astype(self.dtype), w1.astype(self.dtype),
                             b1.astype(self.dtype), w2.astype(self.dtype),
                             b2.astype(self.dtype), self.act)
        x = jnp.dot(x.astype(self.dtype), w1.astype(self.dtype)) \
            + b1.astype(self.dtype)
        x = ACTIVATIONS[self.act](x)
        return jnp.dot(x, w2.astype(self.dtype)) + b2.astype(self.dtype)


class EncoderLayer(nn.Module):
    """Transformer encoder layer; ``pre_norm=True`` = CLIP/ViT/AST style,
    ``pre_norm=False`` = BERT/RoBERTa style (LN after residual add)."""

    num_heads: int
    head_dim: int
    intermediate_size: int
    act: str
    layer_norm_eps: float = 1e-5
    pre_norm: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    deterministic: bool = True
    torch_init: bool = False
    ln_impl: Optional[str] = None

    @nn.compact
    def __call__(self, x, bias=None):
        hidden = self.num_heads * self.head_dim
        attn = MultiHeadAttention(self.num_heads, self.head_dim, self.dtype,
                                  self.attn_impl, self.torch_init,
                                  name="attn")
        mlp = MLPBlock(self.intermediate_size, hidden, self.act, self.dtype,
                       torch_init=self.torch_init, name="mlp")
        ln1 = _make_layer_norm(self.ln_impl, self.layer_norm_eps, self.dtype,
                               "ln1")
        ln2 = _make_layer_norm(self.ln_impl, self.layer_norm_eps, self.dtype,
                               "ln2")
        drop = nn.Dropout(self.dropout, deterministic=self.deterministic)
        if self.pre_norm:
            x = x + drop(attn(ln1(x), bias))
            x = x + drop(mlp(ln2(x)))
        else:
            x = ln1(x + drop(attn(x, bias)))
            x = ln2(x + drop(mlp(x)))
        return x


class _ScanEncoderLayer(EncoderLayer):
    """EncoderLayer with the (carry, ys) calling convention nn.scan expects."""

    def __call__(self, x, bias=None):
        return super().__call__(x, bias), None


class TransformerEncoder(nn.Module):
    """Stack of encoder layers.

    ``scan_layers=True`` folds the layer loop into one ``nn.scan``-ed layer
    with stacked (L, ...) parameters and dots-saveable remat: XLA compiles
    ONE layer body instead of N copies (several-fold faster compiles, much
    lower activation memory), at ~20% training throughput for the remat
    recompute (measured on v5e: 105 vs 132 triplets/s on the Base step).
    Unrolled (default) maximizes throughput; param names ``layer_{i}``.
    """

    num_layers: int
    num_heads: int
    head_dim: int
    intermediate_size: int
    act: str
    layer_norm_eps: float = 1e-5
    pre_norm: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    deterministic: bool = True
    remat: bool = False
    scan_layers: bool = False
    torch_init: bool = False
    ln_impl: Optional[str] = None

    @nn.compact
    def __call__(self, x, bias=None):
        args = (self.num_heads, self.head_dim, self.intermediate_size,
                self.act, self.layer_norm_eps, self.pre_norm, self.dropout,
                self.dtype, self.attn_impl, self.deterministic,
                self.torch_init, self.ln_impl)
        if self.scan_layers:
            # remat with a dots-saveable policy: matmul outputs are saved,
            # elementwise work recomputes in bwd. Without it, nn.scan stacks
            # EVERY residual as (L, ...) buffers and the Base audio tower
            # blows HBM (4x 2GB gelu intermediates at batch 35).
            body = nn.remat(
                _ScanEncoderLayer, prevent_cse=False,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,),
                length=self.num_layers,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )
            x, _ = scanned(*args, name="layers")(x, bias)
            return x
        layer_cls = nn.remat(EncoderLayer) if self.remat else EncoderLayer
        for i in range(self.num_layers):
            x = layer_cls(*args, name=f"layer_{i}")(x, bias)
        return x


__all__ = [
    "ACTIVATIONS", "EncoderLayer", "MLPBlock", "MultiHeadAttention",
    "TransformerEncoder", "mask_to_bias", "quick_gelu",
]
