"""Fused transformer-MLP forward Pallas TPU kernel.

Computes ``y = act(x @ W1 + b1) @ W2 + b2`` — the MLP block of every tower
(reference: the HF towers' intermediate/output Linears, SURVEY §2.2 "ATen
kernels") — as ONE Pallas kernel that keeps the (rows, d_ff) intermediate in
VMEM instead of round-tripping it through HBM between the two matmuls. Grid
over (row blocks, d_ff blocks): per step ``h = x@W1[:,j]+b1[j]`` runs in f32
on the MXU, the activation on the VPU, and ``act(h)@W2[j,:]`` accumulates
into an f32 scratch flushed once per row block.

Scope: this kernel serves the INFERENCE path only (+10% over XLA at the AST
Base MLP shapes, 90 vs 81 TF/s fwd, measured on v5e — see
docs/BENCHMARKS.md). The differentiated path deliberately lowers to the
plain XLA program: measured fwd+bwd, XLA reaches 143 TF/s (~73% MFU) on the
same shapes and a fused-backward prototype (saving the pre-activation and
splitting weight grads into XLA matmuls) ran 0.88x, losing its VMEM savings
to extra HBM residual traffic. ``jax.custom_vjp`` routes primal calls to the
kernel and gradient traces to ``jax.vjp(xla_mlp)``, so training numerics are
bit-identical to the un-fused model.

Activations are exact: erf is not a Mosaic primitive, so exact GELU uses the
Abramowitz–Stegun 7.1.26 rational approximation (|error| <= 1.5e-7 — two
orders below the 1e-4 HF-parity gate; the tanh-GELU shortcut that drifted
~1e-3 in round 1 is not used). quick_gelu (CLIP-ViT) is sigmoid-based and
exact.

Routing lives in models/layers.py: on TPU, MLPs with >=1024 rows use this
kernel; CPU/small shapes use the plain XLA pair of Dense matmuls. Override
with env ``SYNERGY_FUSED_MLP`` in {auto,on,off}.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 0.7071067811865476


def _erf(x):
    """Abramowitz & Stegun 7.1.26: max abs error 1.5e-7 (exact arithmetic).

    Built from exp only (Mosaic has no erf primitive)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _act_fwd(h, act: str):
    if act in ("gelu", "gelu_xjvp"):  # same primal; _xjvp differs only in
        return h * 0.5 * (1.0 + _erf(h * _INV_SQRT2))  # its autodiff rule
    if act == "gelu_new":  # tanh approximation (HF gelu_new semantics)
        return 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654
                                         * (h + 0.044715 * h ** 3)))
    if act == "quick_gelu":
        return h * jax.nn.sigmoid(1.702 * h)
    if act == "relu":
        return jnp.maximum(h, 0.0)
    raise ValueError(f"unsupported fused act: {act}")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Mosaic's default scoped-VMEM limit is 16 MB; v5e has far more physical
# VMEM and the working set below (~20 MB with double-buffered blocks) is
# deliberate: large row blocks amortize the W1/W2 panel refetch that
# dominates HBM traffic when the grid walks many row blocks.
_VMEM_LIMIT = 100 * 1024 * 1024


def _block_policy(n: int, d_in: int, d_ff: int, d_out: int):
    """Row/ff block sizes. Row blocks as large as the VMEM budget allows:
    every row block re-fetches a (d_in, bf) + (bf, d_out) weight panel, so
    doubling bm halves weight traffic. bf fixed at <=1024 keeps the f32
    h-tile and accumulator bounded."""
    bm = 1024 if max(d_in, d_out) <= 1024 else 512
    bm = min(bm, _round_up(n, 128))
    bf = min(1024, _round_up(d_ff, 128))
    return bm, bf


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref, acc_ref,
                *, act: str, num_fb: int):
    j = pl.program_id(1)
    x = x_ref[...]
    h = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    a = _act_fwd(h, act)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.broadcast_to(
            b2_ref[...].astype(jnp.float32), acc_ref.shape)

    acc_ref[...] += jax.lax.dot_general(
        a.astype(x.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == num_fb - 1)
    def _():
        y_ref[...] = acc_ref[...].astype(y_ref.dtype)


def _fused_mlp_fwd_impl(x2, w1, b1, w2, b2, act: str):
    n, d_in = x2.shape
    d_ff = w1.shape[1]
    d_out = w2.shape[1]
    bm, bf = _block_policy(n, d_in, d_ff, d_out)
    ff_pad = _round_up(d_ff, bf)

    # rows are NOT padded: Mosaic masks partial row tiles itself, and the
    # kernel is row-independent, so whatever lands in the masked tail rows
    # never touches real rows (the explicit jnp.pad both copied x through
    # HBM and cost ~1.3 ms/step of pad fusions in the infer profile)
    xp = x2
    # zero-padded W2 rows null out whatever act(0 + b1_pad) produces in the
    # padded d_ff columns, so no output masking is needed
    w1p = jnp.pad(w1, ((0, 0), (0, ff_pad - d_ff)))
    b1p = jnp.pad(b1, (0, ff_pad - d_ff)).reshape(1, ff_pad)
    w2p = jnp.pad(w2, ((0, ff_pad - d_ff), (0, 0)))
    b2p = b2.reshape(1, d_out)

    num_fb = ff_pad // bf
    grid = ((n + bm - 1) // bm, num_fb)
    kernel = functools.partial(_fwd_kernel, act=act, num_fb=num_fb)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d_in), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, bf), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, d_out), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, d_out), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d_out), x2.dtype),
        scratch_shapes=[pltpu.VMEM((bm, d_out), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d_in * ff_pad + 2 * n * ff_pad * d_out,
            bytes_accessed=(xp.size + n * d_out
                            + (w1p.size + w2p.size) * grid[0])
                           * x2.dtype.itemsize,
            transcendentals=n * ff_pad,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(xp, w1p, b1p, w2p, b2p)
    return y


def xla_mlp(x, w1, b1, w2, b2, act: str = "gelu"):
    """Plain XLA path with identical semantics: the training path (XLA's own
    fwd+bwd measured at 143 TF/s on the AST shapes, which the fused-backward
    prototype could not beat), the off-TPU path, and the parity oracle."""
    from synergy_tpu.models.layers import ACTIVATIONS

    h = jnp.dot(x, w1.astype(x.dtype)) + b1.astype(x.dtype)
    a = ACTIVATIONS[act](h)
    return jnp.dot(a, w2.astype(x.dtype)) + b2.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_mlp(x, w1, b1, w2, b2, act: str = "gelu"):
    """``act(x @ w1 + b1) @ w2 + b2`` with the intermediate kept in VMEM.

    x: (..., d_in); w1: (d_in, d_ff); b1: (d_ff,); w2: (d_ff, d_out);
    b2: (d_out,). Primal (inference) calls run the fused Pallas kernel;
    differentiated calls lower to the XLA program (see module docstring)."""
    lead = x.shape[:-1]
    y = _fused_mlp_fwd_impl(x.reshape(-1, x.shape[-1]), w1, b1, w2, b2, act)
    return y.reshape(*lead, w2.shape[1])


def _vjp_fwd(x, w1, b1, w2, b2, act):
    """XLA-path forward saving ONLY (x, h) as residuals.

    ``jax.vjp(xla_mlp)`` would additionally save the activation output
    ``a`` — a second (rows, d_ff) tensor per layer (366 MB/layer at the AST
    Base shape, ~5 GB across the towers at batch 35), which pushed HBM past
    the point where XLA's HLO rematerialization kicked in and recomputed the
    fc1 fusion for 8 of 12 AST layers every backward (~13 ms/step, measured
    in the profile — tools/profile_step.py). Recomputing ``act(h)`` in the
    backward is a cheap VPU sweep by comparison."""
    from synergy_tpu.models.layers import ACTIVATIONS

    w1c, b1c, w2c, b2c = (t.astype(x.dtype) for t in (w1, b1, w2, b2))
    h = jnp.dot(x, w1c) + b1c
    a = ACTIVATIONS[act](h)
    y = jnp.dot(a, w2c) + b2c
    return y, (x, h, w1, b1, w2, b2)


def _vjp_bwd(act, res, g):
    """Chained sub-VJPs of the SAME ops xla_mlp runs — the chain rule
    decomposes identically, so gradients stay bit-for-bit equal to
    ``jax.vjp(xla_mlp)`` (tests/test_fused_mlp.py pins this) while only the
    activation is recomputed here instead of saved in the forward."""
    from synergy_tpu.models.layers import ACTIVATIONS

    x, h, w1, b1, w2, b2 = res

    def lin(t, w, b):
        return jnp.dot(t, w.astype(t.dtype)) + b.astype(t.dtype)

    a, act_vjp = jax.vjp(ACTIVATIONS[act], h)
    _, lin2_vjp = jax.vjp(lin, a, w2, b2)
    da, dw2, db2 = lin2_vjp(g)
    dh = act_vjp(da)[0]
    _, lin1_vjp = jax.vjp(lin, x, w1, b1)
    dx, dw1, db1 = lin1_vjp(dh)
    return dx, dw1, db1, dw2, db2


fused_mlp.defvjp(_vjp_fwd, _vjp_bwd)
