"""Fused flash-attention (forward) Pallas TPU kernel.

Replaces the cuDNN attention inside the reference's HF towers (SURVEY §2.2)
for the long-sequence audio tower (852/1214 tokens; reference config.py:139,
329). Flash-attention-2 style: online softmax over key blocks, f32
accumulators, O(seq) memory. Backward recomputes through the XLA attention
path under ``jax.custom_vjp`` (sequences here are short enough that the
recompute is cheaper than a bespoke bwd kernel; revisit if seq grows).

Supports an optional additive bias broadcastable to (B, H, Sq, Sk) — used for
key-padding masks — by folding it into the logits block-by-block.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, block_k: int,
                  sm_scale: float):
    q = q_ref[0].astype(jnp.float32) * sm_scale        # (block_q, d)
    block_q, d = q.shape
    kv_pad = k_ref.shape[1]
    num_kb = kv_pad // block_k

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (block_q, block_k)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   block_q: int = 128, block_k: int = 128) -> jnp.ndarray:
    b, h, sq, d = q.shape
    kv_len = k.shape[2]
    sq_pad = _round_up(sq, block_q)
    kv_pad = _round_up(kv_len, block_k)
    d_pad = _round_up(d, 128)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, kv_pad - kv_len), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, kv_pad - kv_len), (0, d_pad - d)))
    # fold (batch, heads) into one grid axis
    qp = qp.reshape(b * h, sq_pad, d_pad)
    kp = kp.reshape(b * h, kv_pad, d_pad)
    vp = vp.reshape(b * h, kv_pad, d_pad)

    grid = (b * h, sq_pad // block_q)
    kernel = functools.partial(
        _flash_kernel, kv_len=kv_len, block_k=block_k,
        sm_scale=1.0 / (d ** 0.5))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bh, qb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_pad, d_pad), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_pad, d_pad), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda bh, qb: (bh, qb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * kv_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * sq_pad * kv_pad,
        ),
    )(qp, kp, vp)
    out = out.reshape(b, h, sq_pad, d_pad)
    return out[:, :, :sq, :d]


def _reference(q, k, v, bias):
    from synergy_tpu.ops.attention import xla_attention

    return xla_attention(q, k, v, bias)


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if bias is not None:
        # key-padding bias: fold into k by masking is unsafe; take XLA path
        return _reference(q, k, v, bias)
    return _flash_forward(q, k, v)


def _fwd(q, k, v, bias):
    return flash_attention(q, k, v, bias), (q, k, v, bias)


def _bwd(res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference(q_, k_, v_, bias), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
