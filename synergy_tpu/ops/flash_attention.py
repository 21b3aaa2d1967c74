"""Fused flash-attention Pallas TPU kernels (forward + backward).

Replaces the cuDNN attention inside the reference's HF towers (SURVEY §2.2)
for the long-sequence audio tower (852/1214 tokens; reference config.py:139,
329). Flash-attention-2 style:
  * forward: online softmax over key blocks, f32 accumulators, saves the
    per-row logsumexp;
  * backward: two kernels — dQ (grid over query blocks) and dK/dV (grid over
    key blocks) — recomputing probabilities from the saved logsumexp, so no
    O(S^2) tensor is ever materialized.

Optional additive bias (key-padding masks) falls back to the XLA path; the
towers that need masks (text, 32 tokens) are below the fused kernel's payoff
threshold anyway (ops/attention.py routing).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad3(t, seq_pad: int, d_pad: int):
    """(b, h, s, d) -> (b*h, seq_pad, d_pad); the reshape is free when no
    padding is needed."""
    b, h, s, d = t.shape
    if seq_pad != s or d_pad != d:
        t = jnp.pad(t, ((0, 0), (0, 0), (0, seq_pad - s), (0, d_pad - d)))
    return t.reshape(b * h, seq_pad, d_pad)


def _head_dim_pad(d: int) -> int:
    """Padded head dim. d=64 (every tower here) is NOT padded: Mosaic handles
    half-lane-width tiles natively, and an explicit pad to 128 both
    materializes padded HBM copies of q/k/v/do (367 MB apiece at batch 140 —
    the round-2 OOM) and doubles the QK^T contraction work on zeros."""
    return d if (d % 128 == 0 or d == 64) else _round_up(d, 128)


def _block_policy(sq: int, kv_len: int):
    """Tuned on v5e (b35 h12 d64 fwd+bwd, bf16): one program per (batch,
    head) with the whole sequence as a single block wins decisively —
    852 tokens: 5.7ms (vs 18.4ms with 128-wide online-softmax loops and
    10.5ms for XLA fused attention); 1214 tokens: 9.8ms vs XLA's 20.1ms.
    The classic flash loop only engages when K/V or the f32 score tile no
    longer fit VMEM."""
    kv_pad = _round_up(kv_len, 128)
    if kv_pad <= 2048:
        block_k = kv_pad
    else:
        block_k = 1024
        kv_pad = _round_up(kv_len, block_k)
    # cap the f32 score tile (block_q x block_k) at ~6.5 MB of VMEM
    max_bq = max(128, (1280 * 1280 // block_k) // 128 * 128)
    block_q = min(_round_up(sq, 128), max_bq)
    return block_q, block_k, kv_pad


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, kv_len: int,
                block_k: int, sm_scale: float):
    q = q_ref[0]  # native dtype: bf16 inputs ride the fast MXU path
    block_q, d = q.shape
    kv_pad = k_ref.shape[1]
    num_kb = kv_pad // block_k

    if num_kb == 1:
        # whole-sequence specialization: with a single kv block the online
        # softmax degenerates to a plain softmax (identical math — first-iter
        # alpha is exp(-inf)=0), and the straight-line form drops the loop
        # carry/rescale machinery: 2.83 -> 2.30 ms at 852 tokens b35 h12 on
        # v5e (the fwd is VPU-bound; see docs/BENCHMARKS.md)
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        if kv_len < kv_pad:  # mask pass only when the block carries padding
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        l_safe = jnp.maximum(l, 1e-30)
        o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
        lse = (m + jnp.log(l_safe))[:, 0]
        lse_ref[0] = jnp.broadcast_to(lse[None, :], (8, lse.shape[0]))
        return

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    # lse replicated over 8 sublanes to satisfy Mosaic (8, 128) tiling
    lse = (m + jnp.log(l_safe))[:, 0]
    lse_ref[0] = jnp.broadcast_to(lse[None, :], (8, lse.shape[0]))


def _flash_forward(q, k, v, block_q: int = None, block_k: int = None):
    b, h, sq, d = q.shape
    kv_len = k.shape[2]
    auto_bq, auto_bk, auto_kvp = _block_policy(sq, kv_len)
    block_q = block_q or auto_bq
    block_k = block_k or auto_bk
    d_pad = _head_dim_pad(d)
    if block_q >= sq and block_k >= kv_len and d_pad == d:
        # whole-sequence blocks: hand Mosaic the UNPADDED arrays (it masks
        # partial tiles itself). The explicit jnp.pad round-trip copied
        # ~370 MB/call through HBM at 852 tokens b35 h12 — 0.45 ms of the
        # 2.75 ms call (docs/BENCHMARKS.md).
        block_q, block_k = sq, kv_len
        sq_pad, kv_pad = sq, kv_len
    else:
        sq_pad = _round_up(sq, block_q)
        kv_pad = _round_up(kv_len, block_k)
    qp = _pad3(q, sq_pad, d_pad)
    kp = _pad3(k, kv_pad, d_pad)
    vp = _pad3(v, kv_pad, d_pad)

    grid = (b * h, sq_pad // block_q)
    kernel = functools.partial(_fwd_kernel, kv_len=kv_len, block_k=block_k,
                               sm_scale=1.0 / (d ** 0.5))
    out, lse = pl.pallas_call(
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
        out_specs=(
            pl.BlockSpec((1, block_q, d_pad), lambda bh, qb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda bh, qb: (bh, 0, qb),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b * h, 8, sq_pad), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * kv_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * sq_pad * kv_pad,
        ),
    )(qp, kp, vp)
    return out, lse, (sq_pad, kv_pad, d_pad)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_onepass_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                        dq_ref, dk_ref, dv_ref, *, q_len: int, kv_len: int,
                        sm_scale: float):
    """Whole-sequence backward: one program per (batch, head) recomputes the
    score tile ONCE and emits dQ, dK, dV together. vs the two-kernel split
    (dQ grid + dK/dV grid) this halves the s/p recompute (one QK^T matmul and
    one exp sweep instead of two) — it engages whenever the fwd whole-seq
    block policy was active, i.e. all sequence lengths in this workload."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    if q_len < q.shape[0] or kv_len < k.shape[0]:  # only if blocks are padded
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where((col < kv_len) & (row < q_len), s, NEG_INF)
    p = jnp.exp(s - lse)
    dv = jax.lax.dot_general(p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta) * sm_scale).astype(q.dtype)
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, kv_len: int, block_k: int, sm_scale: float):
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    block_q, d = q.shape
    kv_pad = k_ref.shape[1]
    num_kb = kv_pad // block_k

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * sm_scale).astype(k.dtype)
        return dq + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, q_len: int, kv_len: int, block_q: int,
                    sm_scale: float):
    k = k_ref[0]   # (block_k, d), native dtype
    v = v_ref[0]
    block_k, d = k.shape
    kb = pl.program_id(1)
    q_pad = q_ref.shape[1]
    num_qb = q_pad // block_q

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :]
        do = do_ref[0, pl.ds(qb * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qb * block_q
        s = jnp.where((col < kv_len) & (row < q_len), s, NEG_INF)
        p = jnp.exp(s - lse)  # rows past q_len are masked to NEG_INF
        dv = dv + jax.lax.dot_general(p.astype(do.dtype), do,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * sm_scale).astype(q.dtype)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, out, lse, g, block_q: int = None,
                    block_k: int = None):
    b, h, sq, d = q.shape
    kv_len = k.shape[2]
    auto_bq, auto_bk, _ = _block_policy(sq, kv_len)
    block_q = block_q or auto_bq
    block_k = block_k or auto_bk
    d_pad = _head_dim_pad(d)
    if block_q >= sq and block_k >= kv_len and d_pad == d:
        # mirror the forward's unpadded whole-sequence policy
        block_q, block_k = sq, kv_len
        sq_pad, kv_pad = sq, kv_len
    else:
        sq_pad = _round_up(sq, block_q)
        kv_pad = _round_up(kv_len, block_k)
    assert sq_pad == lse.shape[-1], (
        f"bwd block_q must match fwd padding: {sq_pad} vs {lse.shape[-1]}")
    pad_q = lambda t: _pad3(t, sq_pad, d_pad)
    pad_k = lambda t: _pad3(t, kv_pad, d_pad)
    qp, dop = pad_q(q), pad_q(g)
    op = pad_q(out)
    kp, vp = pad_k(k), pad_k(v)
    lse_p = lse  # (b*h, 8, sq_pad), sublane-replicated
    delta = jnp.sum(dop.astype(jnp.float32) * op.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[:, None, :], lse_p.shape)

    sm_scale = 1.0 / (d ** 0.5)
    onepass = os.environ.get("SYNERGY_FLASH_ONEPASS", "auto") != "off"
    if onepass and block_q == sq_pad and block_k == kv_pad:
        # whole-seq blocks: single-program one-pass backward (s recomputed
        # once; ~1.3x over the two-kernel split at 852 tokens on v5e)
        full_q = pl.BlockSpec((1, sq_pad, d_pad), lambda bh: (bh, 0, 0),
                              memory_space=pltpu.VMEM)
        full_k = pl.BlockSpec((1, kv_pad, d_pad), lambda bh: (bh, 0, 0),
                              memory_space=pltpu.VMEM)
        full_lse = pl.BlockSpec((1, 8, sq_pad), lambda bh: (bh, 0, 0),
                                memory_space=pltpu.VMEM)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_onepass_kernel, q_len=sq, kv_len=kv_len,
                              sm_scale=sm_scale),
            grid=(b * h,),
            in_specs=[full_q, full_k, full_k, full_q, full_lse, full_lse],
            out_specs=(full_q, full_k, full_k),
            out_shape=(jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
                       jax.ShapeDtypeStruct((b * h, kv_pad, d_pad), k.dtype),
                       jax.ShapeDtypeStruct((b * h, kv_pad, d_pad), v.dtype)),
            cost_estimate=pl.CostEstimate(
                flops=10 * b * h * sq_pad * kv_pad * d_pad,
                bytes_accessed=3 * (qp.size + kp.size + vp.size)
                               * qp.dtype.itemsize,
                transcendentals=b * h * sq_pad * kv_pad,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(qp, kp, vp, dop, lse_p, delta)
        unpad_q1 = lambda t: t.reshape(b, h, sq_pad, d_pad)[:, :, :sq, :d]
        unpad_k1 = lambda t: t.reshape(b, h, kv_pad, d_pad)[:, :, :kv_len, :d]
        return unpad_q1(dq), unpad_k1(dk), unpad_k1(dv)

    q_spec = pl.BlockSpec((1, block_q, d_pad), lambda bh, qb: (bh, qb, 0),
                          memory_space=pltpu.VMEM)
    qfull_spec = pl.BlockSpec((1, sq_pad, d_pad), lambda bh, xb: (bh, 0, 0),
                              memory_space=pltpu.VMEM)
    kfull_spec = pl.BlockSpec((1, kv_pad, d_pad), lambda bh, qb: (bh, 0, 0),
                              memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, d_pad), lambda bh, kb: (bh, kb, 0),
                          memory_space=pltpu.VMEM)
    lse_q_spec = pl.BlockSpec((1, 8, block_q), lambda bh, qb: (bh, 0, qb),
                              memory_space=pltpu.VMEM)
    lse_full_spec = pl.BlockSpec((1, 8, sq_pad), lambda bh, xb: (bh, 0, 0),
                                 memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, kv_len=kv_len, block_k=block_k,
                          sm_scale=sm_scale),
        grid=(b * h, sq_pad // block_q),
        in_specs=[q_spec, kfull_spec, kfull_spec, q_spec, lse_q_spec,
                  lse_q_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
    )(qp, kp, vp, dop, lse_p, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, q_len=sq, kv_len=kv_len,
                          block_q=block_q, sm_scale=sm_scale),
        grid=(b * h, kv_pad // block_k),
        in_specs=[qfull_spec, k_spec, k_spec, qfull_spec, lse_full_spec,
                  lse_full_spec],
        out_specs=(k_spec, k_spec),
        out_shape=(jax.ShapeDtypeStruct((b * h, kv_pad, d_pad), k.dtype),
                   jax.ShapeDtypeStruct((b * h, kv_pad, d_pad), v.dtype)),
    )(qp, kp, vp, dop, lse_p, delta)

    unpad_q = lambda t: t.reshape(b, h, sq_pad, d_pad)[:, :, :sq, :d]
    unpad_k = lambda t: t.reshape(b, h, kv_pad, d_pad)[:, :, :kv_len, :d]
    return unpad_q(dq), unpad_k(dk), unpad_k(dv)


# ---------------------------------------------------------------------------
# packed-heads variant: q/k/v in the natural (b, s, h*d) Dense-output layout
# ---------------------------------------------------------------------------
#
# The standard path takes (b, h, s, d), which the model produces by
# transposing the (b, s, h, d) view of each projection — and because a Pallas
# custom call pins default layouts on its operands, XLA materializes that
# transpose as a real HBM relayout copy on q, k, v and the output, forward
# AND backward. Profiled at 15.4 ms/step of the 230 ms Base train step
# (tools/profile_step.py; bf16[35,12,852,64] copies at layers.py/attention.py
# sources). This variant consumes the projections AS PRODUCED: one program
# per (batch, head-pair), each block a lane-aligned (s, 2*64) slab of the
# (b, s, 768) array — zero transposes anywhere in the attention path.
# Head pairs (G=2) keep every block 128-lane aligned; inside the program the
# two heads are lane-slices computed sequentially with the same whole-seq
# straight-line math as the standard kernel.


def _packed_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, d: int,
                       sm_scale: float):
    q2 = q_ref[0]  # (s, G*d) head-pair slab, native dtype
    k2 = k_ref[0]
    v2 = v_ref[0]
    outs = []
    for j in range(q2.shape[-1] // d):
        q = q2[:, j * d:(j + 1) * d]
        k = k2[:, j * d:(j + 1) * d]
        v = v2[:, j * d:(j + 1) * d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(p.astype(v.dtype), v,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        l_safe = jnp.maximum(l, 1e-30)
        outs.append((acc / l_safe).astype(o_ref.dtype))
        lse = (m + jnp.log(l_safe))[:, 0]
        lse_ref[0, j] = jnp.broadcast_to(lse[None, :], (8, lse.shape[0]))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _packed_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref,
                       dq_ref, dk_ref, dv_ref, *, d: int, sm_scale: float):
    q2 = q_ref[0]
    k2 = k_ref[0]
    v2 = v_ref[0]
    do2 = do_ref[0]
    dqs, dks, dvs = [], [], []
    for j in range(q2.shape[-1] // d):
        q = q2[:, j * d:(j + 1) * d]
        k = k2[:, j * d:(j + 1) * d]
        v = v2[:, j * d:(j + 1) * d]
        do = do2[:, j * d:(j + 1) * d]
        lse = lse_ref[0, j, 0][:, None]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        p = jnp.exp(s - lse)
        dv = jax.lax.dot_general(p.astype(do.dtype), do,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # delta = rowsum(do*o) = rowsum(p*dp) exactly (o = p@v), with p and
        # dp already live in f32 registers — this deletes the XLA delta
        # pass over do/out AND removes out from the saved residuals
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta) * sm_scale).astype(q.dtype)
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dqs.append(dq.astype(dq_ref.dtype))
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
    dq_ref[0] = jnp.concatenate(dqs, axis=-1)
    dk_ref[0] = jnp.concatenate(dks, axis=-1)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1)


_PACKED_G = 2  # heads per program: G*d = 128 keeps lane offsets tile-aligned


def packed_flash_supported(seq_len: int, num_heads: int, d: int,
                           bias) -> bool:
    """Engages for the whole-sequence regime on lane-alignable head pairs —
    the audio towers (852/1214 tokens, h=12, d=64) and ViT-L/14 (257 tokens,
    h=16). Crossover measured on-chip: S=197 (ViT-B) is a wash vs XLA, S=257
    is a model-level win at Large — 222→206 ms/step (+8%), largely because
    XLA's attention backward keeps (b,h,s,s) softmax residuals that feed the
    HBM-pressure fc1 remat (docs/BENCHMARKS.md Large profile). 256 splits
    the two measured points; ``SYNERGY_PACKED_SEQ_MIN`` overrides for A/Bs
    (read at trace time)."""
    seq_min = int(os.environ.get("SYNERGY_PACKED_SEQ_MIN", "256"))
    return (bias is None and d == 64 and num_heads % _PACKED_G == 0
            and seq_min <= seq_len <= 2048
            and jax.default_backend() == "tpu")


def _packed_forward(q, k, v, num_heads: int):
    b, s, hd = q.shape
    d = hd // num_heads
    grid = (b, num_heads // _PACKED_G)
    slab = pl.BlockSpec((1, s, _PACKED_G * d), lambda bi, pi: (bi, 0, pi),
                        memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, _PACKED_G, 8, s), lambda bi, pi: (bi, pi, 0, 0),
                            memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_packed_fwd_kernel, d=d, sm_scale=1.0 / (d ** 0.5)),
        grid=grid,
        in_specs=[slab, slab, slab],
        out_specs=(slab, lse_spec),
        out_shape=(jax.ShapeDtypeStruct((b, s, hd), q.dtype),
                   jax.ShapeDtypeStruct((b, num_heads, 8, s), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * s * s * d,
            bytes_accessed=3 * q.size * q.dtype.itemsize,
            transcendentals=b * num_heads * s * s,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v)
    return out, lse


def _packed_backward(q, k, v, lse, g, num_heads: int):
    b, s, hd = q.shape
    d = hd // num_heads
    grid = (b, num_heads // _PACKED_G)
    slab = pl.BlockSpec((1, s, _PACKED_G * d), lambda bi, pi: (bi, 0, pi),
                        memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, _PACKED_G, 8, s), lambda bi, pi: (bi, pi, 0, 0),
                            memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, d=d, sm_scale=1.0 / (d ** 0.5)),
        grid=grid,
        in_specs=[slab, slab, slab, slab, lse_spec],
        out_specs=(slab, slab, slab),
        out_shape=(jax.ShapeDtypeStruct((b, s, hd), q.dtype),
                   jax.ShapeDtypeStruct((b, s, hd), k.dtype),
                   jax.ShapeDtypeStruct((b, s, hd), v.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * num_heads * s * s * d,
            bytes_accessed=8 * q.size * q.dtype.itemsize,
            transcendentals=b * num_heads * s * s,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v, g, lse)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_packed(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           num_heads: int) -> jnp.ndarray:
    """Flash attention over (b, s, h*d) projections — no transposes.

    Use :func:`packed_flash_supported` to decide routing; unsupported shapes
    should take the standard (b, h, s, d) path instead."""
    out, _ = _packed_forward(q, k, v, num_heads)
    return out


def _packed_vjp_fwd(q, k, v, num_heads):
    out, lse = _packed_forward(q, k, v, num_heads)
    # the backward recomputes delta = rowsum(p*dp) in-kernel, so `out` is
    # NOT a residual (saves a (b, s, h*d) tensor per layer)
    return out, (q, k, v, lse)


def _packed_vjp_bwd(num_heads, res, g):
    q, k, v, lse = res
    return _packed_backward(q, k, v, lse, g, num_heads)


flash_attention_packed.defvjp(_packed_vjp_fwd, _packed_vjp_bwd)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

def _reference(q, k, v, bias):
    from synergy_tpu.ops.attention import xla_attention

    return xla_attention(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if bias is not None:
        return _reference(q, k, v, bias)
    out, _, _ = _flash_forward(q, k, v)
    b, h, sq, d = q.shape
    return out.reshape(b, h, -1, out.shape[-1])[:, :, :sq, :d]


def _fwd(q, k, v, bias):
    if bias is not None:
        return _reference(q, k, v, bias), (q, k, v, bias, None, None)
    out, lse, _ = _flash_forward(q, k, v)
    b, h, sq, d = q.shape
    # save the UNPADDED output: residuals dominate activation memory over the
    # 12-layer audio tower, and the (sq_pad, d_pad) padding costs ~2.4x here
    out_c = out.reshape(b, h, -1, out.shape[-1])[:, :, :sq, :d]
    return out_c, (q, k, v, bias, out_c, lse)


def _bwd(res, g):
    q, k, v, bias, out, lse = res
    if bias is not None:
        _, vjp = jax.vjp(lambda q_, k_, v_: _reference(q_, k_, v_, bias),
                         q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    dq, dk, dv = _flash_backward(q, k, v, out, lse, g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
