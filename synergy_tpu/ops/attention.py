"""Multi-head attention compute op with switchable backends.

The reference's attention lives inside HF towers on cuDNN (SURVEY §2.2); here
it is a first-class op:

  * ``xla``    — einsum attention with f32 softmax accumulation; XLA fuses it
                 well for the short sequences in this workload (32..1214).
  * ``pallas`` — fused flash-attention kernel (ops/flash_attention.py) for TPU;
                 forward is a Pallas kernel, backward recomputes via the XLA
                 path under ``jax.custom_vjp``.

Select per-call (``impl=``) or globally via env ``SYNERGY_ATTN_IMPL``.
Shapes: q, k, v are (B, H, S, D); ``bias`` broadcastable to (B, H, Sq, Sk).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    depth = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(depth, jnp.float32)).astype(q.dtype)
    # accumulate in >= f32: upcasts bf16 logits, but must not DOWNcast the
    # f64 oracle runs (tests/test_reference_oracle.py pins 1e-8 in x64)
    acc = jnp.promote_types(q.dtype, jnp.float32)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=acc)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          bias: Optional[jnp.ndarray] = None,
                          impl: Optional[str] = None) -> jnp.ndarray:
    impl = impl or os.environ.get("SYNERGY_ATTN_IMPL", "auto")
    if impl == "auto":
        # Measured on v5e (b35 h12 d64, fwd+bwd, bf16): the tuned Pallas
        # kernels (single-shot KV blocks) run 852 tokens at 6.4ms vs XLA's
        # 10.5ms, so long unmasked sequences (the audio tower) route to
        # Pallas; short towers (text 32 w/ mask, vision 197/257) stay on
        # XLA, which fuses those sizes well.
        on_tpu = jax.default_backend() == "tpu"
        impl = "pallas" if (on_tpu and bias is None and k.shape[2] >= 512) else "xla"
    if impl == "pallas":
        from synergy_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, bias)
    return xla_attention(q, k, v, bias)


def mask_to_bias(attention_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, Sk) 0/1 mask -> additive (B, 1, 1, Sk) bias with -inf-ish fill,
    matching HF's extended attention mask semantics."""
    bias = (1.0 - attention_mask.astype(jnp.float32)) * jnp.finfo(jnp.float32).min
    return bias[:, None, None, :].astype(dtype)
