"""Micro-benchmark for the flash-attention kernel (real-chip A/B harness).

Scan-chains K calls of the attention op (fwd or fwd+bwd) so per-dispatch
tunnel latency cannot pollute the numbers (same methodology as bench.py),
and reports ms/call plus effective TF/s against the matmul FLOP count.

Usage:
  python tools/bench_attn.py --seq 852 --mode train --impl flash
  python tools/bench_attn.py --seq 852 --mode train --impl xla
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from synergy_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=35)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--seq", type=int, default=852)
    p.add_argument("--mode", choices=["fwd", "train"], default="train")
    p.add_argument("--impl", choices=["flash", "xla"], default="flash")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=1)
    args = p.parse_args()

    from synergy_tpu.ops.flash_attention import flash_attention
    from synergy_tpu.ops.attention import xla_attention

    b, h, s, d = args.batch, args.heads, args.seq, args.d
    rng = np.random.default_rng(0)
    shape = (b, h, s, d)
    q = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    attn = flash_attention if args.impl == "flash" else (
        lambda q_, k_, v_: xla_attention(q_, k_, v_, None))

    if args.mode == "fwd":
        def one(q_):
            return attn(q_, k, v)
    else:
        def loss(q_):
            return jnp.sum(attn(q_, k, v).astype(jnp.float32) ** 2)

        def one(q_):
            g = jax.grad(loss)(q_)
            return (q_ + 1e-6 * g).astype(q_.dtype)

    @functools.partial(jax.jit, static_argnums=1)
    def chain(q0, n_steps):
        def body(c, _):
            return one(c), ()
        out, _ = jax.lax.scan(body, q0, None, length=n_steps)
        return jnp.sum(out.astype(jnp.float32))

    # warmup/compile (same scan length as the timed call, or the timed call
    # would recompile)
    chain(q, args.steps).block_until_ready()
    t0 = time.perf_counter()
    chain(q, args.steps).block_until_ready()
    dt = time.perf_counter() - t0
    ms = dt / args.steps * 1e3

    # matmul FLOPs (unpadded): fwd = 4*s^2*d per (b,h); bwd adds 10*s^2*d
    per_bh = (4 if args.mode == "fwd" else 14) * s * s * d
    tf = per_bh * b * h / (ms / 1e3) / 1e12
    print(f"impl={args.impl} mode={args.mode} seq={s} b={b} h={h} d={d}: "
          f"{ms:.3f} ms/call, {tf:.1f} TF/s effective")


if __name__ == "__main__":
    main()
