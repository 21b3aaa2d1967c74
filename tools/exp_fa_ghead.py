"""G-heads-per-program whole-seq flash fwd prototype."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from synergy_tpu.utils import enable_compilation_cache

enable_compilation_cache()

B, H, D = 35, 12, 64
S = int(sys.argv[1]) if len(sys.argv) > 1 else 197
G = int(sys.argv[2]) if len(sys.argv) > 2 else 4
STEPS = 30


def kern(q_ref, k_ref, v_ref, o_ref, lse_ref, *, g: int, sm_scale: float):
    for i in range(g):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        l_safe = jnp.maximum(l, 1e-30)
        o_ref[i] = (acc / l_safe).astype(o_ref.dtype)
        lse = (m + jnp.log(l_safe))[:, 0]
        lse_ref[i] = jnp.broadcast_to(lse[None, :], (8, lse.shape[0]))


def run(q, k, v):
    full = pl.BlockSpec((G, S, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((G, 8, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kern, g=G, sm_scale=1.0 / 8.0),
        grid=(B * H // G,), in_specs=[full, full, full],
        out_specs=(full, lspec),
        out_shape=(jax.ShapeDtypeStruct((B * H, S, D), jnp.bfloat16),
                   jax.ShapeDtypeStruct((B * H, 8, S), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * S * D, bytes_accessed=3 * B * H * S * D * 2,
            transcendentals=B * H * S * S),
    )(q, k, v)


rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B * H, S, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B * H, S, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B * H, S, D)), jnp.bfloat16)


@jax.jit
def chain(q0):
    def body(c, _):
        o, _ = run(c, k, v)
        return (c + jnp.bfloat16(1e-6) * o), ()
    out, _ = jax.lax.scan(body, q0, None, length=STEPS)
    return jnp.sum(out.astype(jnp.float32))


chain(q).block_until_ready()
t0 = time.perf_counter()
chain(q).block_until_ready()
dt = (time.perf_counter() - t0) / STEPS * 1e3
print(f"S={S} G={G}: {dt:.3f} ms", flush=True)

# correctness
from synergy_tpu.ops.attention import xla_attention
o, _ = run(q, k, v)
ref = xla_attention(q.reshape(B, H, S, D), k.reshape(B, H, S, D),
                    v.reshape(B, H, S, D), None).reshape(B * H, S, D)
err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref.astype(jnp.float32))))
print("max err:", err)
