"""A/B the LayerNorm fusion-boundary variants on the real train step.

Target: the last identified off-roofline fusion family in the Large profile
(docs/BENCHMARKS.md) — XLA fuses the next layer's LayerNorm stats into the
fc2 dW/dx matmuls (`convert_reduce` fusions, 0.79 ms each x 12 AST layers vs
~0.4 ms roofline). Variants (SYNERGY_LN_IMPL, models/layers.py):

  flax     current production path (nn.LayerNorm)
  saved    custom-VJP LN saving (x, mean, rstd): the backward never
           recomputes LN stats, so the fc2 dW/dx fusions carry no reduce
  barrier  optimization_barrier between residual sum and LN stats: splits
           the forward fusion instead

Protocol per CLAUDE.md measurement discipline: all variants compiled first,
then timing windows INTERLEAVED round-robin in one process, best-of-N per
variant, on-chip scan of --steps steps per window.

Usage: python tools/exp_ln.py --size large --steps 10 --rounds 5
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

try:
    _cache = os.path.join(os.path.expanduser("~"), ".cache", "synergy_tpu",
                          "xla_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", choices=["base", "large"], default="large")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--variants", type=str, default="flax,saved,barrier")
    args = p.parse_args()

    from synergy_tpu.configs import CLIPConfig, TrainConfig
    from synergy_tpu.models.tri_clip import TriCLIP
    from synergy_tpu.train.state import create_train_state, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    if args.size == "large":
        cfg, batch = CLIPConfig.large(), (14 if on_tpu else 2)
    else:
        cfg, batch = (CLIPConfig.base() if on_tpu else CLIPConfig.tiny()), \
            (35 if on_tpu else 8)

    rng = np.random.default_rng(0)
    seq = 32 if on_tpu else 8
    batch_np = {
        "pixel_values": jnp.asarray(rng.standard_normal(
            (batch, 3, cfg.vision.image_size, cfg.vision.image_size)),
            jnp.float32),
        "input_ids": jnp.asarray(rng.integers(4, cfg.text.vocab_size,
                                              (batch, seq)), jnp.int32),
        "attention_mask": jnp.ones((batch, seq), jnp.int32),
        "input_values": jnp.asarray(rng.standard_normal(
            (batch, cfg.audio.max_length, cfg.audio.num_mel_bins)),
            jnp.float32),
    }
    model = TriCLIP(cfg, dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    tcfg = TrainConfig(per_device_batch=batch, accum_steps=1)

    # A Large f32 train state is ~9 GB (params + mu + nu); holding one per
    # variant OOMs the chip. So: compile each variant once (its jit cache
    # lives in `compiled`), but materialize ONE state at a time — rebuilt
    # fresh at each visit (same PRNGKey → identical values), dropped before
    # the next variant's window. Interleaving across rounds is preserved.
    variants = args.variants.split(",")
    compiled, losses0 = {}, {}
    for v in variants:
        os.environ["SYNERGY_LN_IMPL"] = v
        step = make_train_step(model, tcfg)

        def run_k(state, k, _step=step):
            def body(s, _):
                s, metrics = _step(s, batch_np)
                return s, metrics["loss"]
            return jax.lax.scan(body, state, None, length=k)

        # donate the state: without it the scan holds input + carry
        # (2 x ~9 GB f32 at Large) and the chip OOMs
        compiled[v] = jax.jit(run_k, static_argnums=(1,),
                              donate_argnums=(0,))

    def fresh_state(v):
        os.environ["SYNERGY_LN_IMPL"] = v
        return create_train_state(jax.random.PRNGKey(0), model, tcfg,
                                  batch_np)

    for v in variants:  # compile + warmup, one resident state at a time
        t0 = time.time()
        st, ls = compiled[v](fresh_state(v), args.steps)
        losses0[v] = float(ls[-1])
        del st, ls
        print(f"[exp_ln] {v}: compiled+warm in {time.time() - t0:.0f}s "
              f"loss={losses0[v]:.4f}", flush=True)

    best = {v: float("inf") for v in variants}
    for r in range(args.rounds):
        for v in variants:
            st = fresh_state(v)
            st, ls = compiled[v](st, args.steps)  # re-warm after rebuild
            float(ls[-1])  # SYNC: drain async state init + re-warm before t0
            t0 = time.perf_counter()
            st, ls = compiled[v](st, args.steps)
            float(ls[-1])
            dt = (time.perf_counter() - t0) / args.steps * 1e3
            del st, ls
            best[v] = min(best[v], dt)
            print(f"[exp_ln] round {r} {v}: {dt:.1f} ms/step", flush=True)

    out = {v: round(best[v], 2) for v in variants}
    out["triplets_per_sec"] = {
        v: round(batch / best[v] * 1e3, 1) for v in variants}
    out["loss"] = losses0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
