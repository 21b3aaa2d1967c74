"""Headline benchmark: tri-modal contrastive TRAINING throughput on TPU.

Measures full Base training steps (3 tower forwards + backward + AdamW over
globally-batched 3-pair InfoNCE, bf16 compute, Pallas flash attention on the
852-token audio tower) and reports triplets/sec/chip.

Prints ONE JSON line:
  {"metric": "triplets_per_sec_per_chip", "value": N, "unit": "triplets/s",
   "vs_baseline": N/5000}
vs_baseline is against the BASELINE.json north-star target (>=5k tri-modal
triplets/sec/chip on v5e for the Base config); the reference itself publishes
no throughput numbers (BASELINE.md).
"""

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compilation cache: repeated bench runs skip the multi-minute
# XLA compile of the Base train step
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
    p.add_argument("--batch", type=int, default=None, help="per-chip batch")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--accum", type=int, default=1,
                   help="gradient-accumulation microbatches per optimizer "
                        "update (the reference trains Base at 35/4 and "
                        "Large at 14/8, main_pretraining.py:79-80); each "
                        "bench step is ONE microbatch")
    p.add_argument("--mode", choices=["train", "infer", "preprocess"],
                   default="train")
    p.add_argument("--size", choices=["base", "large"], default="base")
    args = p.parse_args()

    from synergy_tpu.configs import CLIPConfig, TrainConfig
    from synergy_tpu.models.tri_clip import TriCLIP
    from synergy_tpu.train.state import create_train_state, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    n_dev = jax.device_count()

    if args.mode == "preprocess":
        # device-fused preprocessing throughput: image augmentation chain +
        # log-mel fbank (the BASELINE north star's preprocessing fusion)
        from synergy_tpu.data.audio import log_mel_fbank
        from synergy_tpu.data.image import train_transform

        batch = args.batch or (256 if on_tpu else 16)
        rng_np = np.random.default_rng(0)
        imgs = jnp.asarray(rng_np.random((batch, 224, 224, 3)), jnp.float32)
        waves = jnp.asarray(
            0.1 * rng_np.standard_normal((batch, 164080)), jnp.float32)

        def run(key, imgs, waves, steps):
            def body(k, _):
                k, sub = jax.random.split(k)
                keys = jax.random.split(sub, imgs.shape[0])
                px = jax.vmap(train_transform)(keys, imgs)
                fb = jax.vmap(log_mel_fbank)(waves)
                return k, (jnp.sum(px) + jnp.sum(fb))
            return jax.lax.scan(body, key, None, length=steps)

        run = jax.jit(run, static_argnums=(3,))
        key = jax.random.PRNGKey(0)
        _, sums = run(key, imgs, waves, args.steps)
        float(sums[-1])
        t0 = time.perf_counter()
        _, sums = run(key, imgs, waves, args.steps)
        float(sums[-1])
        dt = time.perf_counter() - t0
        per_chip = args.steps * batch / dt / n_dev
        print(json.dumps({
            "metric": "preprocess_triplets_per_sec_per_chip",
            "value": round(per_chip, 2),
            "unit": "triplets/s",
            "vs_baseline": round(per_chip / 5000.0, 4),
        }))
        return
    if args.size == "large":
        cfg = CLIPConfig.large()
        batch = args.batch or ((14 if on_tpu else 2) * n_dev)  # ref per-replica
    else:
        cfg = CLIPConfig.base() if on_tpu else CLIPConfig.tiny()
        batch = args.batch or ((35 if on_tpu else 8) * n_dev)

    model = TriCLIP(cfg, dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    rng = np.random.default_rng(0)
    seq = 32 if on_tpu else 8
    batch_np = {
        "pixel_values": jnp.asarray(rng.standard_normal(
            (batch, 3, cfg.vision.image_size, cfg.vision.image_size)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(4, cfg.text.vocab_size,
                                              (batch, seq)), jnp.int32),
        "attention_mask": jnp.ones((batch, seq), jnp.int32),
        "input_values": jnp.asarray(rng.standard_normal(
            (batch, cfg.audio.max_length, cfg.audio.num_mel_bins)), jnp.float32),
    }
    tcfg = TrainConfig(per_device_batch=batch // n_dev,
                       accum_steps=args.accum)
    state = create_train_state(jax.random.PRNGKey(0), model, tcfg, batch_np)

    if args.mode == "train":
        # K steps inside ONE device program (lax.scan): measures pure device
        # throughput, immune to per-dispatch tunnel latency. With --accum k,
        # each scan iteration is one microbatch and every k-th applies the
        # optimizer (optax.MultiSteps), so steps should be a multiple of k
        # to time whole update cycles.
        if args.accum > 1 and args.steps % args.accum:
            raise SystemExit(f"--steps {args.steps} must be a multiple of "
                             f"--accum {args.accum}")
        base_step = make_train_step(model, tcfg)

        def run_k(state, k):
            def body(s, _):
                s, metrics = base_step(s, batch_np)
                return s, metrics["loss"]

            return jax.lax.scan(body, state, None, length=k)

        run_k = jax.jit(run_k, static_argnums=(1,), donate_argnums=(0,))
        state, losses = run_k(state, args.steps)  # compile + warmup
        float(losses[-1])  # force full sync (host transfer)
        t0 = time.perf_counter()
        state, losses = run_k(state, args.steps)
        float(losses[-1])
        dt = time.perf_counter() - t0
    else:
        fwd = jax.jit(lambda p, b: model.apply(
            {"params": p}, b["pixel_values"], b["input_ids"],
            b["attention_mask"], b["input_values"]))
        out = fwd(state.params, batch_np)
        float(out["image_embeds"][0, 0])  # force full sync
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fwd(state.params, batch_np)
        float(out["image_embeds"][0, 0])
        dt = time.perf_counter() - t0

    triplets_per_sec = args.steps * batch / dt
    per_chip = triplets_per_sec / n_dev
    record = {
        "metric": "triplets_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "triplets/s",
        "vs_baseline": round(per_chip / 5000.0, 4),
    }
    if args.mode == "train" and args.size == "base":
        # roofline context (docs/BENCHMARKS.md): 636 GF trained per Base
        # triplet; v5e bf16 peak 197 TF/s. The 5k 'baseline' is 16x chip
        # peak (a >=36-chip aggregate target), so MFU is the honest
        # single-chip score.
        record["mfu"] = round(per_chip * 636e9 / 197e12, 4)
    elif args.mode == "train" and args.size == "large":
        # 1,327 GF trained per Large triplet (ViT-L/14 257 tok 162 GF +
        # RoBERTa-large 19 GF + AST-1214 261 GF fwd, x3 for training)
        record["mfu"] = round(per_chip * 1327e9 / 197e12, 4)
    if args.accum > 1:
        record["accum"] = args.accum
    try:  # HBM headroom (TPU runtime exposes per-device memory stats)
        stats = jax.local_devices()[0].memory_stats()
        record["hbm_peak_gb"] = round(
            stats["peak_bytes_in_use"] / 2**30, 2)
        record["hbm_limit_gb"] = round(
            stats["bytes_limit"] / 2**30, 2)
    except Exception:
        pass
    print(json.dumps(record))


if __name__ == "__main__":
    main()
