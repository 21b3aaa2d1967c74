"""Host input-pipeline throughput: can the loader feed the chip?

SURVEY.md §7 "hard parts" #7 names the input pipeline — not the model math —
as the likely bottleneck at scale: the reference does per-sample PIL decode +
librosa load/resample + fbank inside DataLoader workers (reference
dataset.py:135-168). Our split does image/wave decode on the host
(TriModalLoader thread pool, C++ front-end with the GIL released) and the
augmentation + fbank inside the jitted train step, so the host cost per
triplet is JPEG decode+resize, WAV decode+resample(22.05k->16k), audio
augmentation, and tokenization.

This tool builds a realistic on-disk fixture (full-length 10.25 s clips —
the fbank's 1024-frame window — and VGGSound-style 360x480 JPEG frames),
then measures:
  * per-stage host cost per sample (image / audio / tokenize);
  * sustained TriModalLoader triplets/s at several worker counts;
  * the implied loader-cores-per-chip ratio against a device train rate.

Run:  python tools/bench_pipeline.py [--samples 64] [--batches 8]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import wave as wavmod

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synergy_tpu.data.pipeline import (  # noqa: E402
    CSVTriModalDataset, TriModalLoader, get_tokenizer,
)

CLIP_SECONDS = 10.25
SRC_RATE = 22050  # librosa's default load rate in the reference (dataset.py:143)


def make_fixture(d: str, n: int) -> str:
    """n rows of (360x480 JPEG, 10.25 s 22.05 kHz WAV, label, caption)."""
    from PIL import Image

    import pandas as pd

    rng = np.random.default_rng(7)
    labels = ["dog barking", "rain", "fireworks", "playing violin",
              "church bells", "sea waves"]
    t = np.arange(int(CLIP_SECONDS * SRC_RATE)) / SRC_RATE
    rows = []
    for i in range(n):
        img_path = os.path.join(d, f"img{i}.jpg")
        # structured image so JPEG decode cost is realistic (not flat noise)
        base = rng.random((45, 60, 3)).astype(np.float32)
        img = np.kron(base, np.ones((8, 8, 1), np.float32))
        img += 0.1 * rng.random((360, 480, 3)).astype(np.float32)
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)
                        ).save(img_path, quality=85)
        wav_path = os.path.join(d, f"a{i}.wav")
        pcm = (np.sin(2 * np.pi * (200 + 40 * i) * t)
               * 2000 + rng.standard_normal(t.shape) * 100).astype("<i2")
        with wavmod.open(wav_path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SRC_RATE)
            w.writeframes(pcm.tobytes())
        rows.append((img_path, wav_path, labels[i % len(labels)],
                     f"a recording of {labels[i % len(labels)]} number {i}"))
    csv = os.path.join(d, "train.csv")
    pd.DataFrame(rows, columns=["img_path", "wav_path", "label", "caption"]
                 ).to_csv(csv, index=False)
    return csv


def per_stage(ds: CSVTriModalDataset, tokenizer, n: int) -> dict:
    """Isolated per-sample stage costs (ms), averaged over n samples."""
    from PIL import Image

    from synergy_tpu.data import audio as A
    from synergy_tpu.runtime import get_audio_frontend

    fe = get_audio_frontend()
    img_ms = aud_ms = tok_ms = aug_ms = 0.0
    texts = []
    for i in range(n):
        row = ds.df.iloc[i % len(ds.df)]
        t0 = time.perf_counter()
        img = Image.open(row.img_path).convert("RGB")
        img = img.resize((224, 224), Image.BILINEAR)
        np.asarray(img, np.float32)
        t1 = time.perf_counter()
        if fe is not None:
            wave, sr = fe.read_wav(row.wav_path)
            if sr != A.SAMPLE_RATE:
                wave = fe.resample(wave, sr, A.SAMPLE_RATE)
        else:
            wave, sr = A.read_wav(row.wav_path)
            if sr != A.SAMPLE_RATE:
                wave = A.resample(wave, sr, A.SAMPLE_RATE)
        t2 = time.perf_counter()
        rng = np.random.default_rng(i)
        A.audio_augment(np.asarray(wave, np.float32), apply_rate=0.20, rng=rng)
        t3 = time.perf_counter()
        img_ms += (t1 - t0) * 1e3
        aud_ms += (t2 - t1) * 1e3
        aug_ms += (t3 - t2) * 1e3
        texts.append(f"a recording of something number {i}")
    t0 = time.perf_counter()
    tokenizer(texts, max_length=32)
    tok_ms = (time.perf_counter() - t0) * 1e3
    return {
        "image_decode_resize_ms": round(img_ms / n, 3),
        "wav_decode_resample_ms": round(aud_ms / n, 3),
        "audio_augment_ms": round(aug_ms / n, 3),
        "tokenize_ms": round(tok_ms / n, 3),
        "native_frontend": fe is not None,
    }


def sustained(ds, tokenizer, batch: int, batches: int, workers: int) -> float:
    loader = TriModalLoader(ds, tokenizer, batch_size=batch,
                            num_workers=workers, drop_last=False,
                            shuffle=True, seed=0)
    it = iter(loader)
    next(it)  # warm caches/threads outside the timed region
    done = 0
    epoch = 0
    t0 = time.perf_counter()
    while done < batches * batch:  # loop epochs until the request is met
        for b in it:
            done += b["pixel_rgb"].shape[0]
            if done >= batches * batch:
                break
        else:
            epoch += 1
            loader.set_epoch(epoch)
            it = iter(loader)
            continue
        break
    dt = time.perf_counter() - t0
    return done / dt


def end_to_end(csv: str, batch: int, steps: int) -> dict:
    """Loader -> prefetch -> device_put -> jitted Base train step (device
    preprocessing inside, like train/pretrain.py), NO checkpointing or
    validation: the sustained overlapped rate. Runs on the default JAX
    platform (the TPU when present)."""
    import itertools

    import jax
    import jax.numpy as jnp

    from synergy_tpu.configs import CLIPConfig, TrainConfig
    from synergy_tpu.data.pipeline import (CSVTriModalDataset, TriModalLoader,
                                           get_tokenizer, prefetch)
    from synergy_tpu.models.tri_clip import TriCLIP
    from synergy_tpu.train.state import create_train_state, make_train_step
    from synergy_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = CLIPConfig.base()
    tcfg = TrainConfig(per_device_batch=batch, accum_steps=1,
                       learning_rate=5e-6)
    model = TriCLIP(cfg, dtype=jnp.bfloat16)
    ds = CSVTriModalDataset(csv, is_captioned=False)
    loader = TriModalLoader(ds, get_tokenizer(), batch, drop_last=True)

    def batches(total):
        # bounded (not an infinite epoch loop): the prefetch producer is a
        # daemon thread, and an unbounded generator would keep reading
        # fixture files after the measurement — racing the tempdir cleanup
        done = 0
        epoch = 0
        while done < total:
            loader.set_epoch(epoch)
            for b in iter(loader):
                yield b
                done += 1
                if done >= total:
                    return
            epoch += 1

    it = prefetch(batches(steps + 1))
    first = next(it)
    sample = {
        "pixel_values": jnp.zeros((batch, 3, 224, 224)),
        "input_ids": jnp.asarray(first["input_ids"]),
        "attention_mask": jnp.asarray(first["attention_mask"]),
        "input_values": jnp.zeros((batch, cfg.audio.max_length,
                                   cfg.audio.num_mel_bins)),
    }
    state = create_train_state(jax.random.PRNGKey(0), model, tcfg, sample)
    step = jax.jit(make_train_step(model, tcfg, preprocess=True),
                   donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    key, k = jax.random.split(key)
    state, m = step(state, {kk: jnp.asarray(v) for kk, v in first.items()}, k)
    float(m["loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for b in itertools.islice(it, steps):
        key, k = jax.random.split(key)
        state, m = step(state, {kk: jnp.asarray(v) for kk, v in b.items()}, k)
    float(m["loss"])
    dt = time.perf_counter() - t0
    return {"metric": "end_to_end_train_triplets_per_sec",
            "value": round(steps * batch / dt, 1), "unit": "triplets/s",
            "platform": jax.default_backend(), "compile_s": round(compile_s, 1),
            "steps": steps, "batch": batch}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=64)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--workers", type=int, nargs="+", default=[1, 4, 8])
    p.add_argument("--train_rate", type=float, default=174.6,
                   help="device train triplets/s/chip to compare against")
    p.add_argument("--device", action="store_true",
                   help="also run the end-to-end loader+train-step mode "
                        "(uses the default JAX platform, e.g. the TPU)")
    p.add_argument("--device_steps", type=int, default=10)
    p.add_argument("--device_batch", type=int, default=35)
    p.add_argument("--keep", action="store_true")
    args = p.parse_args(argv)

    d = tempfile.mkdtemp(prefix="synergy_pipe_bench_")
    try:
        t0 = time.perf_counter()
        csv = make_fixture(d, args.samples)
        print(f"[fixture] {args.samples} rows ({CLIP_SECONDS}s WAV + 360x480 "
              f"JPEG) in {time.perf_counter() - t0:.1f}s")
        tokenizer = get_tokenizer()
        ds = CSVTriModalDataset(csv, is_captioned=False, augment_audio=True)

        stages = per_stage(ds, tokenizer, n=min(32, args.samples))
        total_ms = (stages["image_decode_resize_ms"]
                    + stages["wav_decode_resample_ms"]
                    + stages["audio_augment_ms"] + stages["tokenize_ms"])
        print(f"[stages] {json.dumps(stages)}")
        print(f"[stages] total host ms/triplet: {total_ms:.2f} "
              f"(single-thread ceiling ~{1000.0 / total_ms:.0f} triplets/s/core)")

        results = {}
        for w in args.workers:
            rate = sustained(ds, tokenizer, args.batch, args.batches, w)
            results[w] = rate
            print(f"[loader] workers={w}: {rate:.1f} triplets/s "
                  f"(chips fed at {args.train_rate}/chip: "
                  f"{rate / args.train_rate:.2f})")
        best = max(results.values())
        print(json.dumps({
            "metric": "host_pipeline_triplets_per_sec",
            "value": round(best, 1),
            "unit": "triplets/s",
            "stages_ms": stages,
            "cores": (len(os.sched_getaffinity(0))
                      if hasattr(os, "sched_getaffinity")
                      else (os.cpu_count() or 1)),
            "chips_fed_per_loader_host": round(best / args.train_rate, 2),
        }))
        if args.device:
            print(json.dumps(end_to_end(csv, args.device_batch,
                                        args.device_steps)))
    finally:
        if not args.keep:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
