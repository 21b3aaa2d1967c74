"""Tri-modal input pipeline: CSV-driven dataset, host decode workers, and a
device-prefetching batcher.

Behavioral equivalent of the reference's ``Dataset_Step1``/``Dataset_Step23``
+ DataLoader stack (reference dataset.py:106-245, main_pretraining.py:120-129)
with the work split TPU-first:
  * host: JPEG/WAV decode, resample, audio augmentation (phase vocoder is
    host-only in the reference too), template/caption tokenization;
  * device (inside the jitted step): image augmentation chain and the log-mel
    fbank — the heavy, fusable math.

A synthetic dataset stands in for the missing VGGSound CSVs (the reference
repo ships none — SURVEY "missing artifacts"), so every CLI is runnable
end-to-end in any environment.
"""

from __future__ import annotations

import os
import queue
import random as pyrandom
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Dict, Iterator, Optional

import numpy as np

from synergy_tpu.data.templates import TEMPLATES

IMAGE_SIZE = 224
# 400 + 1023*160 samples (~10.25 s @ 16 kHz) -> exactly 1024 fbank frames
WAVE_SAMPLES = 164080


@dataclass
class TriModalSample:
    # (224, 224, 3): uint8 from the file path (PIL's resize output is uint8 —
    # shipping it raw is lossless and 4x fewer H2D bytes than f32/255; the
    # device step divides by 255), float32 in [0, 1] from the synthetic path
    image: np.ndarray
    wave: np.ndarray   # (WAVE_SAMPLES,) float32
    text: str


class CSVTriModalDataset:
    """Rows of (img_path, wav_path, label, caption) — the
    vgg_sound_*_captioned.csv schema (reference dataset.py:118-122)."""

    def __init__(self, csv_path: str, is_captioned: bool = False,
                 augment_audio: bool = True, apply_rate: float = 0.20,
                 seed: int = 0, category_idx=None,
                 category_json: str = "vgg_category.json"):
        import pandas as pd

        self.df = pd.read_csv(csv_path).reset_index(drop=True)
        if category_idx is not None:
            # Dataset_Step23 semantics (reference dataset.py:183-190): select
            # rows whose label is one of the VGGSound categories at these
            # indices into vgg_category.json, then shuffle.
            import json

            with open(category_json) as f:
                cate_tag = list(json.load(f).items())
            cats = {cate_tag[i][0] for i in category_idx}
            self.df = (self.df[self.df.label.isin(cats)]
                       .reset_index(drop=True)
                       .sample(frac=1.0, random_state=seed)
                       .reset_index(drop=True))
        self.is_captioned = is_captioned
        self.augment_audio = augment_audio
        self.apply_rate = apply_rate
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.df)

    def _rngs(self, idx: int):
        """Per-sample rngs keyed on (seed, epoch, idx): __getitem__ runs on a
        thread pool (TriModalLoader), so shared generators would interleave in
        scheduler order — per-sample derivation makes identical-seed runs
        bit-identical regardless of thread timing (the reference gets the
        analogous property from per-worker torch seeding, utils.py:45-51)."""
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, idx]))
        pyrng = pyrandom.Random(f"{self.seed}:{self.epoch}:{idx}")
        return rng, pyrng

    def _text_for(self, row, pyrng: pyrandom.Random) -> str:
        if self.is_captioned:
            return str(row.caption)
        labels = str(row.label).split(",")
        word = pyrng.choice(labels).strip()
        template = pyrng.choice(TEMPLATES)
        return template.format(word)

    def __getitem__(self, idx: int) -> TriModalSample:
        from PIL import Image

        from synergy_tpu.data import audio as A

        rng, pyrng = self._rngs(idx)
        row = self.df.iloc[idx]
        img = Image.open(row.img_path).convert("RGB")
        img = img.resize((IMAGE_SIZE, IMAGE_SIZE), Image.BILINEAR)
        image = np.asarray(img, np.uint8)  # device divides by 255

        from synergy_tpu.runtime import get_audio_frontend

        fe = get_audio_frontend()
        if fe is not None:  # native C++ decode+resample (GIL released)
            wave, sr = fe.read_wav(row.wav_path)
            if sr != A.SAMPLE_RATE:
                wave = fe.resample(wave, sr, A.SAMPLE_RATE)
        else:
            wave, sr = A.read_wav(row.wav_path)
            if sr != A.SAMPLE_RATE:
                wave = A.resample(wave, sr, A.SAMPLE_RATE)
        if self.augment_audio:
            wave = A.audio_augment(wave, apply_rate=self.apply_rate, rng=rng)
        wave = np.asarray(wave, np.float32)
        if len(wave) < WAVE_SAMPLES:
            wave = np.pad(wave, (0, WAVE_SAMPLES - len(wave)))
        else:
            wave = wave[:WAVE_SAMPLES]

        return TriModalSample(image=image, wave=wave,
                              text=self._text_for(row, pyrng))


def synthetic_class_patterns(label_names) -> np.ndarray:
    """(n_classes, 8, 8, 3) float32 color-block pattern per class.

    Keyed by the LABEL NAMES (stable CRC32 of the joined list), so every
    consumer — the pretraining synthetic dataset (class_images mode) and the
    eval fallbacks (eval/data._synthetic_images) — regenerates the identical
    table without sharing state, and two UNRELATED datasets that merely share
    a class count get independent visual worlds. This is what makes synthetic
    zero-shot TRANSFER testable: stage-1 pretraining and the ZS eval sets see
    the same visual world iff they name the same classes."""
    import zlib

    names = list(label_names)
    key = zlib.crc32("\n".join(str(n) for n in names).encode("utf-8"))
    rng = np.random.default_rng(np.random.SeedSequence([len(names), key]))
    return rng.random((len(names), 8, 8, 3)).astype(np.float32)


def synthetic_class_tone(cls: int) -> float:
    """Per-class pure-tone frequency (Hz), shared with eval/data."""
    return 150.0 + 60.0 * cls


class SyntheticTriModalDataset:
    """Deterministic synthetic triplets (structured noise + template text) for
    environments without the VGGSound data.

    ``class_images=False`` (default): each sample gets its OWN random 8x8
    color-block image — instance-level signal, the regime the contrastive
    integration tests train on. ``class_images=True``: images (and tone
    frequencies) come from the split-invariant per-CLASS tables above, so a
    stage-1 checkpoint transfers to the ``synthetic-vgg`` zero-shot sets."""

    LABELS = [
        "dog barking", "playing violin", "church bells", "rain",
        "sea waves", "fireworks", "driving motorcycle", "cat purring",
    ]

    def __init__(self, size: int = 512, is_captioned: bool = False, seed: int = 0,
                 class_images: bool = False):
        self.size = size
        self.is_captioned = is_captioned
        self.seed = seed
        self.class_images = class_images
        # built once: regenerating the table per __getitem__ cost a fresh
        # RNG + (n, 8, 8, 3) draw in the host loader hot path
        self._patterns = (synthetic_class_patterns(self.LABELS)
                          if class_images else None)

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, idx: int) -> TriModalSample:
        rng = np.random.default_rng(self.seed * 100003 + idx)
        cls = idx % len(self.LABELS)
        label = self.LABELS[cls]
        # class-correlated image and tone so contrastive losses can move
        if self.class_images:
            base = self._patterns[cls]
            base = np.clip(
                base + 0.1 * rng.standard_normal((8, 8, 3)).astype(np.float32),
                0.0, 1.0)
            freq = synthetic_class_tone(cls)
        else:
            base = rng.random((8, 8, 3)).astype(np.float32)
            freq = 200.0 + 50.0 * cls
        image = np.kron(base, np.ones((28, 28, 1), np.float32))
        t = np.arange(WAVE_SAMPLES, dtype=np.float32) / 16000.0
        wave = 0.1 * np.sin(2 * np.pi * freq * t).astype(np.float32)
        wave += 0.01 * rng.standard_normal(WAVE_SAMPLES).astype(np.float32)
        if self.is_captioned:
            text = f"a recording of {label} in the wild"
        else:
            template = TEMPLATES[idx % len(TEMPLATES)]
            text = template.format(label)
        return TriModalSample(image=image, wave=wave, text=text)


class TriModalLoader:
    """Shuffling, multi-worker batch loader producing numpy dicts.

    Output batch (host side): pixel_rgb (B,224,224,3) uint8 or [0,1] f32, wave (B,N),
    input_ids/attention_mask (B,L). The device step turns pixel_rgb into
    augmented normalized pixel_values and wave into the fbank.
    """

    def __init__(self, dataset, tokenizer, batch_size: int,
                 seq_max_length: int = 32, shuffle: bool = True,
                 seed: int = 0, num_workers: Optional[int] = None,
                 drop_last: bool = True, shard: tuple = (0, 1),
                 wave_dtype: str = "float32"):
        self.ds = dataset
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.seq_max_length = seq_max_length
        self.shuffle = shuffle
        self.seed = seed
        if num_workers is None:
            # cap at the visible cores: oversubscribing a small host measures
            # 30% SLOWER (GIL + scheduler churn, tools/bench_pipeline.py);
            # a real multi-core loader host still gets the full pool
            cores = len(os.sched_getaffinity(0)) if hasattr(
                os, "sched_getaffinity") else (os.cpu_count() or 1)
            num_workers = max(1, min(8, cores))
        self.num_workers = num_workers
        self.drop_last = drop_last
        # (process_index, process_count): every process shuffles the full
        # index list with the shared seed, then takes a strided slice — the
        # reference's DistributedSampler semantics (main_pretraining.py:124-128)
        if shard[1] > 1 and not drop_last:
            # The strided slice gives processes ceil-vs-floor item counts and
            # __len__ floors; uneven batch counts would desync shard_batch
            # across processes (DistributedSampler instead pads — we require
            # drop_last, which every multi-process CLI already uses).
            raise ValueError("shard[1] > 1 requires drop_last=True")
        self.shard = shard
        # "int16": ship the wave as PCM (the serving wire format) — halves
        # the batch's biggest buffer (23 MB f32 at batch 35); the device
        # dequantizes by /32768. OPT-IN: quantization adds ~3e-5 absolute
        # error to the augmented wave (the sources are 16-bit at origin,
        # but augmentation/resampling outputs are continuous), so the
        # default stays float32 = the reference's numerics exactly.
        if wave_dtype not in ("float32", "int16"):
            raise ValueError(f"wave_dtype {wave_dtype!r}")
        self.wave_dtype = wave_dtype
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.ds, "set_epoch"):
            self.ds.set_epoch(epoch)

    def __len__(self) -> int:
        local = len(self.ds) // self.shard[1]
        n = local // self.batch_size
        if not self.drop_last and local % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        order = order[self.shard[0]:: self.shard[1]]
        if self.drop_last:
            order = order[: len(self) * self.batch_size]

        def load(idx):
            return self.ds[int(idx)]

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for start in range(0, len(order), self.batch_size):
                chunk = order[start: start + self.batch_size]
                if self.drop_last and len(chunk) < self.batch_size:
                    break
                samples = list(pool.map(load, chunk))
                toks = self.tokenizer([s.text for s in samples],
                                      max_length=self.seq_max_length)
                wave = np.stack([s.wave for s in samples])
                if self.wave_dtype == "int16":
                    wave = np.clip(wave * 32768.0, -32768, 32767
                                   ).astype(np.int16)
                yield {
                    "pixel_rgb": np.stack([s.image for s in samples]),
                    "wave": wave,
                    "input_ids": toks["input_ids"],
                    "attention_mask": toks["attention_mask"],
                }


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Background-thread prefetch so host decode overlaps device compute."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item


def make_synthetic_vocab(directory: str) -> tuple:
    """Train a small byte-level BPE over the template corpus so the tokenizer
    stack is exercised even without the roberta-base vocab files. Falls back
    to a bytes-only vocab if the HF trainer is unavailable."""
    os.makedirs(directory, exist_ok=True)
    vocab_path = os.path.join(directory, "vocab.json")
    merges_path = os.path.join(directory, "merges.txt")
    if os.path.exists(vocab_path) and os.path.exists(merges_path):
        return vocab_path, merges_path
    corpus = [t.format(l) for t in TEMPLATES
              for l in SyntheticTriModalDataset.LABELS]
    try:
        from tokenizers import ByteLevelBPETokenizer as HFTrainer

        corpus_path = os.path.join(directory, "corpus.txt")
        with open(corpus_path, "w") as f:
            f.write("\n".join(corpus))
        trainer = HFTrainer()
        trainer.train([corpus_path], vocab_size=2000, min_frequency=1,
                      special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"])
        trainer.save_model(directory)
    except ImportError:
        import json

        from synergy_tpu.data.tokenizer.bpe_py import bytes_to_unicode

        vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
        for ch in sorted(set(bytes_to_unicode().values())):
            vocab[ch] = len(vocab)
        with open(vocab_path, "w") as f:
            json.dump(vocab, f)
        with open(merges_path, "w") as f:
            f.write("#version: 0.2\n")
    return vocab_path, merges_path


def get_tokenizer(vocab_dir: Optional[str] = None):
    """Real roberta-base vocab if present (vocab.json/merges.txt in
    ``vocab_dir``), else the synthetic trained vocab."""
    from synergy_tpu.data.tokenizer import ByteLevelBPETokenizer

    if vocab_dir and os.path.exists(os.path.join(vocab_dir, "vocab.json")):
        return ByteLevelBPETokenizer(
            os.path.join(vocab_dir, "vocab.json"),
            os.path.join(vocab_dir, "merges.txt"))
    cache = os.path.join(os.path.expanduser("~"), ".cache", "synergy_tpu", "bpe")
    vocab_path, merges_path = make_synthetic_vocab(cache)
    return ByteLevelBPETokenizer(vocab_path, merges_path)
