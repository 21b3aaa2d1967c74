"""Datasets for the downstream FT/ZS suites.

The reference pulls these from torchvision / HF hubs at runtime
(reference DT/FT_image_task.py:129-288, DT/FT_audio_task.py:51-127); this
environment has no network, so each loader reads the standard on-disk layout
when present and otherwise falls back to a deterministic synthetic set so
every CLI stays runnable end-to-end:

  * cifar-10  : ``{root}/cifar-10-batches-py``  (python pickle batches)
  * cifar-100 : ``{root}/cifar-100-python``
  * esc50     : ``{root}/meta/esc50.csv`` + ``{root}/audio/*.wav`` (5 folds)
  * urbansound8k : ``{root}/metadata/UrbanSound8K.csv`` + ``{root}/audio/fold*/``
  * pets/flowers/imagenet : ``{root}/{name}/{split}/{class_dir}/*.jpg``
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from synergy_tpu.data.pipeline import (
    SyntheticTriModalDataset, synthetic_class_patterns, synthetic_class_tone,
)
from synergy_tpu.eval import labels as L

# The reference spells image dataset names 'CIFAR-10' / 'Flowers-102' /
# 'Pets' / 'ImageNet' (DT/FT_image_task.py:130-245, ZS/ZS_image_task.py:
# 1373-1417); our canonical names are lowercase with 'flowers' unsuffixed.
# Accepting the reference spellings verbatim makes migration copy-paste.
_DATASET_ALIASES = {"flowers-102": "flowers", "oxford-iiit-pets": "pets"}


def canonical_dataset_name(name: str) -> str:
    name = name.lower()
    return _DATASET_ALIASES.get(name, name)


@dataclass
class ImageSet:
    images: np.ndarray   # (N, H, W, 3) uint8
    labels: np.ndarray   # (N,) int
    label_names: List[str]
    synthetic: bool = False


@dataclass
class AudioSet:
    waves: List[np.ndarray]  # 16 kHz float32
    labels: np.ndarray
    folds: np.ndarray
    label_names: List[str]
    synthetic: bool = False


def _synthetic_images(label_names, n=256, size=64, seed=0) -> ImageSet:
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, len(label_names), n)
    # class patterns are a property of the CLASS, not the split: train
    # (seed=S) and test (seed=S+1) must share them or the task is
    # unlearnable by construction (an FT probe would score below chance).
    # The table is the SAME one SyntheticTriModalDataset(class_images=True)
    # trains on, which is what makes synthetic-vgg zero-shot transfer real.
    base = synthetic_class_patterns(label_names)
    reps = size // 8
    imgs = np.stack([
        np.clip(np.kron(base[l], np.ones((reps, reps, 1), np.float32))
                + 0.1 * rng.standard_normal((size, size, 3)), 0, 1)
        for l in labels])
    return ImageSet((imgs * 255).astype(np.uint8), labels.astype(np.int64),
                    list(label_names), synthetic=True)


def _synthetic_audio(label_names, n=200, seconds=2.0, seed=0) -> AudioSet:
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, len(label_names), n)
    t = np.arange(int(16000 * seconds), dtype=np.float32) / 16000.0
    waves = [
        (0.1 * np.sin(2 * np.pi * synthetic_class_tone(l) * t)
         + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        for l in labels]
    folds = (np.arange(n) % 5) + 1
    return AudioSet(waves, labels.astype(np.int64), folds,
                    list(label_names), synthetic=True)


def _load_cifar_pickles(root: str, name: str,
                        split: str = "test") -> Optional[ImageSet]:
    if name == "cifar-10":
        d = os.path.join(root, "cifar-10-batches-py")
        if split == "train":
            files = [os.path.join(d, f"data_batch_{i}") for i in range(1, 6)]
        else:
            files = [os.path.join(d, "test_batch")]
        key = b"labels"
        names = L.CIFAR10
    else:
        d = os.path.join(root, "cifar-100-python")
        files = [os.path.join(d, "train" if split == "train" else "test")]
        key = b"fine_labels"
        names = L.CIFAR100
    if not all(os.path.exists(f) for f in files):
        return None
    imgs, labs = [], []
    for f in files:
        with open(f, "rb") as fh:
            batch = pickle.load(fh, encoding="bytes")
        data = batch[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        imgs.append(data)
        labs.extend(batch[key])
    return ImageSet(np.concatenate(imgs), np.asarray(labs, np.int64), names)


def _load_imagefolder(root: str, name: str, split: str,
                      names: List[str]) -> Optional[ImageSet]:
    d = os.path.join(root, name, split)
    if not os.path.isdir(d):
        return None
    from PIL import Image

    imgs, labs = [], []
    class_dirs = sorted(os.listdir(d))
    for ci, cd in enumerate(class_dirs):
        cdir = os.path.join(d, cd)
        if not os.path.isdir(cdir):
            continue
        for fn in sorted(os.listdir(cdir)):
            img = Image.open(os.path.join(cdir, fn)).convert("RGB")
            img = img.resize((224, 224), Image.BILINEAR)
            imgs.append(np.asarray(img, np.uint8))
            labs.append(ci)
    if not imgs:
        return None
    label_names = names if len(names) == len(class_dirs) else class_dirs
    return ImageSet(np.stack(imgs), np.asarray(labs, np.int64), label_names)


def load_image_dataset(name: str, root: str = "data",
                       split: str = "test", seed: int = 0) -> ImageSet:
    name = name.lower()
    if name == "synthetic-vgg":
        # The pretraining synthetic world (class_images mode): a held-out
        # draw from the SAME per-class pattern table a stage-1 run trained
        # on, so zero-shot transfer is measurable without VGGSound media.
        return _synthetic_images(SyntheticTriModalDataset.LABELS, seed=seed)
    if name in ("cifar-10", "cifar-100"):
        ds = _load_cifar_pickles(root, name, split)
        if ds is not None:
            return ds
        return _synthetic_images(L.LABELS[name], size=32, seed=seed)
    if name == "imagenet":
        names = L.imagenet_labels(os.path.join(root, "imagenet_labels.json"))
        ds = _load_imagefolder(root, "imagenet", split, names)
        return ds or _synthetic_images(names[:20], seed=seed)
    names = L.LABELS[name]
    ds = _load_imagefolder(root, name, split, names)
    return ds or _synthetic_images(names, seed=seed)


def load_audio_dataset(name: str, root: str = "data", seed: int = 0) -> AudioSet:
    from synergy_tpu.data.audio import read_wav, resample

    name = name.lower()
    if name == "synthetic-vgg":
        return _synthetic_audio(SyntheticTriModalDataset.LABELS, seed=seed)
    if name == "esc50":
        meta = os.path.join(root, "meta", "esc50.csv")
        audio_dir = os.path.join(root, "audio")
        names = L.ESC50
        if os.path.exists(meta):
            import pandas as pd

            df = pd.read_csv(meta)
            waves, labels, folds = [], [], []
            for _, row in df.iterrows():
                wave, sr = read_wav(os.path.join(audio_dir, row["filename"]))
                if sr != 16000:
                    wave = resample(wave, sr, 16000)
                waves.append(wave)
                labels.append(int(row["target"]))
                folds.append(int(row["fold"]))
            return AudioSet(waves, np.asarray(labels), np.asarray(folds), names)
        return _synthetic_audio(names, seed=seed)
    if name == "urbansound8k":
        meta = os.path.join(root, "metadata", "UrbanSound8K.csv")
        names = L.URBANSOUND8K
        if os.path.exists(meta):
            import pandas as pd

            df = pd.read_csv(meta)
            waves, labels, folds = [], [], []
            for _, row in df.iterrows():
                p = os.path.join(root, "audio", f"fold{row['fold']}",
                                 row["slice_file_name"])
                wave, sr = read_wav(p)
                if sr != 16000:
                    wave = resample(wave, sr, 16000)
                waves.append(wave)
                labels.append(int(row["classID"]))
                folds.append(int(row["fold"]))
            return AudioSet(waves, np.asarray(labels), np.asarray(folds), names)
        return _synthetic_audio(names, seed=seed)
    raise ValueError(f"unknown audio dataset {name}")
