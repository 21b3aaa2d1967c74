"""Image fine-tune evaluation CLI.

Counterpart of ``python DT/FT_image_task.py --SEED --IS_BASE --IS_CAPTIONED
--DATASET --EPOCHS --LR --BATCH_SIZE`` (reference DT/FT_image_task.py:359-407):
exported vision tower + stage-1 projection head + fresh linear classifier
(:111-127), fine-tuned with grad accumulation (:290-312), accuracy into
METRIC_IMG.json (:337-357). Datasets: CIFAR-10/100, Flowers-102, Pets,
ImageNet (local data or synthetic fallback — see eval/data.py).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from synergy_tpu.configs import CLIPConfig
from synergy_tpu.data.image import normalize, resize, train_transform
from synergy_tpu.eval import metrics_io
from synergy_tpu.eval.common import (
    VisionClassifier, finetune_classifier, init_from_export,
)
from synergy_tpu.eval.data import load_image_dataset
from synergy_tpu.train.checkpoint import size_tag
from synergy_tpu.utils import set_seed, str2bool


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Image fine-tune evaluation")
    p.add_argument("--SEED", type=int, default=17)
    p.add_argument("--IS_BASE", type=str2bool, default=True)
    p.add_argument("--IS_CAPTIONED", type=str2bool, default=False)
    p.add_argument("--DATASET", type=str, default="cifar-10",
                   choices=["cifar-10", "cifar-100", "pets", "flowers",
                            "imagenet"])
    p.add_argument("--EPOCHS", type=int, default=3)
    p.add_argument("--LR", type=float, default=1e-4)
    p.add_argument("--BATCH_SIZE", type=int, default=32)
    p.add_argument("--accum_steps", type=int, default=1)
    p.add_argument("--ckpt_dir", type=str, default="synergy_ckpt")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--metric_path", type=str,
                   default=metrics_io.METRIC_FILES["ft_image"])
    p.add_argument("--tiny", type=str2bool, default=False)
    p.add_argument("--max_train", type=int, default=None,
                   help="subsample the train split (smoke tests)")
    p.add_argument("--augment", type=str2bool, default=True,
                   help="train-time augmentation chain (the reference "
                        "augments per dataset, DT/FT_image_task.py:129-288)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    set_seed(args.SEED)
    cfg = CLIPConfig.tiny() if args.tiny else (
        CLIPConfig.base() if args.IS_BASE else CLIPConfig.large())

    train = load_image_dataset(args.DATASET, args.data_root, "train",
                               seed=args.SEED)
    test = load_image_dataset(args.DATASET, args.data_root, "test",
                              seed=args.SEED + 1)
    if args.max_train:
        train.images = train.images[: args.max_train]
        train.labels = train.labels[: args.max_train]

    model = VisionClassifier(cfg.vision, len(train.label_names),
                             cfg.projection_dim)
    size = cfg.vision.image_size
    sample = jnp.zeros((1, 3, size, size))
    params = model.init(jax.random.PRNGKey(args.SEED), sample)["params"]
    tag = size_tag(args.IS_BASE, args.IS_CAPTIONED)
    params = init_from_export(params, args.ckpt_dir, tag, "vision")

    def preprocess(arrays, key):
        imgs = arrays[0].astype(jnp.float32) / 255.0
        if key is not None and args.augment:
            keys = jax.random.split(key, imgs.shape[0])
            if imgs.shape[1] != size:
                imgs = jax.vmap(lambda im: resize(im, (size, size)))(imgs)
            return (jax.vmap(lambda k, im: train_transform(k, im, size))(
                keys, imgs),)
        imgs = jax.vmap(lambda im: resize(im, (size, size)))(imgs)
        return (jnp.transpose(normalize(imgs), (0, 3, 1, 2)),)

    metrics = finetune_classifier(
        model, params,
        (train.images,), train.labels, (test.images,), test.labels,
        epochs=args.EPOCHS, batch_size=args.BATCH_SIZE, lr=args.LR,
        accum_steps=args.accum_steps, seed=args.SEED,
        preprocess_fn=preprocess, log_prefix=f"[ft_image:{args.DATASET}]")
    acc = metrics["accuracy"]
    print(f"[ft_image] {args.DATASET} accuracy={acc:.2f}"
          + (" (synthetic data)" if train.synthetic else ""))
    metrics_io.save_metric(args.metric_path, tag, args.DATASET, args.SEED,
                           {"accuracy": acc})
    return metrics


if __name__ == "__main__":
    main()
