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
from synergy_tpu.data.image import (
    CLIP_MEAN, CLIP_STD, IMAGENET_MEAN, IMAGENET_STD,
    ft_eval_transform, ft_train_transform,
)
from synergy_tpu.eval import metrics_io
from synergy_tpu.eval.common import (
    VisionClassifier, finetune_classifier, init_from_export,
)
from synergy_tpu.eval.data import canonical_dataset_name, load_image_dataset
from synergy_tpu.train.checkpoint import size_tag
from synergy_tpu.utils import enable_compilation_cache, set_seed, str2bool

_HALF = ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
_FLOWERS = ((0.507, 0.487, 0.441), (0.267, 0.256, 0.276))

# Per-dataset preprocessing chains, matching the reference's transform blocks
# exactly (DT/FT_image_task.py): train_stats, eval_stats, flip_h_p, flip_v_p,
# jitter strength, jitter apply-p. Quirks are preserved deliberately:
#   * Pets trains with CLIP stats but evaluates with ImageNet stats
#     (FT_image_task.py:234-241 vs :243-247 — the reference really does this);
#   * Flowers uses its own stats and gentler augmentation (:192-209);
#   * ImageNet uses ImageNet stats with jitter p=0.33, s=0.05 (:252-269).
FT_CHAINS = {
    "cifar-10": dict(train_stats=_HALF, eval_stats=_HALF,
                     flip_h_p=0.5, flip_v_p=0.15, jitter=0.075, jitter_p=0.5),
    "cifar-100": dict(train_stats=_HALF, eval_stats=_HALF,
                      flip_h_p=0.5, flip_v_p=0.15, jitter=0.075, jitter_p=0.5),
    "flowers": dict(train_stats=_FLOWERS, eval_stats=_FLOWERS,
                    flip_h_p=0.25, flip_v_p=0.05, jitter=0.05, jitter_p=0.25),
    "pets": dict(train_stats=(CLIP_MEAN, CLIP_STD),
                 eval_stats=(IMAGENET_MEAN, IMAGENET_STD),
                 flip_h_p=0.5, flip_v_p=0.15, jitter=0.075, jitter_p=0.5),
    "imagenet": dict(train_stats=(IMAGENET_MEAN, IMAGENET_STD),
                     eval_stats=(IMAGENET_MEAN, IMAGENET_STD),
                     flip_h_p=0.5, flip_v_p=0.15, jitter=0.05, jitter_p=0.33),
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Image fine-tune evaluation")
    p.add_argument("--SEED", type=int, default=17)
    p.add_argument("--IS_BASE", type=str2bool, default=True)
    p.add_argument("--IS_CAPTIONED", type=str2bool, default=False)
    p.add_argument("--DATASET", type=canonical_dataset_name,
                   default="cifar-10",
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
    enable_compilation_cache()
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
    params = jax.jit(model.init)(jax.random.PRNGKey(args.SEED), sample)["params"]
    tag = size_tag(args.IS_BASE, args.IS_CAPTIONED)
    params, weights_prov = init_from_export(params, args.ckpt_dir, tag,
                                            "vision")

    chain = FT_CHAINS[args.DATASET]

    def preprocess(arrays, key):
        imgs = arrays[0].astype(jnp.float32) / 255.0
        if key is not None and args.augment:
            keys = jax.random.split(key, imgs.shape[0])
            mean, std = chain["train_stats"]
            return (jax.vmap(lambda k, im: ft_train_transform(
                k, im, size, mean, std, chain["flip_h_p"], chain["flip_v_p"],
                chain["jitter"], chain["jitter_p"]))(keys, imgs),)
        mean, std = chain["eval_stats"]
        return (jax.vmap(lambda im: ft_eval_transform(im, size, mean, std))(
            imgs),)

    metrics = finetune_classifier(
        model, params,
        (train.images,), train.labels, (test.images,), test.labels,
        epochs=args.EPOCHS, batch_size=args.BATCH_SIZE, lr=args.LR,
        accum_steps=args.accum_steps, seed=args.SEED,
        preprocess_fn=preprocess, log_prefix=f"[ft_image:{args.DATASET}]")
    acc = metrics["accuracy"]
    print(f"[ft_image] {args.DATASET} accuracy={acc:.2f}"
          + (" (synthetic data)" if train.synthetic else ""))
    metrics_io.save_metric(
        args.metric_path, tag, args.DATASET, args.SEED, {"accuracy": acc},
        provenance=f"weights={weights_prov}; "
                   f"data={'synthetic' if train.synthetic else 'real'}")
    return metrics


if __name__ == "__main__":
    main()
