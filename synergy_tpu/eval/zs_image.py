"""Zero-shot image classification CLI.

Counterpart of ``python ZS/ZS_image_task.py --SEED --IS_BASE --IS_CAPTIONED
--DATASET`` (reference ZS/ZS_image_task.py:1512-1531): prompt
'this is a photo of {}' over the class table, 128 random test samples,
top-1/top-5 into ZS_IMG.json.
"""

from __future__ import annotations

import argparse

import numpy as np

from synergy_tpu.data.pipeline import get_tokenizer
from synergy_tpu.data.templates import ZS_IMAGE_PROMPT
from synergy_tpu.eval import metrics_io
from synergy_tpu.eval.data import canonical_dataset_name, load_image_dataset
from synergy_tpu.eval.labels import clean_label
from synergy_tpu.eval.zs_common import (
    build_tri_clip, encode_prompts, preprocess_images, topk_from_scores,
    zs_image_scores,
)
from synergy_tpu.train.checkpoint import size_tag
from synergy_tpu.utils import enable_compilation_cache, set_seed, str2bool


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Zero-shot image classification")
    p.add_argument("--SEED", type=int, default=17)
    p.add_argument("--IS_BASE", type=str2bool, default=True)
    p.add_argument("--IS_CAPTIONED", type=str2bool, default=False)
    p.add_argument("--DATASET", type=canonical_dataset_name,
                   default="cifar-10",
                   choices=["cifar-10", "cifar-100", "pets", "flowers",
                            "imagenet", "synthetic-vgg"])
    p.add_argument("--try_num", type=int, default=128)  # ZS protocol
    p.add_argument("--ckpt_dir", type=str, default="synergy_ckpt")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--vocab_dir", type=str, default=None)
    p.add_argument("--metric_path", type=str,
                   default=metrics_io.METRIC_FILES["zs_image"])
    p.add_argument("--tiny", type=str2bool, default=False)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    enable_compilation_cache()
    set_seed(args.SEED)
    model, params, weights_prov = build_tri_clip(args)
    cfg = model.config
    tokenizer = get_tokenizer(args.vocab_dir)

    ds = load_image_dataset(args.DATASET, args.data_root, seed=args.SEED)
    prompts = [ZS_IMAGE_PROMPT.format(clean_label(l)) for l in ds.label_names]
    text_embeds = encode_prompts(model, params, tokenizer, prompts)

    rng = np.random.default_rng(args.SEED)
    idx = rng.integers(0, len(ds.labels), args.try_num)
    pixel = preprocess_images(ds.images[idx], cfg.vision.image_size)
    scores = zs_image_scores(model, params, pixel, text_embeds)
    metrics = topk_from_scores(scores, ds.labels[idx])
    print(f"[zs_image] {args.DATASET} top1={metrics['top1']:.2f} "
          f"top5={metrics['top5']:.2f}"
          + (" (synthetic data)" if ds.synthetic else ""))

    metrics_io.save_metric(
        args.metric_path, size_tag(args.IS_BASE, args.IS_CAPTIONED),
        args.DATASET, args.SEED, metrics,
        provenance=f"weights={weights_prov}; "
                   f"data={'synthetic' if ds.synthetic else 'real'}")
    return metrics


if __name__ == "__main__":
    main()
