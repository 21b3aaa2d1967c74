"""Zero-shot audio classification CLI.

Counterpart of ``python ZS/ZS_audio_task.py --SEED --IS_BASE --IS_CAPTIONED
--DATASET [--FOLD]`` (reference ZS/ZS_audio_task.py:180-227): prompt
'this is a sound of {}', audio-text similarity via the TA head, 128 random
samples, top-1/top-5 into ZS_AUD.json.
"""

from __future__ import annotations

import argparse

import numpy as np

from synergy_tpu.data.pipeline import get_tokenizer
from synergy_tpu.data.templates import ZS_AUDIO_PROMPT
from synergy_tpu.eval import metrics_io
from synergy_tpu.eval.data import load_audio_dataset
from synergy_tpu.eval.labels import clean_label
from synergy_tpu.eval.zs_common import (
    build_tri_clip, encode_prompts, prepare_fbanks, topk_from_scores,
    zs_audio_scores,
)
from synergy_tpu.train.checkpoint import size_tag
from synergy_tpu.utils import enable_compilation_cache, set_seed, str2bool


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Zero-shot audio classification")
    p.add_argument("--SEED", type=int, default=17)
    p.add_argument("--IS_BASE", type=str2bool, default=True)
    p.add_argument("--IS_CAPTIONED", type=str2bool, default=False)
    p.add_argument("--DATASET", type=str, default="esc50",
                   choices=["esc50", "urbansound8k", "synthetic-vgg"])
    p.add_argument("--FOLD", type=int, default=None)
    p.add_argument("--try_num", type=int, default=128)
    p.add_argument("--ckpt_dir", type=str, default="synergy_ckpt")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--vocab_dir", type=str, default=None)
    p.add_argument("--metric_path", type=str,
                   default=metrics_io.METRIC_FILES["zs_audio"])
    p.add_argument("--tiny", type=str2bool, default=False)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    enable_compilation_cache()
    set_seed(args.SEED)
    model, params, weights_prov = build_tri_clip(args)
    cfg = model.config
    tokenizer = get_tokenizer(args.vocab_dir)

    ds = load_audio_dataset(args.DATASET, args.data_root, seed=args.SEED)
    mask = np.ones(len(ds.labels), bool)
    if args.FOLD is not None:
        mask = ds.folds == args.FOLD
    pool = np.nonzero(mask)[0]
    prompts = [ZS_AUDIO_PROMPT.format(clean_label(l)) for l in ds.label_names]
    text_embeds = encode_prompts(model, params, tokenizer, prompts)

    rng = np.random.default_rng(args.SEED)
    idx = pool[rng.integers(0, len(pool), min(args.try_num, 4 * len(pool)))]
    fbanks = prepare_fbanks([ds.waves[i] for i in idx], cfg)
    scores = zs_audio_scores(model, params, fbanks, text_embeds)
    metrics = topk_from_scores(scores, ds.labels[idx])
    fold_s = f" fold={args.FOLD}" if args.FOLD is not None else ""
    print(f"[zs_audio] {args.DATASET}{fold_s} top1={metrics['top1']:.2f} "
          f"top5={metrics['top5']:.2f}"
          + (" (synthetic data)" if ds.synthetic else ""))

    dataset_key = args.DATASET + (f"_fold{args.FOLD}" if args.FOLD else "")
    metrics_io.save_metric(
        args.metric_path, size_tag(args.IS_BASE, args.IS_CAPTIONED),
        dataset_key, args.SEED, metrics,
        provenance=f"weights={weights_prov}; "
                   f"data={'synthetic' if ds.synthetic else 'real'}")
    return metrics


if __name__ == "__main__":
    main()
