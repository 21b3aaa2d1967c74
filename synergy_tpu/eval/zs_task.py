"""Combined zero-shot evaluation CLI.

Counterpart of ``python ZS/ZS_task.py --SEED --IS_BASE --IS_CAPTIONED
--DATASET {cifar-10,cifar-100,esc50,urbansound8k} --MM {IT,TA} [--FOLD]``
(reference ZS/ZS_task.py:259-396): one entry point that dispatches to the
image (IT) or audio (TA) protocol and accumulates into ZS_OUR.json.
"""

from __future__ import annotations

import argparse

from synergy_tpu.eval import metrics_io, zs_audio, zs_image
from synergy_tpu.utils import enable_compilation_cache, str2bool


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Combined zero-shot evaluation")
    p.add_argument("--SEED", type=int, default=17)
    p.add_argument("--IS_BASE", type=str2bool, default=True)
    p.add_argument("--IS_CAPTIONED", type=str2bool, default=False)
    p.add_argument("--DATASET", type=str, default="cifar-10",
                   choices=["cifar-10", "cifar-100", "esc50", "urbansound8k",
                            "synthetic-vgg"],
                   help="reference keys (ZS/ZS_task.py:379-396) plus our "
                        "synthetic-vgg world — the only set a checkpoint "
                        "pretrained in this data-blocked environment can "
                        "score above chance on")
    p.add_argument("--MM", type=str, default=None, choices=["IT", "TA"],
                   help="defaults to IT for image sets, TA for audio sets; "
                        "synthetic-vgg supports both")
    p.add_argument("--FOLD", type=int, default=None)
    p.add_argument("--try_num", type=int, default=128)
    p.add_argument("--ckpt_dir", type=str, default="synergy_ckpt")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--vocab_dir", type=str, default=None)
    p.add_argument("--tiny", type=str2bool, default=False)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    enable_compilation_cache()
    is_audio = args.DATASET in ("esc50", "urbansound8k")
    mm = args.MM or ("TA" if is_audio else "IT")
    if args.DATASET == "synthetic-vgg":
        is_audio = mm == "TA"  # the synthetic world carries both modalities
    sub_argv = [
        "--SEED", str(args.SEED), "--IS_BASE", str(args.IS_BASE),
        "--IS_CAPTIONED", str(args.IS_CAPTIONED), "--DATASET", args.DATASET,
        "--try_num", str(args.try_num), "--ckpt_dir", args.ckpt_dir,
        "--data_root", args.data_root, "--tiny", str(args.tiny),
        "--metric_path", metrics_io.METRIC_FILES["zs_combined"],
    ]
    if args.vocab_dir:
        sub_argv += ["--vocab_dir", args.vocab_dir]
    if mm == "TA":
        if not is_audio:
            raise ValueError("--MM TA requires an audio dataset")
        if args.FOLD is not None:
            sub_argv += ["--FOLD", str(args.FOLD)]
        return zs_audio.main(sub_argv)
    if is_audio:
        raise ValueError("--MM IT requires an image dataset")
    return zs_image.main(sub_argv)


if __name__ == "__main__":
    main()
