#!/usr/bin/env python
"""One-command reproduction of the reference's published result tables.

The reference records its full run matrices only as docstrings at the bottom
of each eval script (reference DT/FT_image_task.py:408-497,
DT/FT_audio_task.py:330-378, DT/FT_text_task.py:620-786, ZS/ZS_task.py:400-496
and the ZS_image/ZS_audio variants). This tool encodes those matrices
exactly — the same seeds, folds, epochs, learning rates and batch sizes the
paper numbers were produced with — runs this framework's CLIs over them, and
renders README-style mean±std tables from the metric accumulators
(eval/metrics_io.py, the reference's regression-harness contract).

Usage:
  python tools/reproduce_tables.py --dry_run                # print the plan
  python tools/reproduce_tables.py --families ft_image --sizes base
  python tools/reproduce_tables.py --report_only --out results.md
  python tools/reproduce_tables.py --tiny --limit 1         # smoke

One deliberate deviation, documented: the reference's Large GLUE docstring
lists a single seed for mnlim/mnlimm/qnli/qqp (the rest of the 3-seed matrix
ran on GPUs whose command lines were not committed); we run the same 3-seed
sets as Base so every published mean±std has the same sample size.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# --- the reference's run matrices, verbatim -------------------------------

IMG_SEEDS = {"cifar-10": (17, 42, 77), "cifar-100": (18, 43, 78),
             "flowers": (19, 44, 79), "pets": (28, 53, 88),
             "imagenet": (29, 54, 89)}
# (epochs, lr, batch) per dataset; reference DT/FT_image_task.py:408-497
IMG_CFG = {
    ("base", True): {"cifar-10": (5, 2e-5, 256), "cifar-100": (7, 2e-5, 256),
                     "flowers": (25, 2e-5, 256), "pets": (20, 2e-5, 256),
                     "imagenet": (10, 2e-5, 256)},
    ("base", False): {"cifar-10": (5, 2e-5, 256), "cifar-100": (7, 2e-5, 256),
                      "flowers": (25, 3e-5, 256), "pets": (20, 2e-5, 256),
                      "imagenet": (10, 1e-4, 256)},
    ("large", True): {"cifar-10": (1, 2e-5, 64), "cifar-100": (3, 2e-5, 64),
                      "flowers": (7, 2e-5, 64), "pets": (5, 2e-5, 64),
                      "imagenet": (10, 2e-5, 64)},
    ("large", False): {"cifar-10": (1, 2e-5, 64), "cifar-100": (3, 2e-5, 64),
                       "flowers": (7, 2e-5, 64), "pets": (5, 2e-5, 64),
                       "imagenet": (10, 2e-5, 64)},
}

# audio: one seed, all folds (reference FT_audio_task.py:330-378)
AUD_FOLDS = {"esc50": (17, range(1, 6)), "urbansound8k": (77, range(1, 11))}
AUD_CFG = {
    ("base", True): {"esc50": (12, 2e-5, 40), "urbansound8k": (10, 5e-6, 44)},
    ("base", False): {"esc50": (12, 2e-5, 44), "urbansound8k": (8, 5e-6, 44)},
    ("large", True): {"esc50": (12, 2e-5, 26), "urbansound8k": (8, 3e-6, 26)},
    ("large", False): {"esc50": (12, 2e-5, 26), "urbansound8k": (8, 3e-6, 26)},
}

TXT_SEEDS = {"mnlim": (17, 42, 77), "mnlimm": (17, 42, 77),
             "qnli": (18, 43, 78), "qqp": (19, 44, 79), "rte": (27, 52, 87),
             "sst2": (28, 53, 88), "mrpc": (29, 54, 89), "cola": (37, 62, 97)}
_TXT_EPOCHS = {"mnlim": 5, "mnlimm": 5, "qnli": 4, "qqp": 5, "rte": 15,
               "sst2": 4, "mrpc": 10, "cola": 3}
_TXT_BS_BASE = {"mnlim": 320, "mnlimm": 320, "qnli": 320, "qqp": 384,
                "rte": 384, "sst2": 512, "mrpc": 384, "cola": 704}
_TXT_BS_LARGE = {"mnlim": 108, "mnlimm": 108, "qnli": 108, "qqp": 145,
                 "rte": 160, "sst2": 200, "mrpc": 140, "cola": 320}


def _txt_cfg(size: str, captioned: bool, task: str):
    epochs = _TXT_EPOCHS[task]
    if size == "base" and captioned:
        lr = 3e-5 if task in ("mnlim", "mnlimm", "qnli", "rte", "mrpc") else 2e-5
        return epochs, lr, _TXT_BS_BASE[task]
    if size == "base":  # prompt: all 2e-5; qnli batch drops to 256
        bs = 256 if task == "qnli" else _TXT_BS_BASE[task]
        return epochs, 2e-5, bs
    return epochs, 2e-5, _TXT_BS_LARGE[task]


# ZS seed blocks per (size, captioned) — reference ZS_task.py:400-496
ZS_SEEDS = {("base", True): (7, 8, 9), ("large", True): (11, 12, 13),
            ("base", False): (25, 26, 27), ("large", False): (49, 50, 51)}


def build_plan(families, sizes, captioned_opts, limit=None):
    """Yield (family, args_list) in the reference's run order."""
    plan = []
    for size in sizes:
        is_base = size == "base"
        for cap in captioned_opts:
            common = ["--IS_BASE", str(is_base), "--IS_CAPTIONED", str(cap)]
            if "ft_image" in families:
                for ds, (ep, lr, bs) in IMG_CFG[(size, cap)].items():
                    for seed in IMG_SEEDS[ds]:
                        plan.append(("ft_image", common + [
                            "--SEED", str(seed), "--DATASET", ds,
                            "--EPOCHS", str(ep), "--LR", repr(lr),
                            "--BATCH_SIZE", str(bs)]))
            if "ft_audio" in families:
                for ds, (ep, lr, bs) in AUD_CFG[(size, cap)].items():
                    seed, folds = AUD_FOLDS[ds]
                    for fold in folds:
                        plan.append(("ft_audio", common + [
                            "--SEED", str(seed), "--FOLD", str(fold),
                            "--DATASET", ds, "--EPOCHS", str(ep),
                            "--LR", repr(lr), "--BATCH_SIZE", str(bs)]))
            if "ft_text" in families:
                for task, seeds in TXT_SEEDS.items():
                    ep, lr, bs = _txt_cfg(size, cap, task)
                    for seed in seeds:
                        plan.append(("ft_text", common + [
                            "--SEED", str(seed), "--DATASET", task,
                            "--EPOCHS", str(ep), "--LR", repr(lr),
                            "--BATCH_SIZE", str(bs)]))
            if "zs_image" in families:
                for ds in ("cifar-10", "cifar-100"):
                    for seed in ZS_SEEDS[(size, cap)]:
                        plan.append(("zs_image", common + [
                            "--SEED", str(seed), "--DATASET", ds]))
            if "zs_audio" in families:
                for ds, (seed, folds) in AUD_FOLDS.items():
                    for fold in folds:
                        plan.append(("zs_audio", common + [
                            "--SEED", str(seed), "--FOLD", str(fold),
                            "--DATASET", ds]))
            if "zs_task" in families:
                for ds, mm in (("cifar-10", "IT"), ("cifar-100", "IT"),
                               ("esc50", "TA"), ("urbansound8k", "TA")):
                    for seed in ZS_SEEDS[(size, cap)]:
                        plan.append(("zs_task", common + [
                            "--SEED", str(seed), "--DATASET", ds,
                            "--MM", mm]))
    return plan[:limit] if limit else plan


# --- rendering -------------------------------------------------------------

_HEADLINE = {"ft_image": ("METRIC_IMG.json", "accuracy"),
             "ft_audio": ("METRIC_AUD.json", "accuracy"),
             "ft_text": ("METRIC_TXT.json", None),  # per-task primary metric
             "zs_image": ("ZS_IMG.json", "top1"),
             "zs_audio": ("ZS_AUD.json", "top1"),
             "zs_task": ("ZS_OUR.json", "top1")}
_VARIANTS = ["base_prompt", "base_caption", "large_prompt", "large_caption"]


def _fmt(entry, metric):
    if metric is None:  # first metric in insertion order (task-specific)
        metric = next(iter(entry["scores"]))
    slot = entry["scores"].get(metric)
    if not slot:
        return "—"
    return f"{slot['mean']:.2f}±{slot['std']:.2f} (n={len(slot['values'])})"


def render_report(workdir: str) -> str:
    lines = ["# Reproduced result tables",
             "",
             "Mean±std over the reference's exact run matrix "
             "(seeds/folds/epochs/LR/batch; see tools/reproduce_tables.py). "
             "Compare against BASELINE.md.", ""]
    for family, (fname, metric) in _HEADLINE.items():
        path = os.path.join(workdir, fname)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            data = json.load(f)
        datasets = sorted({ds for v in data.values() for ds in v})
        lines += [f"## {family} ({fname})", "",
                  "| dataset | " + " | ".join(_VARIANTS) + " |",
                  "|---|" + "---|" * len(_VARIANTS)]
        for ds in datasets:
            row = [ds]
            for variant in _VARIANTS:
                entry = data.get(variant, {}).get(ds)
                row.append(_fmt(entry, metric) if entry else "—")
            lines.append("| " + " | ".join(row) + " |")
        lines.append("")
    return "\n".join(lines)


def main(argv=None):
    if hasattr(signal, "SIGPIPE"):  # be a good citizen under `| head`
        signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--families", type=str,
                   default="ft_image,ft_audio,ft_text,zs_image,zs_audio,zs_task")
    p.add_argument("--sizes", type=str, default="base,large")
    p.add_argument("--captioned", type=str, default="both",
                   choices=["both", "true", "false"])
    p.add_argument("--workdir", type=str, default="results",
                   help="cwd for the runs; metric JSONs accumulate here")
    p.add_argument("--ckpt_dir", type=str, default="synergy_ckpt")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--vocab_dir", type=str, default=None)
    p.add_argument("--out", type=str, default=None,
                   help="write the rendered markdown report here")
    p.add_argument("--dry_run", action="store_true",
                   help="print the command plan and exit")
    p.add_argument("--report_only", action="store_true",
                   help="skip runs; render tables from existing JSONs")
    p.add_argument("--limit", type=int, default=None,
                   help="run only the first N commands (smoke)")
    p.add_argument("--tiny", action="store_true",
                   help="forward --tiny true to every CLI (smoke)")
    p.add_argument("--keep_going", action="store_true",
                   help="continue past failed runs (reported at the end)")
    args = p.parse_args(argv)

    families = [f.strip() for f in args.families.split(",") if f.strip()]
    unknown = set(families) - set(_HEADLINE)
    if unknown:
        p.error(f"unknown families: {sorted(unknown)}")
    sizes = [s.strip() for s in args.sizes.split(",") if s.strip()]
    caps = {"both": [False, True], "true": [True], "false": [False]}[
        args.captioned]

    plan = build_plan(families, sizes, caps, args.limit)
    if not args.report_only:
        os.makedirs(args.workdir, exist_ok=True)
        failures = []
        for i, (family, cli_args) in enumerate(plan):
            full_args = ["--ckpt_dir", os.path.abspath(args.ckpt_dir)]
            if family != "ft_text":  # GLUE loads from the HF datasets cache
                full_args += ["--data_root", os.path.abspath(args.data_root)]
            if args.vocab_dir and family not in ("ft_image", "ft_audio"):
                full_args += ["--vocab_dir", os.path.abspath(args.vocab_dir)]
            if args.tiny:
                full_args += ["--tiny", "true"]
            full_args += cli_args
            print(f"[{i + 1}/{len(plan)}] synergy_tpu.eval.{family} "
                  f"{' '.join(full_args)}", flush=True)
            if args.dry_run:
                continue
            # sys.path stub, NOT PYTHONPATH: some TPU runtime plugins break
            # under an inherited PYTHONPATH (see tests/conftest.py note)
            stub = (f"import sys; sys.path.insert(0, {REPO!r}); "
                    f"from synergy_tpu.eval.{family} import main; "
                    f"main({full_args!r})")
            rc = subprocess.call([sys.executable, "-c", stub],
                                 cwd=args.workdir)
            if rc != 0:
                failures.append((f"synergy_tpu.eval.{family} "
                                 + " ".join(full_args), rc))
                if not args.keep_going:
                    sys.exit(rc)
        if failures:
            print(f"[reproduce] {len(failures)} runs failed:")
            for failed, rc in failures:
                print(f"  rc={rc}: {failed}")
    if args.dry_run:
        return
    report = render_report(args.workdir)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report + "\n")
        print(f"[reproduce] wrote {args.out}")
    else:
        print(report)


if __name__ == "__main__":
    main()
