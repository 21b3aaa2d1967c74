"""Text (GLUE) fine-tune evaluation CLI.

Counterpart of ``python DT/FT_text_task.py --SEED --IS_BASE --IS_CAPTIONED
--DATASET --EPOCHS --LR --BATCH_SIZE`` (reference DT/FT_text_task.py:108-618).
The reference delegates each GLUE task to the HF Trainer; here each task runs
through one plain jitted loop (eval/common.finetune_classifier) over a
RobertaClassificationHead-style model built from the exported text tower.

GLUE data loads via HF ``datasets`` when available locally; otherwise a
deterministic synthetic text-classification task keeps the CLI runnable.
Task metrics match the reference's compute_metrics blocks: accuracy; +F1 for
MRPC/QQP; Matthews for CoLA; Pearson/Spearman for STS-B.
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from synergy_tpu.configs import CLIPConfig
from synergy_tpu.eval import metrics_io
from synergy_tpu.eval.common import (
    TextClassifier, finetune_classifier, init_from_export,
)
from synergy_tpu.data.pipeline import get_tokenizer
from synergy_tpu.train.checkpoint import size_tag
from synergy_tpu.utils import enable_compilation_cache, set_seed, str2bool

# task -> (sentence keys, num labels) (reference DT/FT_text_task.py per-task
# blocks; 'stsb' is a regression task)
GLUE_TASKS: Dict[str, Tuple[Tuple[str, ...], int]] = {
    "cola": (("sentence",), 2),
    "sst2": (("sentence",), 2),
    "mrpc": (("sentence1", "sentence2"), 2),
    "qqp": (("question1", "question2"), 2),
    "stsb": (("sentence1", "sentence2"), 1),
    # MNLI matched / mismatched are two first-class datasets in the reference
    # (DT/FT_text_task.py:109-137: 'mnlim' -> validation_matched, 'mnlimm' ->
    # validation_mismatched, both over the glue 'mnli' train split); 'mnli'
    # is kept as an alias for the matched variant.
    "mnli": (("premise", "hypothesis"), 3),
    "mnlim": (("premise", "hypothesis"), 3),
    "mnlimm": (("premise", "hypothesis"), 3),
    "qnli": (("question", "sentence"), 2),
    "rte": (("sentence1", "sentence2"), 2),
    "wnli": (("sentence1", "sentence2"), 2),
}

# Reference per-task max_length (DT/FT_text_task.py:113-240: MNLI-M/MM and
# QNLI use 128+32=160; QQP/MRPC/STS-B/RTE/WNLI 128; SST-2 96; CoLA 64).
TASK_MAX_LENGTH: Dict[str, int] = {
    "mnli": 160, "mnlim": 160, "mnlimm": 160, "qnli": 160,
    "qqp": 128, "mrpc": 128, "stsb": 128, "rte": 128, "wnli": 128,
    "sst2": 96, "cola": 64,
}


def f1_score(preds: np.ndarray, labels: np.ndarray) -> float:
    tp = float(((preds == 1) & (labels == 1)).sum())
    fp = float(((preds == 1) & (labels == 0)).sum())
    fn = float(((preds == 0) & (labels == 1)).sum())
    denom = 2 * tp + fp + fn
    return (2 * tp / denom * 100.0) if denom else 0.0


def matthews_corr(preds: np.ndarray, labels: np.ndarray) -> float:
    tp = float(((preds == 1) & (labels == 1)).sum())
    tn = float(((preds == 0) & (labels == 0)).sum())
    fp = float(((preds == 1) & (labels == 0)).sum())
    fn = float(((preds == 0) & (labels == 1)).sum())
    denom = np.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return float((tp * tn - fp * fn) / denom * 100.0) if denom else 0.0


def pearson_spearman(preds: np.ndarray, labels: np.ndarray) -> Tuple[float, float]:
    def corr(a, b):
        a = a - a.mean(); b = b - b.mean()
        d = np.sqrt((a * a).sum() * (b * b).sum())
        return float((a * b).sum() / d * 100.0) if d else 0.0

    ranks = lambda x: np.argsort(np.argsort(x)).astype(np.float64)
    return corr(preds, labels), corr(ranks(preds), ranks(labels))


def load_glue(task: str, seed: int):
    """Returns (train, test, synthetic) where each split is
    ``(texts, pair_texts_or_None, labels)``. Sentence pairs stay separate so
    the tokenizer can apply the reference's HF two-sequence encoding
    ``<s> A </s></s> B </s>`` (DT/FT_text_task.py:113-240), not joined text."""
    keys, _ = GLUE_TASKS[task]
    try:
        from datasets import load_dataset

        hf_task = "mnli" if task.startswith("mnli") else task
        ds = load_dataset("glue", hf_task)
        if task == "mnlimm":
            val_key = "validation_mismatched"
        elif task.startswith("mnli"):
            val_key = "validation_matched"
        else:
            val_key = "validation"

        def pack(split):
            texts = [str(x) for x in split[keys[0]]]
            pairs = [str(x) for x in split[keys[1]]] if len(keys) > 1 else None
            labels = np.asarray(split["label"])
            return texts, pairs, labels

        return pack(ds["train"]), pack(ds[val_key]), False
    except Exception:
        rng = np.random.default_rng(seed)
        pos = ["great wonderful amazing", "delightful and moving",
               "a true joy to behold", "superb acting and writing"]
        neg = ["terrible boring awful", "a complete waste of time",
               "dull and uninspired", "clumsy writing and flat acting"]
        n = 128
        labels = rng.integers(0, 2, n)
        texts = [f"{'this is ' + (pos[i % 4] if l else neg[i % 4])} sample {i}"
                 for i, l in enumerate(labels)]
        pairs = ([f"the review was {'positive' if l else 'negative'}"
                  for l in labels] if len(keys) > 1 else None)
        if GLUE_TASKS[task][1] == 1:  # regression surrogate
            labels = labels.astype(np.float32) * 5.0
        half = n // 2
        cut = lambda xs, lo, hi: xs[lo:hi] if xs is not None else None
        return ((texts[:half], cut(pairs, 0, half), labels[:half]),
                (texts[half:], cut(pairs, half, n), labels[half:]), True)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="GLUE fine-tune evaluation")
    p.add_argument("--SEED", type=int, default=17)
    p.add_argument("--IS_BASE", type=str2bool, default=True)
    p.add_argument("--IS_CAPTIONED", type=str2bool, default=False)
    p.add_argument("--DATASET", type=str, default="sst2",
                   choices=sorted(GLUE_TASKS))
    p.add_argument("--EPOCHS", type=int, default=3)
    p.add_argument("--LR", type=float, default=2e-5)
    p.add_argument("--BATCH_SIZE", type=int, default=16)
    p.add_argument("--seq_max_length", type=int, default=None,
                   help="override the reference per-task max_length "
                        "(MNLI/QNLI 160, QQP/MRPC/STS-B/RTE/WNLI 128, "
                        "SST-2 96, CoLA 64)")
    p.add_argument("--ckpt_dir", type=str, default="synergy_ckpt")
    p.add_argument("--vocab_dir", type=str, default=None)
    p.add_argument("--metric_path", type=str,
                   default=metrics_io.METRIC_FILES["ft_text"])
    p.add_argument("--tiny", type=str2bool, default=False)
    p.add_argument("--max_train", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    enable_compilation_cache()
    set_seed(args.SEED)
    task = args.DATASET
    keys, num_labels = GLUE_TASKS[task]
    cfg = CLIPConfig.tiny() if args.tiny else (
        CLIPConfig.base() if args.IS_BASE else CLIPConfig.large())

    (tr_t, tr_p, tr_l), (te_t, te_p, te_l), synthetic = load_glue(task, args.SEED)
    if args.max_train:
        tr_t, tr_l = tr_t[: args.max_train], tr_l[: args.max_train]
        tr_p = tr_p[: args.max_train] if tr_p is not None else None
    tokenizer = get_tokenizer(args.vocab_dir)
    task_len = args.seq_max_length or TASK_MAX_LENGTH[task]
    seq = min(task_len, cfg.text.max_position_embeddings - 2)
    tr = tokenizer(tr_t, text_pair=tr_p, max_length=seq)
    te = tokenizer(te_t, text_pair=te_p, max_length=seq)

    is_regression = num_labels == 1
    model = TextClassifier(cfg.text, num_labels)
    params = jax.jit(model.init)(jax.random.PRNGKey(args.SEED),
                                 jnp.ones((1, seq), jnp.int32),
                                 jnp.ones((1, seq), jnp.int32))["params"]
    tag = size_tag(args.IS_BASE, args.IS_CAPTIONED)
    params, weights_prov = init_from_export(params, args.ckpt_dir, tag,
                                            "text", use_projection=False)

    labels_train = tr_l if not is_regression else tr_l.astype(np.float32)
    out = finetune_classifier(
        model, params,
        (tr["input_ids"], tr["attention_mask"]), labels_train,
        (te["input_ids"], te["attention_mask"]), te_l,
        epochs=args.EPOCHS, batch_size=args.BATCH_SIZE, lr=args.LR,
        seed=args.SEED, loss="mse" if is_regression else "ce",
        log_prefix=f"[ft_text:{task}]")

    preds = out["preds"]
    te_l = np.asarray(te_l)[: len(preds)]
    scores: Dict[str, float] = {}
    if is_regression:
        p_r, s_r = pearson_spearman(preds, te_l)
        scores = {"pearson": p_r, "spearman": s_r}
    else:
        scores["accuracy"] = float((preds == te_l).mean() * 100.0)
        if task in ("mrpc", "qqp"):
            scores["f1"] = f1_score(preds, te_l)
        if task == "cola":
            scores["matthews"] = matthews_corr(preds, te_l)
    print(f"[ft_text] {task} " +
          " ".join(f"{k}={v:.2f}" for k, v in scores.items()) +
          (" (synthetic data)" if synthetic else ""))
    metrics_io.save_metric(
        args.metric_path, tag, task, args.SEED, scores,
        provenance=f"weights={weights_prov}; "
                   f"data={'synthetic' if synthetic else 'real'}")
    return scores


if __name__ == "__main__":
    main()
