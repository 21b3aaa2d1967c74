"""Metric-JSON accumulators for the FT/ZS evaluation suites.

Reproduces the reference's regression-harness contract (SURVEY §4): each
script appends per-seed (or per-fold) results plus a running mean/std into
METRIC_IMG.json / METRIC_AUD.json / METRIC_TXT.json / ZS_IMG.json /
ZS_AUD.json / ZS_OUR.json (reference DT/FT_image_task.py:337-357,
ZS/ZS_image_task.py:1491-1510 etc.). One deliberate fix: the reference
crashes if the JSON doesn't pre-exist (opens with "r"); we seed the INIT
shape on first use.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


def _init_entry() -> Dict:
    return {"seeds": [], "scores": {}}


def load_metrics(path: str) -> Dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def save_metric(path: str, model_key: str, dataset: str, seed: int,
                scores: Dict[str, float]) -> Dict:
    """Append one run's scores and refresh mean/std.

    Layout: {model_key: {dataset: {"seeds": [...], "scores": {metric:
    {"values": [...], "mean": m, "std": s}}}}}; ``model_key`` is the
    reference's '{size}_{captiontype}' tag.
    """
    data = load_metrics(path)
    entry = data.setdefault(model_key, {}).setdefault(dataset, _init_entry())
    entry["seeds"].append(seed)
    for name, value in scores.items():
        slot = entry["scores"].setdefault(name, {"values": []})
        slot["values"].append(float(value))
        slot["mean"] = float(np.mean(slot["values"]))
        slot["std"] = float(np.std(slot["values"]))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    return data


METRIC_FILES = {
    "ft_image": "METRIC_IMG.json",
    "ft_audio": "METRIC_AUD.json",
    "ft_text": "METRIC_TXT.json",
    "zs_image": "ZS_IMG.json",
    "zs_audio": "ZS_AUD.json",
    "zs_combined": "ZS_OUR.json",
}
