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
from typing import Dict, Optional

import numpy as np


def _init_entry() -> Dict:
    return {"seeds": [], "scores": {}}


def load_metrics(path: str) -> Dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _is_duplicate(entry: Dict, seed: int, scores: Dict[str, float]) -> bool:
    """True if some prior run row is byte-identical to (seed, scores): same
    seed AND every metric value equal at that row's index. Re-running the
    identical eval is a no-op, not a new sample — duplicate appends silently
    sharpen the reported std toward zero (a real round-3/4 artifact bug:
    ZS_OUR.json accumulated six copies of one seed-17 run)."""
    new = {k: float(v) for k, v in scores.items()}
    for i, s in enumerate(entry["seeds"]):
        if s != seed:
            continue
        slots = entry["scores"]
        if set(slots) != set(new):
            continue
        if all(i < len(slots[k]["values"]) and slots[k]["values"][i] == new[k]
               for k in new):
            return True
    return False


def save_metric(path: str, model_key: str, dataset: str, seed: int,
                scores: Dict[str, float],
                provenance: Optional[str] = None) -> Dict:
    """Append one run's scores and refresh mean/std.

    Layout: {model_key: {dataset: {"seeds": [...], "provenance": [...],
    "scores": {metric: {"values": [...], "mean": m, "std": s}}}}};
    ``model_key`` is the reference's '{size}_{captiontype}' tag.

    ``provenance`` records where the weights/data came from (e.g.
    "weights=random-init; data=synthetic") so a committed artifact can never
    masquerade as a real-data result. Byte-identical (seed, scores) re-runs
    are collapsed instead of appended.
    """
    data = load_metrics(path)
    entry = data.setdefault(model_key, {}).setdefault(dataset, _init_entry())
    if _is_duplicate(entry, seed, scores):
        print(f"[metrics] duplicate (seed={seed}) run for "
              f"{model_key}/{dataset} in {path}: not appended")
        return data
    entry["seeds"].append(seed)
    if provenance is not None or "provenance" in entry:
        prov = entry.setdefault("provenance", [])
        prov.extend([None] * (len(entry["seeds"]) - 1 - len(prov)))
        prov.append(provenance)
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
