"""Generate vgg_category.json from a VGGSound-style CSV.

The reference's MMR stage filters its dataset by indexing into
``vgg_category.json`` (reference dataset.py:183-190, main_MMR.py:49) but the
repo never ships that file (SURVEY "missing artifacts"); our pipeline
accepts it when present and otherwise trains unfiltered. This tool rebuilds
it from the training CSV: ``{category: sample_count}`` ordered by
descending count (so index 0 is the most frequent category — a stable,
documented convention, since the reference never specifies one).

Run: python tools/make_vgg_category.py --csv vgg_sound_train_captioned.csv \
         [--out vgg_category.json]
"""

import argparse
import json
from collections import Counter


def build(csv_path: str) -> dict:
    import pandas as pd

    df = pd.read_csv(csv_path)
    counts = Counter()
    for label in df["label"].astype(str):
        for cat in label.split(","):
            counts[cat.strip()] += 1
    return dict(sorted(counts.items(), key=lambda kv: (-kv[1], kv[0])))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True)
    p.add_argument("--out", default="vgg_category.json")
    args = p.parse_args(argv)
    cats = build(args.csv)
    with open(args.out, "w") as f:
        json.dump(cats, f, indent=1)
    print(f"[make_vgg_category] {len(cats)} categories -> {args.out} "
          f"(top: {list(cats)[:3]})")
    return cats


if __name__ == "__main__":
    main()
