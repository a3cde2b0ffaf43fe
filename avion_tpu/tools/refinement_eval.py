"""Evaluate refined caption temporal boundaries against annotations.

Counterpart of ``second_party/evaluate_refined_dataset/main.py:18-35``
and ``second_party/utils/evaluate_refinement.py``: temporal IoU between
LLM-refined clip windows and manually annotated ground truth, with
summary statistics (mean IoU, IoU histogram, recall at thresholds).

Usage::

    python -m avion_tpu.tools.refinement_eval \
        --refined refined.pkl --annotated annotated.csv --key video_uid
"""

from __future__ import annotations

import argparse
import csv
import json
import pickle
from typing import Dict, List, Tuple

import numpy as np


def interval_iou(a: Tuple[float, float], b: Tuple[float, float]) -> float:
    inter = max(0.0, min(a[1], b[1]) - max(a[0], b[0]))
    union = (a[1] - a[0]) + (b[1] - b[0]) - inter
    return inter / union if union > 0 else 0.0


def load_segments(path: str) -> Dict[str, Tuple[float, float]]:
    """Load {sample_key: (start, end)} from pkl rows or csv."""
    segs = {}
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            rows = pickle.load(f)
        for i, row in enumerate(rows):
            key = f"{row[0]}_{i}"
            segs[key] = (float(row[1]), float(row[2]))
    else:
        with open(path) as f:
            reader = csv.DictReader(f)
            for i, row in enumerate(reader):
                key = row.get("key", f"{row.get('video_uid', i)}_{i}")
                segs[key] = (float(row["start"]), float(row["end"]))
    return segs


def evaluate_refinement(
    refined: Dict[str, Tuple[float, float]],
    annotated: Dict[str, Tuple[float, float]],
    thresholds=(0.3, 0.5, 0.7),
) -> Dict[str, float]:
    keys = sorted(set(refined) & set(annotated))
    ious = np.array([interval_iou(refined[k], annotated[k]) for k in keys])
    out = {
        "n_matched": len(keys),
        "mean_iou": float(ious.mean()) if len(ious) else 0.0,
        "median_iou": float(np.median(ious)) if len(ious) else 0.0,
    }
    for t in thresholds:
        out[f"recall@{t}"] = float((ious >= t).mean()) if len(ious) else 0.0
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--refined", required=True)
    p.add_argument("--annotated", required=True)
    args = p.parse_args(argv)
    out = evaluate_refinement(load_segments(args.refined),
                              load_segments(args.annotated))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
