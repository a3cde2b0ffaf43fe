"""Dataset factory utilities: subsets, statistics, caption merging.

Counterparts of second_party helpers:
- fast-iteration subset creation (``second_party/utils`` subset scripts,
  consumed by ``--subsample_stride`` in the trainer)
- clip-length / caption statistics (``dataset_statistics/compute.ipynb``)
- hierarchical caption merging of sequential pairs
  (``second_party/hierarchical_ds_factory/main.py:15-35``) with a
  pluggable LLM merge function
- caption dedup/merge preprocessing (``preprocess/dataset_preprocessing_
  phase1.py:32-47`` semantics: merge near-duplicate consecutive
  captions)
"""

from __future__ import annotations

import pickle
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def subset_metadata(input_path: str, output_path: str, *,
                    stride: int = 0, fraction: float = 0.0,
                    seed: int = 0) -> int:
    with open(input_path, "rb") as f:
        rows = pickle.load(f)
    if stride:
        rows = rows[::stride]
    elif fraction:
        rng = np.random.RandomState(seed)
        idx = rng.choice(len(rows), int(len(rows) * fraction), replace=False)
        rows = [rows[i] for i in sorted(idx)]
    with open(output_path, "wb") as f:
        pickle.dump(rows, f)
    return len(rows)


def dataset_statistics(samples: Sequence) -> Dict[str, float]:
    """Clip duration and caption-length statistics."""
    durations = np.array([float(r[2]) - float(r[1]) for r in samples])
    cap_lens = np.array([
        len(str(r[3] if not isinstance(r[3], list) else " ".join(r[3])).split())
        for r in samples
    ])
    vids = {r[0] for r in samples}
    return {
        "n_samples": len(samples),
        "n_videos": len(vids),
        "duration_mean": float(durations.mean()) if len(durations) else 0,
        "duration_p50": float(np.median(durations)) if len(durations) else 0,
        "duration_p95": float(np.percentile(durations, 95)) if len(durations) else 0,
        "caption_len_mean": float(cap_lens.mean()) if len(cap_lens) else 0,
    }


def _token_overlap(a: str, b: str) -> float:
    ta, tb = set(a.lower().split()), set(b.lower().split())
    if not ta or not tb:
        return 0.0
    return len(ta & tb) / len(ta | tb)


def dedup_consecutive_captions(
    samples: Sequence,
    overlap_threshold: float = 0.8,
    max_gap: float = 2.0,
) -> List[Tuple]:
    """Merge consecutive near-duplicate captions on the same video into
    one span (phase-1 preprocessing semantics)."""
    by_vid: Dict[str, List] = {}
    for r in samples:
        by_vid.setdefault(r[0], []).append(list(r))
    out = []
    for vid, rows in by_vid.items():
        rows.sort(key=lambda r: float(r[1]))
        merged = [rows[0]]
        for r in rows[1:]:
            prev = merged[-1]
            cap_prev = str(prev[3] if not isinstance(prev[3], list) else prev[3][0])
            cap_cur = str(r[3] if not isinstance(r[3], list) else r[3][0])
            if (_token_overlap(cap_prev, cap_cur) >= overlap_threshold
                    and float(r[1]) - float(prev[2]) <= max_gap):
                prev[2] = max(float(prev[2]), float(r[2]))
            else:
                merged.append(r)
        out.extend(tuple(r) for r in merged)
    return out


def hierarchical_merge(
    samples: Sequence,
    merge_fn: Callable[[str, str], Optional[str]],
    max_gap: float = 3.0,
) -> List[Tuple]:
    """Merge sequential caption pairs into hierarchical (coarser)
    captions using a pluggable LLM merge function
    (``hierarchical_ds_factory/main.py``): pairs of temporally adjacent
    clips on the same video become one clip whose caption is the LLM's
    summary of both."""
    by_vid: Dict[str, List] = {}
    for r in samples:
        by_vid.setdefault(r[0], []).append(r)
    out = []
    for vid, rows in by_vid.items():
        rows = sorted(rows, key=lambda r: float(r[1]))
        i = 0
        while i < len(rows):
            if i + 1 < len(rows) and float(rows[i + 1][1]) - float(rows[i][2]) <= max_gap:
                a, b = rows[i], rows[i + 1]
                cap = None
                try:
                    cap = merge_fn(str(a[3]), str(b[3]))
                except Exception:
                    cap = None
                if cap:
                    out.append((vid, float(a[1]), float(b[2]), cap))
                    i += 2
                    continue
            out.append(tuple(rows[i]))
            i += 1
    return out
