"""MSA column entropy + conserved-region cut points.

Equivalent of src/analyze_msa.py in the reference: per-column Shannon
entropy of a multiple sequence alignment (src/analyze_msa.py:10-33), a
250bp rolling average, and extraction of low-entropy cut points used to
partition virus genomes into sections (:50-90).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np


def column_entropy(column: Sequence[str]) -> float:
    """Shannon entropy over symbol frequencies of one alignment column."""
    counts: Dict[str, int] = {}
    for ch in column:
        counts[ch] = counts.get(ch, 0) + 1
    n = len(column)
    ent = 0.0
    for c in counts.values():
        p = c / n
        ent -= p * math.log2(p)
    return ent


def msa_entropy(rows: Sequence[str]) -> np.ndarray:
    lengths = {len(r) for r in rows}
    assert len(lengths) == 1, "MSA rows must have equal length"
    n = lengths.pop()
    return np.array(
        [column_entropy([r[i] for r in rows]) for i in range(n)], np.float64
    )


def rolling_average(values: np.ndarray, window: int = 250) -> np.ndarray:
    """Centered-ish rolling mean with partial windows at the edges."""
    csum = np.concatenate([[0.0], np.cumsum(values)])
    n = values.shape[0]
    out = np.empty(n)
    for i in range(n):
        lo = max(0, i - window + 1)
        out[i] = (csum[i + 1] - csum[lo]) / (i + 1 - lo)
    return out


def find_cut_points(
    smoothed: np.ndarray,
    threshold: float = 0.3,
    min_gap: int = 500,
) -> List[int]:
    """Low-entropy positions (below threshold), at least min_gap apart —
    the conserved anchors used to split genomes into sections."""
    cuts: List[int] = []
    for i, v in enumerate(smoothed):
        if v < threshold and (not cuts or i - cuts[-1] >= min_gap):
            cuts.append(i)
    return cuts


def sections_from_cuts(length: int, cuts: Sequence[int]) -> List[Tuple[int, int]]:
    bounds = [0] + list(cuts) + [length]
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1) if bounds[i + 1] > bounds[i]]
