from .table import KmerTable, key_words, SENTINEL
from .ops import (
    count_codes,
    union_many,
    intersect_sum,
    subtract,
    set_counts,
    histogram,
    n_present,
    total_count,
)
from .extract import extract_canonical, extract_canonical_sweep

__all__ = [
    "KmerTable",
    "key_words",
    "SENTINEL",
    "count_codes",
    "union_many",
    "intersect_sum",
    "subtract",
    "set_counts",
    "histogram",
    "n_present",
    "total_count",
    "extract_canonical",
    "extract_canonical_sweep",
]
