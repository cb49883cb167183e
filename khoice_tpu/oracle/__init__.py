from .pykmc import (
    canonical,
    count_kmers,
    set_counts,
    union_sum,
    intersect_sum,
    subtract,
    histogram,
)

__all__ = [
    "canonical",
    "count_kmers",
    "set_counts",
    "union_sum",
    "intersect_sum",
    "subtract",
    "histogram",
]
