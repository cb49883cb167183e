from .mesh import make_mesh, split_keys_for
from .occurrence import sharded_occurrence_histogram
from .sharded import (
    ShardedKmerTable,
    sharded_count_codes,
    sharded_union_many,
    sharded_intersect_sum,
    sharded_subtract,
    sharded_set_counts,
    sharded_histogram,
)

__all__ = [
    "make_mesh",
    "split_keys_for",
    "ShardedKmerTable",
    "sharded_count_codes",
    "sharded_union_many",
    "sharded_intersect_sum",
    "sharded_subtract",
    "sharded_set_counts",
    "sharded_histogram",
    "sharded_occurrence_histogram",
]
