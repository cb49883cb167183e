from .annotate import Annotation, build_annotation, feature_buckets, read_votes
from .confusion import (
    accuracy_values,
    feature_confusion_rows,
    read_level_confusion_row,
    write_confusion_matrix,
    write_accuracy_csv,
)

__all__ = [
    "Annotation",
    "build_annotation",
    "feature_buckets",
    "read_votes",
    "accuracy_values",
    "feature_confusion_rows",
    "read_level_confusion_row",
    "write_confusion_matrix",
    "write_accuracy_csv",
]
