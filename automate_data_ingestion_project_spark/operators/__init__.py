from .reshape import melt, normalize_wide, pivot_metrics, split_metric_code, with_uid
from .skew import salted_join, salted_sum_count, with_salt

__all__ = [
    "melt",
    "normalize_wide",
    "pivot_metrics",
    "split_metric_code",
    "with_uid",
    "salted_join",
    "salted_sum_count",
    "with_salt",
]
