from .asof import asof_join_backward
from .rangejoin import bucketed_range_join
from .reshape import melt, normalize_wide, pivot_metrics, split_metric_code, with_uid
from .skew import salted_join, salted_sum_count, with_salt

__all__ = [
    "asof_join_backward",
    "bucketed_range_join",
    "melt",
    "normalize_wide",
    "pivot_metrics",
    "split_metric_code",
    "with_uid",
    "salted_join",
    "salted_sum_count",
    "with_salt",
]
