from .asof import asof_join_backward
from .rangejoin import bucketed_range_join
from .ranking import rank_distributed
from .reshape import melt, normalize_wide, pivot_metrics, split_metric_code, with_uid
from .skew import salted_join, salted_sum_count, with_salt

__all__ = [
    "asof_join_backward",
    "bucketed_range_join",
    "rank_distributed",
    "melt",
    "normalize_wide",
    "pivot_metrics",
    "split_metric_code",
    "with_uid",
    "salted_join",
    "salted_sum_count",
    "with_salt",
]
