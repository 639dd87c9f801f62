from .reshape import melt, normalize_wide, pivot_metrics, split_metric_code, with_uid

__all__ = [
    "melt",
    "normalize_wide",
    "pivot_metrics",
    "split_metric_code",
    "with_uid",
]
