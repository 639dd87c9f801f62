"""Ingestion sources (SURVEY.md §2.1 S1-S3): REST API → DataFrame."""

from .rest import (
    RestApiError,
    build_endpoint,
    flatten_record,
    paginate,
    prune_params,
    read_api,
)

__all__ = [
    "RestApiError",
    "build_endpoint",
    "flatten_record",
    "paginate",
    "prune_params",
    "read_api",
]
