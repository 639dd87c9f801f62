"""Executor-side REST ingestion: a Spark 4 Python Data Source (S1 at
scale).

``ingest.rest.read_api`` fetches on the driver — right for one code's
worth of pages. When the work-list is large (hundreds of codes × pages),
the fetch itself should distribute. Spark 4's Python Data Source API
(``spark.dataSource.register``) makes each PAGE an input partition, so
executors fetch in parallel and rows are born distributed:

    spark.dataSource.register(RestApiDataSource)
    df = (spark.read.format("rest_api")
          .option("endpoint", ".../departements/annuel/01/")
          .option("pages", "12")
          .option("schema_ddl", "annee string, dep string, nbtrans double")
          .load())

Offline testability: ``option("replay_dir", dir)`` reads page payloads
from ``{dir}/page-{n}.json`` instead of HTTP — the same partition logic,
no network (used by tests; also useful for deterministic re-runs).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from .rest import flatten_record, prune_params


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


class RestApiReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.endpoint = options.get("endpoint", "")
        self.replay_dir = options.get("replay_dir")
        self.n_pages = int(options.get("pages", "1"))
        self.page_size = options.get("page_size")
        self.annee = options.get("annee")
        self.ordering = options.get("ordering")

    def partitions(self) -> list[InputPartition]:
        # one partition per server page → executor-parallel fetch
        return [_PagePartition(p) for p in range(1, self.n_pages + 1)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        if self.replay_dir:
            path = os.path.join(self.replay_dir, f"page-{partition.page}.json")
            with open(path) as fh:
                payload = json.load(fh)
        else:  # pragma: no cover - needs a live API
            import urllib.parse
            import urllib.request

            params = prune_params(
                {
                    "annee": self.annee,
                    "ordering": self.ordering,
                    "page": partition.page,
                    "page_size": self.page_size,
                }
            )
            url = f"{self.endpoint}?{urllib.parse.urlencode(params)}"
            with urllib.request.urlopen(url, timeout=30) as resp:
                payload = json.loads(resp.read().decode("utf-8"))
        names = [f.name for f in self.schema_.fields]
        for rec in payload.get("results", []):
            flat = flatten_record(rec)
            yield tuple(flat.get(n) for n in names)


class RestApiDataSource(DataSource):
    """``format("rest_api")`` — register with
    ``spark.dataSource.register(RestApiDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "rest_api"

    def schema(self) -> str:
        # explicit schema required: executor-side sources can't run a
        # driver-side inference pass without an extra fetch
        ddl = self.options.get("schema_ddl")
        if not ddl:
            raise ValueError("rest_api requires option 'schema_ddl'")
        return ddl

    def reader(self, schema: StructType) -> DataSourceReader:
        return RestApiReader(schema, dict(self.options))
