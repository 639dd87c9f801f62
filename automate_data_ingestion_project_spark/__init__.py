"""PySpark-native analytics engine with the capabilities of
reirualluap/automate-data-ingestion-project, re-expressed Spark-first.

Layers (mirroring the reference's three layers, see SURVEY.md §0):

- ``ingest``   — config-driven extract/transform/load pipeline
                 (reference: ``scripts/etl.py`` + ``scripts/extract_load.py``)
- ``operators``— relational + reshape + upsert + quality + scale extensions
- ``models``   — dbt-analog SQL model layer (reference: ``dbt_core/``)
- ``analytics``— named analytics queries (reference: ``evidence-workspace/pages``)

Everything is built on the public PySpark DataFrame/SQL API; no code is
copied from the reference (a native pandas/DuckDB/Dagster stack).
"""

__version__ = "0.1.0"
