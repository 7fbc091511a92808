"""PySpark-native analytics engine with the query and data-processing
capabilities of Kartavya904/dbt-nlp-sqlizer-team04 ("NLP_SQLizer").

Where the reference generates/validates SQL and delegates execution to
PostgreSQL/MongoDB, this engine makes Spark SQL the executor:

- ``session``      — SparkSession factory tuned for AQE/CBO.
- ``sources``      — parquet table registry + document (Mongo-analog) source.
- ``catalog``      — SchemaMetadata/TableInfo/ColumnInfo dataclasses
                     (mirrors NLP_SQLizer/backend/app/schema/crawler.py:18-139).
- ``operators``    — relational query surface (SURVEY.md §2.B), profiler
                     (§2.A), Mongo dataflow (§2.C), plus scale extensions:
                     dedup, similarity search, text analysis, multimodal.
- ``plans``        — SQL safety layer, intent analysis, schema linking,
                     cost gate, read-only executor (SURVEY.md §2 S1-S10, A9-A18).
- ``streaming``    — Structured Streaming path over the events table (§2.D).
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
