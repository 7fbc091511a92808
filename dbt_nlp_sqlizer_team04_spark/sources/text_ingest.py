"""Robust semi-structured ingestion: JSONL / CSV → typed DataFrame with
corrupt-record QUARANTINE.

The reference ingests from live databases (NLP_SQLizer/backend/app/ai/
nl2sql.py:14-21 — SQLAlchemy connections), so rows arrive pre-typed. A
100 TB training-data pipeline ingests crawler output: JSONL and CSV
where a fraction of records is ALWAYS malformed (truncated lines,
encoding damage, schema drift). Dropping them silently biases the
corpus; failing the job on one bad record loses the batch. The
production contract is three-way:

- parse what parses, against an EXPLICIT schema (never runtime
  inference at scale: ``inferSchema``/``multiLine`` schema inference
  costs a full extra pass over 100 TB and can silently flip a column's
  type between batches — infer once on a bounded sample offline, then
  pin);
- QUARANTINE what doesn't, with the raw line preserved for replay
  (Spark's PERMISSIVE mode + ``columnNameOfCorruptRecord``) — the
  quarantine is data, not a log line;
- never run the source twice: good and bad rows split from ONE parsed
  frame.

Spark-native details this wraps:
- PERMISSIVE mode leaves non-conforming rows as NULLs + the raw text in
  the corrupt-record column; DROPMALFORMED would hide them, FAILFAST
  would kill the batch.
- The corrupt column must be materialized before filtering on it
  (Spark refuses ``filter`` on a just-parsed corrupt column for
  raw-text sources when the query would prune every data column —
  SPARK-38772-adjacent; selecting it through an intermediate frame is
  the documented pattern).
- Both splits come from one ``spark.read`` plan; at scale you'd write
  both sinks from one pass via ``foreachBatch`` (streaming) or rely on
  scan reuse (batch).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


class IngestSplit(NamedTuple):
    """The two halves of one parsed batch plus the cache lifecycle:
    ``release()`` unpersists the shared parse after both halves are
    written — a long-lived session must not accumulate one cached
    batch per ingest."""

    good: DataFrame
    quarantine: DataFrame
    release: Callable[[], None]


def _with_corrupt_field(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def _split(parsed: DataFrame, schema: T.StructType) -> IngestSplit:
    good = parsed.filter(F.col(CORRUPT_COL).isNull()).select(
        *[f.name for f in schema.fields if f.name != CORRUPT_COL]
    )
    quarantine = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return IngestSplit(good, quarantine, lambda: parsed.unpersist())


def read_jsonl_quarantined(
    spark: SparkSession, path: str, schema: T.StructType
) -> IngestSplit:
    """Read JSONL against a pinned schema; return ``IngestSplit(good,
    quarantine, release)``.

    ``good`` carries exactly the schema's columns; ``quarantine`` is
    ``(raw_record)`` — the unparsed line, ready for a replay bucket.
    A record is quarantined when it fails to parse at all OR parses but
    violates the schema (PERMISSIVE puts the raw text in the corrupt
    column either way). Call ``release()`` after writing both halves.
    """
    parsed = (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()  # one parse serves both splits; release() unpersists
    )
    return _split(parsed, schema)


def read_csv_quarantined(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> IngestSplit:
    """CSV twin of :func:`read_jsonl_quarantined` — same three-way
    contract, same single-parse split, same ``release()`` lifecycle."""
    parsed = (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
        .cache()
    )
    return _split(parsed, schema)


def ingest_report(good: DataFrame, quarantine: DataFrame) -> dict:
    """Counts for the batch manifest: rows kept, rows quarantined, and
    the quarantine fraction the batch gate alarms on."""
    n_good = good.count()
    n_bad = quarantine.count()
    total = n_good + n_bad
    return {
        "rows_ingested": n_good,
        "rows_quarantined": n_bad,
        "quarantine_frac": round(n_bad / total, 6) if total else 0.0,
    }
