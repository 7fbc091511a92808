"""Write-pass auditing via ``DataFrame.observe`` — validate WHILE
writing, not after.

The naive export audit is two jobs: write the curated corpus, then
re-scan the written files to count rows / nulls / total chars. At
100 TB the second scan re-reads the entire output — strictly wasted
I/O, since every audited quantity was already streaming through the
writer. ``df.observe(Observation, *aggs)`` attaches accumulator-backed
aggregates to the plan itself: the metrics are folded into the SAME
write job (one pass over the data, zero extra scan, no extra shuffle —
observe metrics are commutative partial aggregates merged on the
driver, exactly Spark's internal SQL-metrics machinery).

Reference parity: the reference's execution layer reports row counts
alongside results (NLP_SQLizer/backend/app/nl2sql.py returns
``row_count`` with every payload); this module is that contract applied
to the export path, at scale.

Contract pinned by ``tests/test_audited_write.py``:
- observed ``n_rows``/``total_chars``/``null_ids`` equal an
  independent recount of the files on disk;
- invariant violations (null ids, empty text) are COUNTED in the same
  pass and raised as ``AuditViolation`` after the write completes, so
  the caller can quarantine the output directory without ever
  re-scanning it.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from py4j.protocol import Py4JError
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class AuditViolation(RuntimeError):
    """Raised when the observed write metrics break an invariant; the
    message carries the full metric dict for quarantine tooling."""

    def __init__(self, metrics: dict):
        self.metrics = metrics
        super().__init__(f"audited write violated invariants: {metrics}")


@dataclass(frozen=True)
class WriteAudit:
    """Metrics captured during (not after) a parquet write."""

    n_rows: int
    total_chars: int
    null_ids: int
    empty_texts: int
    min_id: int | None
    max_id: int | None


def write_parquet_audited(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
    strict: bool = True,
    partition_by: list[str] | None = None,
) -> WriteAudit:
    """Write ``df`` to parquet and return single-pass audit metrics.

    ``strict=True`` raises :class:`AuditViolation` when any null-id or
    empty-text row was written (the rows ARE written first — the audit
    is an after-the-fact gate so a violating output can be quarantined,
    matching how a 100 TB pipeline would handle it: never re-run the
    job, just fence the directory).
    """
    # Observe on a throwaway CHILD session, not the caller's: Spark
    # 4.1's SparkSession.observationManager is a lazily-materialized,
    # non-serializable field — the first Observation on a session
    # permanently breaks any later flow that Java-serializes that
    # session object (e.g. an ML model whose training summary is
    # captured inside a prediction UDF closure: model -> summary ->
    # sparkSession -> observationManager -> NotSerializableException).
    # Re-homing the plan onto spark.newSession() (shared context and
    # catalog, separate session state) materializes the manager only on
    # the disposable child. Falls back to the caller's session if the
    # classic-API re-home isn't available (e.g. Spark Connect).
    target = df
    try:
        spark = df.sparkSession
        child = spark.newSession()
        jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            child._jsparkSession, df._jdf.logicalPlan()
        )
        target = DataFrame(jdf, child)
    except (AttributeError, TypeError, Py4JError) as exc:
        # Classic-API internals absent (Spark Connect, or a class
        # rename in a future Spark): fall back to observing on the
        # caller's session. Warn loudly — the degraded mode reintroduces
        # the ObservationManager-serialization hazard this re-home
        # exists to prevent, and must be visible rather than silent.
        logging.getLogger(__name__).warning(
            "audited_write: session re-home unavailable (%s); observing "
            "on the caller's session — later Java-serialization of this "
            "session (e.g. ML model closures) may fail", exc,
        )
    obs = Observation()
    observed = target.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum(F.length(text_col)), F.lit(0)).alias("total_chars"),
        F.coalesce(
            F.sum(F.col(id_col).isNull().cast("long")), F.lit(0)
        ).alias("null_ids"),
        F.coalesce(
            F.sum(
                (F.coalesce(F.length(F.trim(F.col(text_col))), F.lit(0)) == 0)
                .cast("long")
            ),
            F.lit(0),
        ).alias("empty_texts"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
    )
    writer = observed.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    m = obs.get
    audit = WriteAudit(
        n_rows=int(m["n_rows"]),
        total_chars=int(m["total_chars"]),
        null_ids=int(m["null_ids"]),
        empty_texts=int(m["empty_texts"]),
        min_id=m["min_id"],
        max_id=m["max_id"],
    )
    if strict and (audit.null_ids or audit.empty_texts):
        raise AuditViolation(m)
    return audit
