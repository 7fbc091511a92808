"""Right-to-be-forgotten over the ingest-persisted index plane.

A takedown/GDPR request is not satisfied by deleting rows from the
source corpus: every DERIVED artifact the engine persisted at ingest —
shingle sets (dedup), MinHash signatures, near-dup PAIRS, chunk vectors
(retrieval) — still carries content derived from the forgotten
documents. (The fitted chunk-ENCODER sidecar holds only aggregate
vocabulary statistics, not per-document rows — aggregate model state is
out of scope for row-level deletion, the same line every DP/ML
governance policy draws.) This module
purges a doc-id set from every doc-derived table and returns an audit
report proving absence, the evidence a compliance review asks for.

No reference analog (the reference is read-only over Postgres/Mongo and
persists no derived state); this is the governance completion of the
builder-brief index substrate (SURVEY.md §2.E).

Swap protocol: the purged copy is written to a staging table FIRST
(``<table>__purged``, reading the original), then the original is
dropped and the staging table renamed in (Spark's managed-table RENAME
cannot move onto an existing location, so a rename-aside swap is not
available without a table format). The purged DATA exists on disk at
every instant — during the drop→rename window it is readable under the
staging name; recovery from a crash inside the window is re-running the
purge (idempotent: the staging build re-reads whichever copy survives).

Scale: the purge is one filtered rewrite per artifact (anti-join shape;
the id set ships as a literal for request-sized lists and should become
a broadcast anti-join table for mass deletions — both forms are one
scan per table). The audit recount is a second slim scan. At 100 TB the
rewrite cost is why real deployments batch forget requests; the
protocol here is batch-shaped already (one call, many ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _any_match(id_cols: list[str], ids: list[int]):
    """True iff ANY id column provably matches (NULLs never match)."""
    cond = F.lit(False)
    for c in id_cols:
        cond = cond | F.coalesce(F.col(c).isin(ids), F.lit(False))
    return cond


def purge_table(
    spark: SparkSession, table: str, id_col: str | list[str], ids: list[int]
) -> dict:
    """Rewrite ``table`` without the rows where ANY of the ``id_col``
    columns is in ``ids`` (crash-safe swap, see module docstring);
    returns the audit counts including a post-swap recount of remaining
    matches. Multi-column form covers edge-list artifacts (a near-dup
    PAIR carries the forgotten document on either side)."""
    import os
    import shutil

    id_cols = [id_col] if isinstance(id_col, str) else list(id_col)
    staging, aside = f"{table}__purged", f"{table}__old"
    # entry-time healing: a crash between DROP TABLE and the RENAME
    # leaves the base table missing with the fully-purged copy orphaned
    # under the staging name — rename it in so a direct re-run of
    # purge_table works (without this, only forget_documents'
    # rebuild-from-source path could recover)
    if not spark.catalog.tableExists(table) and spark.catalog.tableExists(
        staging
    ):
        spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
        spark.catalog.refreshTable(table)
    before = spark.table(table).count()
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for t in (staging, aside):
        # DROP alone leaves an orphaned directory behind if a previous
        # run died mid-swap; the rename would then refuse the location
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = os.path.join(warehouse, t)
        if os.path.exists(loc):
            shutil.rmtree(loc)
    (
        spark.table(table)
        # coalesce: a plain ~isin drops NULL-keyed rows (NULL NOT IN
        # is NULL), silently deleting records no takedown requested —
        # a row goes ONLY when some id column provably matches
        .filter(
            ~_any_match(id_cols, ids)
        )
        .write.mode("overwrite")
        .format("parquet")
        .saveAsTable(staging)
    )
    # Managed-table RENAME does not relocate the original's directory
    # (the in-memory catalog refuses a rename onto an existing
    # location), so the swap is: drop the original (metadata + files),
    # then rename the staging copy in. The purged data exists on disk
    # at EVERY instant — during the window it is readable under the
    # staging name; recovery from a crash inside the window is
    # re-running the purge (idempotent: the staging build re-reads
    # whichever copy survives). A table format with atomic metadata
    # swap (Delta/Iceberg) would collapse the window entirely.
    spark.sql(f"DROP TABLE {table}")
    loc = os.path.join(warehouse, table)
    if os.path.exists(loc):
        shutil.rmtree(loc)
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
    spark.catalog.refreshTable(table)
    after = spark.table(table).count()
    remaining = (
        spark.table(table).filter(_any_match(id_cols, ids)).count()
    )
    return {
        "artifact": table,
        "id_col": "|".join(id_cols),
        "n_before": before,
        "n_after": after,
        "n_removed": before - after,
        "n_remaining": remaining,
        "clean": remaining == 0,
    }


def forget_documents(
    spark: SparkSession, sf_dir: str, doc_ids: list[int]
) -> DataFrame:
    """Purge ``doc_ids`` from every doc-derived persisted artifact of
    the corpus at ``sf_dir`` (building any that don't exist yet, so the
    report always covers the full artifact surface) and return the
    audit report as a DataFrame: one row per artifact with before/after
    counts and a ``clean`` flag.

    Contract: deleting the documents from the SOURCE lake is the
    caller's (prior) step — this op completes the request across the
    derived plane. Calling it while the source still holds the docs
    leaves index and corpus intentionally divergent (the index answers
    as if the docs are gone); `reuse_persisted_table`'s
    existence-implies-validity adoption then applies to the PURGED
    index, which is exactly right post-takedown and exactly wrong if
    the source deletion never happened.
    """
    from .dedup import (
        minhash_table_for,
        ngram_table_for,
        pairs_table_for,
    )
    from .retrieval import _CHUNK_INDEX_CACHE, chunk_index_for

    ngram = ngram_table_for(spark, sf_dir)
    minhash = minhash_table_for(spark, sf_dir)
    pairs = pairs_table_for(spark, sf_dir)
    _enc, chunk_df = chunk_index_for(spark, sf_dir)
    # recover the chunk table NAME from the cache key contract
    from .dedup import _sf_tag

    chunks = f"documents_chunk_vecs_{_sf_tag(sf_dir)}"
    reports = [
        purge_table(spark, ngram, "id", doc_ids),
        purge_table(spark, minhash, "doc_id", doc_ids),
        # the pair table carries a forgotten doc on EITHER side
        purge_table(spark, pairs, ["id_a", "id_b"], doc_ids),
        purge_table(spark, chunks, "doc_id", doc_ids),
    ]
    # cached DataFrames hold the PRE-swap file listing — drop them so
    # the next reader resolves the purged table fresh
    _CHUNK_INDEX_CACHE.pop((id(spark), sf_dir), None)
    return spark.createDataFrame(
        [
            (
                r["artifact"],
                r["id_col"],
                r["n_before"],
                r["n_after"],
                r["n_removed"],
                r["n_remaining"],
                r["clean"],
            )
            for r in reports
        ],
        "artifact string, id_col string, n_before long, n_after long,"
        " n_removed long, n_remaining long, clean boolean",
    )
