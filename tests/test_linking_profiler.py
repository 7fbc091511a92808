"""Fuzzy linking (A9/A14), profiler (A2-A8), catalog round-trip."""

from __future__ import annotations

from dbt_nlp_sqlizer_team04_spark.catalog.metadata import SchemaMetadata, generate_schema_id
from dbt_nlp_sqlizer_team04_spark.operators.profiler import crawl_schema
from dbt_nlp_sqlizer_team04_spark.plans.linking import (
    keyword_match,
    partial_ratio,
    select_relevant,
)

SCHEMA = {
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
}


def test_partial_ratio_basics():
    assert partial_ratio("orders", "orders") == 100.0
    assert partial_ratio("order", "count of orders per priority") > 80.0
    assert partial_ratio("zebra", "count of orders") < 50.0


def test_select_relevant_prunes():
    rel = select_relevant(SCHEMA, "total price of orders per status", k_tables=2)
    assert "orders" in rel
    assert len(rel) == 2
    assert len(rel["orders"]) <= 9  # 8 + id fallback


def test_keyword_match():
    rel = keyword_match(SCHEMA, "show customer c_acctbal")
    assert "customer" in rel
    assert "c_acctbal" in rel["customer"]


def test_profiler_crawl(spark, sf_smoke):
    meta = crawl_schema(spark, sf_smoke, ("region", "nation", "customer", "orders"),
                        sample_size=5, exact_distinct=True)
    assert meta.tables["region"].row_count == 5
    n = meta.tables["nation"]
    assert n.primary_key == ["n_nationkey"]
    # FK inference: customer.c_nationkey -> nation.n_nationkey
    fks = {(r.from_table, r.from_column, r.to_table) for r in meta.relationships}
    assert ("customer", "c_nationkey", "nation") in fks
    assert ("orders", "o_custkey", "customer") in fks
    # categorical domain captured
    seg = next(c for c in meta.tables["customer"].columns if c.name == "c_mktsegment")
    assert seg.unique_values and "BUILDING" in seg.unique_values
    # numeric stats present
    bal = next(c for c in meta.tables["customer"].columns if c.name == "c_acctbal")
    assert bal.min_value is not None and bal.avg_value is not None
    # synonyms mined (A8)
    assert "orders" in meta.synonyms


def test_metadata_roundtrip(spark, sf_smoke):
    meta = crawl_schema(spark, sf_smoke, ("region", "nation"), sample_size=2)
    again = SchemaMetadata.from_json(meta.to_json())
    assert again.schema_dict() == meta.schema_dict()
    assert generate_schema_id(again) == generate_schema_id(meta)
    assert len(generate_schema_id(meta)) == 16


def test_profile_empty_table(spark):
    # ADVICE(low): F.sum over zero rows is NULL — empty tables must
    # profile to zeros, not crash.
    from dbt_nlp_sqlizer_team04_spark.operators.profiler import profile_table

    df = spark.createDataFrame([], "a_key long, name string, val double")
    info = profile_table(df, "empty")
    assert info.row_count == 0
    assert all((c.null_count or 0) == 0 for c in info.columns)
    assert info.primary_key == []


def test_pk_inference_survives_approx_distinct(spark, sf_smoke):
    # ADVICE(low): HLL estimates rarely equal row_count exactly; the PK
    # (and the FK graph built on it) must survive exact_distinct=False.
    from dbt_nlp_sqlizer_team04_spark.operators.profiler import profile_table
    from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table

    info = profile_table(
        load_table(spark, sf_smoke, "orders"), "orders", exact_distinct=False
    )
    assert info.primary_key == ["o_orderkey"]


# ------------------------------------------------------------ CheckSuite
def test_check_suite_planted_violations(spark):
    """Every constraint type trips on planted bad data and passes on
    clean data; the whole suite is ONE aggregate scan."""
    from dbt_nlp_sqlizer_team04_spark.operators.profiler import CheckSuite
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "a", 5.0, "X", 1),
            (2, "b", -1.0, "Y", 2),     # negative value, n != len
            (2, None, 4.0, "Z", 9),     # dup id, null name, bad domain,
                                        # n != len
        ],
        "id long, name string, val double, cat string, n long",
    )
    out = (
        CheckSuite()
        .is_complete("name")
        .is_unique("id")
        .has_min("val", gt=0)
        .is_in("cat", ["X", "Y"])
        .satisfies("n_matches_len", F.col("n") == F.length("name"))
        .run(df)
    )
    rows = {r["check_name"]: (r["metric"], r["passed"]) for r in out.collect()}
    assert rows["complete_name"] == (round(2 / 3, 6), 0)
    assert rows["unique_id"] == (round(2 / 3, 6), 0)
    assert rows["min_val"] == (-1.0, 0)
    assert rows["domain_cat"] == (1.0, 0)
    # row 3: NULL name -> predicate null -> violation; row 2: 2 != 1
    assert rows["n_matches_len"] == (2.0, 0)

    clean = spark.createDataFrame(
        [(1, "a", 5.0, "X", 1), (2, "bb", 4.0, "Y", 2)],
        "id long, name string, val double, cat string, n long",
    )
    out2 = (
        CheckSuite()
        .is_complete("name").is_unique("id").has_min("val", gt=0)
        .is_in("cat", ["X", "Y"])
        .satisfies("n_matches_len", F.col("n") == F.length("name"))
        .run(clean)
    )
    assert all(r["passed"] == 1 for r in out2.collect())
    # single-scan contract (final physical plan only — AQE's string
    # repeats the scan in its "Initial Plan" section)
    plan = out2._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") == 1

    import pytest as _pytest
    with _pytest.raises(ValueError, match="duplicate check name"):
        CheckSuite().is_complete("name").is_complete("name")
    with _pytest.raises(ValueError, match="empty"):
        CheckSuite().run(clean)


def test_drift_psi_detects_planted_shift(spark):
    """A type whose later-half values shift to a disjoint range gets a
    large PSI; a type with an identical distribution in both halves
    stays near zero (and below the conventional 0.1 alert line)."""
    import datetime as dt

    from dbt_nlp_sqlizer_team04_spark.operators.profiler import drift_psi

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(400):
        early = i < 200
        ts = base + dt.timedelta(hours=i)
        # stable: same uniform 0..100 pattern in both halves
        rows.append((eid, ts, 1, "stable", float(i % 100), None)); eid += 1
        # drifted: 0..100 early, 300..400 late (disjoint support)
        v = float(i % 100) if early else 300.0 + (i % 100)
        rows.append((eid, ts, 1, "drifted", v, None)); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r["event_type"]: r for r in drift_psi(df).collect()}
    assert out["stable"]["psi"] < 0.1
    assert out["drifted"]["psi"] > 1.0
    assert out["drifted"]["n_ref"] + out["drifted"]["n_cur"] == 400


def test_drift_psi_constant_value_feed_is_zero(spark):
    """A constant-valued feed (v1 == v0) must yield PSI = 0, not NULL
    buckets from a zero bucket width (the r5 ADVICE divide-by-zero)."""
    import datetime as dt

    from dbt_nlp_sqlizer_team04_spark.operators.profiler import drift_psi

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), 1, "flat", 42.0, None)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = drift_psi(df).collect()
    assert len(out) == 1
    assert out[0]["psi"] == 0.0
    assert out[0]["n_ref"] + out[0]["n_cur"] == 40


def test_fk_inference_self_named_id_pk():
    """Rule 2 resolves <entity>_id references against BOTH bare-id PKs
    (students.id) and self-named PKs (students.student_id) — the two
    Spider-style conventions; a bare-id stem never rides rule 1."""
    from dbt_nlp_sqlizer_team04_spark.catalog.metadata import (
        ColumnInfo, TableInfo,
    )
    from dbt_nlp_sqlizer_team04_spark.operators.profiler import (
        infer_relationships,
    )

    def t(name, cols, pk):
        infos = [
            ColumnInfo(name=c, type_str="bigint", nullable=False,
                       distinct_count=10, null_count=0)
            for c in cols
        ]
        for i in infos:
            i.is_primary_key = i.name in pk
        return TableInfo(name=name, columns=infos, primary_key=pk,
                         sample_rows=[], row_count=10)

    tables = {
        "students": t("students", ["student_id", "name"], ["student_id"]),
        "courses": t("courses", ["id", "title"], ["id"]),
        "enrollments": t(
            "enrollments",
            ["enroll_id", "student_id", "course_id"],
            ["enroll_id"],
        ),
    }
    rels = {
        (r.from_table, r.from_column, r.to_table, r.to_column)
        for r in infer_relationships(tables)
    }
    assert ("enrollments", "student_id", "students", "student_id") in rels
    assert ("enrollments", "course_id", "courses", "id") in rels
