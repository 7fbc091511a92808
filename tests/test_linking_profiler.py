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
