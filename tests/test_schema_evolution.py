"""F3 schema evolution: one topic, schema v1 (value) then v2 (value, extra)
— mixed-schema scans are legal in the reference (treemgr_test.go:394-456);
Spark realizes them as union-by-name with nulls for missing columns plus a
schema_hash column distinguishing generations (SURVEY.md §1.3)."""

import pytest
from pyspark.sql import functions as F

from dp3_spark.catalog import LogStore
from dp3_spark.plans import Compiler
from dp3_spark.sources.mcap import schema_hash


@pytest.fixture(scope="module")
def evolving_store(spark):
    h1 = schema_hash(b"value double")
    h2 = schema_hash(b"value double, extra string")
    v1 = spark.createDataFrame(
        [("dev", "/evolving", i * 10**9, i, float(i), None, h1) for i in range(100)],
        "producer string, topic string, log_time long, sequence long, "
        "value double, extra string, schema_hash string",
    )
    v2 = spark.createDataFrame(
        [("dev", "/evolving", (100 + i) * 10**9, 100 + i, float(i), f"x{i}", h2)
         for i in range(100)],
        v1.schema,
    )
    df = v1.unionByName(v2)
    return LogStore(df, "producer", "topic", "log_time", "sequence",
                    ("value", "extra", "schema_hash"))


def test_mixed_schema_scan_returns_all(evolving_store):
    df = Compiler(evolving_store).compile("from dev /evolving;")
    assert df.count() == 200
    assert df.filter(F.col("extra").isNull()).count() == 100


def test_filter_on_new_field_excludes_old_generation(evolving_store):
    """Superset semantics: the reference hard-errors when a filtered field
    is missing from an observed schema (FieldNotFoundError per schema);
    Spark's null semantics exclude those rows instead — documented."""
    df = Compiler(evolving_store).compile("from dev /evolving as e where e.extra = 'x5';")
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["sequence"] == 105


def test_per_schema_statistics(evolving_store):
    """Per-schema-hash stats grouping (nodestore statistics keyed by schema
    hash, nodestore/inner_node.go:32-46)."""
    per_schema = (
        evolving_store.normalized()
        .groupBy("schema_hash")
        .agg(F.count("*").alias("n"), F.min("log_time").alias("mn"))
        .collect()
    )
    assert sorted(r["n"] for r in per_schema) == [100, 100]


def test_summarize_groups_by_schema_hash(evolving_store):
    """summarize(schema_hash_col=...) keys stats per generation and
    rollup_summary preserves the schema_hash key when re-bucketing."""
    from dp3_spark.operators import stats as ST

    hourly = ST.summarize(
        evolving_store,
        granularity_ns=60 * 10**9,
        numeric_fields=["value"],
        group_by_producer=False,
        schema_hash_col="schema_hash",
    )
    assert "schema_hash" in hourly.columns
    per = (
        hourly.groupBy("schema_hash")
        .agg(F.sum("message_count").alias("n"), F.sum("value_count").alias("vc"))
        .collect()
    )
    assert sorted(r["n"] for r in per) == [100, 100]
    daily = ST.rollup_summary(
        hourly,
        from_granularity_ns=60 * 10**9,
        to_granularity_ns=3600 * 10**9,
        numeric_fields=["value"],
    )
    assert "schema_hash" in daily.columns
    assert daily.groupBy("schema_hash").count().count() == 2
    # merged totals survive the rollup per generation
    tot = {r["schema_hash"]: r["n"] for r in daily.groupBy("schema_hash")
           .agg(F.sum("message_count").alias("n")).collect()}
    assert sorted(tot.values()) == [100, 100]


def test_merge_with_other_topic_mixed_schema(spark, evolving_store):
    df = Compiler(evolving_store).compile("from dev /evolving where /evolving.value < 3.0;")
    # both generations contribute value<3: v1 seq 0,1,2 and v2 seq 100,101,102
    assert sorted(r["sequence"] for r in df.collect()) == [0, 1, 2, 100, 101, 102]
