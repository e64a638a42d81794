"""F2 (nested navsat schema), F3 (multi-producer / producer elimination),
and F5 (NaN-skipping stats) fixture tests — FIXTURES.md."""

import math

import pytest
from pyspark.sql import Row

from dp3_spark.catalog import LogStore
from dp3_spark.operators import stats as ST
from dp3_spark.plans import Compiler, FieldNotFoundError


@pytest.fixture(scope="module")
def navsat_store(spark):
    """FIXTURES.md F2: nested structs + fixed array, producer my-robot."""
    rows = []
    base = 1479512770309617340
    for i in range(20):
        rows.append(
            Row(
                producer="my-robot",
                topic="/fix",
                log_time=base + i * 100_000_000,
                sequence=i,
                header=Row(seq=i, stamp=base + i, frame_id="/imu" if i % 2 == 0 else "/gps"),
                status=Row(status=i % 3 - 1, service=1),
                latitude=37.4 + i * 1e-4,
                longitude=-122.1 - i * 1e-4,
                altitude=10.0 + i,
                position_covariance=[float(j + i) for j in range(9)],
                position_covariance_type=i % 4,
            )
        )
    df = spark.createDataFrame(rows)
    return LogStore(
        df=df,
        producer_col="producer",
        topic_col="topic",
        time_col="log_time",
        sequence_col="sequence",
        payload_cols=(
            "header", "status", "latitude", "longitude", "altitude",
            "position_covariance", "position_covariance_type",
        ),
    )


def test_unaliased_scan_rejects_foreign_alias(navsat_store):
    from dp3_spark.plans import CompileError

    with pytest.raises(CompileError, match="unresolved table alias: f"):
        Compiler(navsat_store).compile(
            "from my-robot /fix where f.header.frame_id = '/imu';"
        )


def test_nested_field_predicate_correct_alias(navsat_store):
    df = Compiler(navsat_store).compile(
        "from my-robot /fix as f where f.header.frame_id = '/imu';"
    )
    rows = df.collect()
    assert len(rows) == 10
    assert all(r["header"]["frame_id"] == "/imu" for r in rows)


def test_topic_name_as_qualifier(navsat_store):
    # unaliased scans use the topic name as the alias (plan.go nodeAlias)
    df = Compiler(navsat_store).compile("from my-robot /fix where /fix.altitude >= 25.0;")
    assert df.count() == 5


def test_fixed_array_element_predicate(navsat_store):
    df = Compiler(navsat_store).compile(
        "from my-robot /fix as f where f.position_covariance[3] > 12.0;"
    )
    got = sorted(r["sequence"] for r in df.collect())
    # pc[3] = 3 + i > 12 -> i >= 10
    assert got == list(range(10, 20))


def test_nested_int_field_typed(navsat_store):
    df = Compiler(navsat_store).compile(
        "from my-robot /fix as f where f.status.status = -1;"
    )
    assert df.count() == 7  # i % 3 == 0 for i in 0..19


def test_nested_missing_field_errors(navsat_store):
    with pytest.raises(FieldNotFoundError, match="available"):
        Compiler(navsat_store).compile("from my-robot /fix as f where f.header.nope = 1;")


# ---------------------------------------------------------- multi-producer

@pytest.fixture(scope="module")
def multi_store(spark):
    """F3: /t0 on both producers, /only2 only on device2."""
    rows = []
    for producer in ("device1", "device2"):
        for i in range(3):
            rows.append((producer, "/t0", i * 10, i, float(i)))
    for i in range(3):
        rows.append(("device2", "/only2", i * 10 + 5, i, float(i)))
    df = spark.createDataFrame(
        rows, "producer string, topic string, log_time long, sequence long, v double"
    )
    return LogStore(df, "producer", "topic", "log_time", "sequence", ("v",))


def test_from_star_merges_producers(multi_store):
    df = Compiler(multi_store).compile("from * /t0;")
    got = [(r["producer"], r["log_time"]) for r in df.collect()]
    # ties at equal log_time order by producer
    assert got == [
        ("device1", 0), ("device2", 0),
        ("device1", 10), ("device2", 10),
        ("device1", 20), ("device2", 20),
    ]


def test_from_star_producer_elimination(multi_store):
    # /only2 exists only on device2 (plan/plan.go:366-392)
    df = Compiler(multi_store).compile("from * /only2;")
    assert {r["producer"] for r in df.collect()} == {"device2"}


def test_explicit_producer_missing_topic_empty(multi_store):
    # we accept missing (producer, topic) as empty (documented superset of
    # the reference, which errors from the executor)
    df = Compiler(multi_store).compile("from device1 /only2;")
    assert df.count() == 0


def test_multi_producer_merge_and_asof(multi_store):
    df = Compiler(multi_store).compile(
        "from * /t0 precedes /only2 by less than 100 nanoseconds;"
    )
    rows = [(r["producer"], r["topic"], r["log_time"]) for r in df.collect()]
    # asof matches never cross producers: device1 has no /only2 -> no output
    assert all(p == "device2" for p, _, _ in rows)
    assert rows == [
        ("device2", "/t0", 0), ("device2", "/only2", 5),
        ("device2", "/t0", 10), ("device2", "/only2", 15),
        ("device2", "/t0", 20), ("device2", "/only2", 25),
    ]


# ----------------------------------------------------------------- F5 NaN

def test_stats_skip_nan(spark):
    rows = [("d", "/temp", i * 10**9, i, float(i) if i % 5 else float("nan"))
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "producer string, topic string, log_time long, sequence long, temperature double"
    )
    store = LogStore(df, "producer", "topic", "log_time", "sequence", ("temperature",))
    out = ST.stat_range(
        store, topic="/temp", start_ns=0, end_ns=10**12,
        granularity_ns=10**12, numeric_fields=["temperature"],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["message_count"] == 20
    assert r["temperature_count"] == 16  # NaNs at i=0,5,10,15 skipped
    vals = [float(i) for i in range(20) if i % 5]
    assert r["temperature_sum"] == sum(vals)
    assert r["temperature_min"] == min(vals) and r["temperature_max"] == max(vals)
    assert not math.isnan(r["temperature_mean"])
