"""Salted-join correctness: result equals the plain join, hot key spread
across salts."""

from pyspark.sql import functions as F

from dp3_spark.operators.skew import salted_join, top_keys


def test_salted_join_equals_plain_join(spark):
    # hot key: 90% of big rows share user 1
    big = spark.createDataFrame(
        [(1 if i % 10 else i, i) for i in range(2000)], "uid long, x long"
    )
    small = spark.createDataFrame([(i, f"u{i}") for i in range(200)], "uid long, name string")
    plain = {(r["uid"], r["x"], r["name"]) for r in big.join(small, "uid").collect()}
    salted = {(r["uid"], r["x"], r["name"])
              for r in salted_join(big, small, ["uid"], salt_factor=8).collect()}
    assert salted == plain
    assert len(salted) == 1820  # 1800 hot-key rows + 20 cold multiples of 10 < 200


def test_salted_left_join(spark):
    big = spark.createDataFrame([(1, 10), (2, 20), (99, 30)], "uid long, x long")
    small = spark.createDataFrame([(1, "a"), (2, "b")], "uid long, name string")
    out = {(r["uid"], r["name"]) for r in salted_join(big, small, ["uid"], how="left").collect()}
    assert out == {(1, "a"), (2, "b"), (99, None)}


def test_salted_join_rejects_outer(spark):
    import pytest

    big = spark.createDataFrame([(1, 10)], "uid long, x long")
    small = spark.createDataFrame([(1, "a")], "uid long, name string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, ["uid"], how=how)


def test_top_keys_detects_hot_key(spark):
    big = spark.createDataFrame(
        [(1 if i % 10 else i, i) for i in range(5000)], "uid long, x long"
    )
    hot = top_keys(big, ["uid"], fraction=0.2, limit=3)
    assert hot[0][0] == 1  # uid 1 dominates
    assert hot[0][1] > 1000
