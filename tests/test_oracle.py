"""Mimics the driver's correctness gate: run every queries() entry through
Spark and its oracle_sql() through DuckDB on the same parquet, compare
row-count + schema(column names) + order-insensitive values.

Runs at sf0.001 for speed; the driver runs sf0.01 — scripts/oracle_check.py
runs the full sf0.01 sweep.
"""

import math
import os

import duckdb
import pytest

from dp3_spark import queries as Q

SF_DIR = os.environ.get("DP3_ORACLE_SF", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return float(v)
        if hasattr(v, "item"):
            return v.item()
        return v

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


ORACLE_QUERIES = sorted(Q.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    fn = Q.queries()[name]
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(Q.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row counts differ {len(srows)} vs {len(drows)}"
    sn, dn = normalize(srows, scols), normalize(drows, dcols)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: first value mismatch {mismatches[0]}"


ROWS_ONLY = sorted(set(Q.queries()) - set(Q.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = Q.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
