"""Mimics the driver's correctness gate: run every queries() entry through
Spark and its oracle_sql() through DuckDB on the same parquet, compare
row-count + schema(column names) + order-insensitive values.

Runs at sf0.001 for speed; the driver runs sf0.01 — run the full
gate-scale sweep with:
    DP3_ORACLE_SF=/root/testdata/sf0.01 python -m pytest tests/test_oracle.py -q
"""

import math
import os

import duckdb
import pytest

from dp3_spark import queries as Q

SF_DIR = os.environ.get("DP3_ORACLE_SF", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def connect_duck(sf_dir: str):
    """DuckDB connection with the fixture tables as views.  Tables may be
    single parquet files (driver fixtures) or directories of part files
    (scale_gen output) — spark.read.parquet treats both the same, DuckDB
    needs the glob form for directories."""
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"create view {t} as select * from {src}")
    return con


@pytest.fixture(scope="module")
def duck():
    con = connect_duck(SF_DIR)
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


def _type_class(arrow_type) -> str:
    """Coarse type class used to mimic the driver's value-hash, which is
    dtype-sensitive: DuckDB HUGEINT (sum of BIGINT) surfaces as
    decimal128(38,0) in Arrow while Spark's bigint is int64 — the round-1
    hash failures were exactly this.  Map each arrow type to a class that
    must agree across engines."""
    import pyarrow as pa

    t = arrow_type
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "ts"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return "list<%s>" % _type_class(t.value_type)
    return str(t)


def compare_query_to_oracle(spark, duck, name, sf_dir):
    """Driver-gate-shaped compare at an arbitrary scale directory —
    shared by the gate-scale sweep below and the sf1 scale sweep
    (tests/test_oracle_sf1.py)."""
    fn = Q.queries()[name]
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(Q.oracle_sql()[name])
    dtab = res.fetch_arrow_table()
    dcols = dtab.column_names
    drows = [tuple(r.values()) for r in dtab.to_pylist()]

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    stypes = {f.name: _type_class(f.type) for f in sdf.toArrow().schema}
    dtypes = {f.name: _type_class(f.type) for f in dtab.schema}
    assert stypes == dtypes, (
        f"{name}: arrow type classes differ (driver hash is dtype-sensitive): "
        f"spark={stypes} duckdb={dtypes}"
    )
    assert len(srows) == len(drows), f"{name}: row counts differ {len(srows)} vs {len(drows)}"
    sn, dn = normalize(srows, scols), normalize(drows, dcols)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: first value mismatch {mismatches[0]}"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    compare_query_to_oracle(spark, duck, name, SF_DIR)


ROWS_ONLY = sorted(set(Q.queries()) - set(Q.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = Q.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
