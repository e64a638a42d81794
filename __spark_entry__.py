"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (as-of join through the QL compiler) on
                 /root/testdata/sf0.001.
queries()      — one entry per implemented operator from SURVEY.md §2 plus
                 the beyond-reference LLM-pipeline operators
                 (dp3_spark/queries.py registry).
oracle_sql()   — DuckDB-equivalent SQL per query (engineered to hash-match:
                 µs-aligned int64 times, decimal-exact float aggregates,
                 identical aliases).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dp3_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multiplexed as-of join on the events stream via the dp3
    query language -> Catalyst."""
    return Q.ql_asof_precedes(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
