"""dp3_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of wkalt/dp3 (a multimodal log database for
robotics sensor logs), rebuilt Spark-first.

Layout:
    session    — SparkSession bootstrap tuned for local[N] and cluster use
    catalog    — table registration over driver parquet fixtures / log stores
    ql         — dp3 query-language parser (AST per reference ql/grammar.go)
    plans      — AST -> DataFrame compiler (Catalyst does optimization)
    operators  — as-of join, ordered merge, dedup family, similarity, stats
    functions  — text analysis, vector math (all JVM-side built-ins)
    sources    — MCAP-shaped log source plumbing (decode stubbed)
    streaming  — Structured Streaming ingest with dedup + summary maintenance
"""

from dp3_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
