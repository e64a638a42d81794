"""Vector math over array<float> embedding columns — pure built-in
functions (zip_with/aggregate fold inside whole-stage codegen), no UDFs.

Every primitive is a (spark_sql, duckdb_sql) pair with identical
left-to-right double-precision folds, so cosine similarities are
bit-identical between the engine and the DuckDB oracle.
"""

from __future__ import annotations


def dot(a: str, b: str) -> tuple[str, str]:
    spark = (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )
    duck = (
        f"list_reduce(list_prepend(cast(0.0 as double), "
        f"list_transform(range(1, len({a})+1), i -> cast({a}[i] as double) * cast({b}[i] as double))), "
        f"(acc, v) -> acc + v)"
    )
    return spark, duck


def d2(a: str, b: str) -> tuple[str, str]:
    """Squared L2 distance, same left-to-right fold shape as dot() — the
    assignment metric for quantizers (IVF/PQ), bit-identical across engines."""
    spark = (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"(cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )
    duck = (
        f"list_reduce(list_prepend(cast(0.0 as double), "
        f"list_transform(range(1, len({a})+1), i -> "
        f"(cast({a}[i] as double) - cast({b}[i] as double)) * "
        f"(cast({a}[i] as double) - cast({b}[i] as double)))), "
        f"(acc, v) -> acc + v)"
    )
    return spark, duck


def norm(a: str) -> tuple[str, str]:
    s, d = dot(a, a)
    return f"sqrt({s})", f"sqrt({d})"


def cosine(a: str, b: str) -> tuple[str, str]:
    dot_s, dot_d = dot(a, b)
    na_s, na_d = norm(a)
    nb_s, nb_d = norm(b)
    return (
        f"({dot_s}) / (({na_s}) * ({nb_s}))",
        f"({dot_d}) / (({na_d}) * ({nb_d}))",
    )
