from dp3_spark.ql.ast import (
    AsofJoin,
    Between,
    BinaryExpr,
    BoolExpr,
    Literal,
    MergeJoin,
    Query,
    Scan,
    Statement,
    Truncate,
)
from dp3_spark.ql.parser import QLParseError, parse

__all__ = [
    "AsofJoin",
    "Between",
    "BinaryExpr",
    "BoolExpr",
    "Literal",
    "MergeJoin",
    "Query",
    "Scan",
    "Statement",
    "Truncate",
    "QLParseError",
    "parse",
]
