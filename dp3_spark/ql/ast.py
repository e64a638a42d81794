"""AST dataclasses for the dp3 query language.

Shapes mirror the reference grammar (server/ql/grammar.go:39-188) but are
plain Python dataclasses; the select tree is normalized at parse time into
Scan / MergeJoin / AsofJoin nodes (the reference does this during planning,
plan/plan.go:219-232).

Grammar surface (SURVEY.md §2.3):

    [explain] from <producer|*>[, ...] [between T and T]
        topic [as alias]
        ( , topic [as alias] )*
      | (precedes|succeeds|neighbors) [immediate] topic [by less than N unit]
    [where expr]* [desc] [limit N] [offset N] ;

    truncate <producer> <topic> (now|T) ;
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal as TLiteral, Optional, Union

# ---------------------------------------------------------------- expressions


@dataclass(frozen=True)
class Literal:
    kind: TLiteral["string", "int", "float", "bool"]
    value: object


@dataclass(frozen=True)
class BinaryExpr:
    """field <op> literal.  op in {=, !=, <, <=, >, >=, ~, ~*}.

    `field` is the raw dotted path as written, e.g. "t.sub.value" or
    "t.position_covariance[3]" — alias resolution happens in the compiler
    (reference resolves at plan time, plan/plan.go:297-301)."""

    field: str
    op: str
    value: Literal


@dataclass(frozen=True)
class BoolExpr:
    """n-ary and/or node.  `and` binds tighter than `or` (grammar.go:77-93).

    `grouped` marks a parenthesized subexpression: the planner splits only
    UNgrouped top-level OR branches per alias — `(a.x = 1 or b.y = 2)` is
    one branch and errors with "more than one alias" (plan_test.go:30-34),
    while the same expression without parens splits."""

    op: TLiteral["and", "or"]
    children: tuple[Expr, ...]
    grouped: bool = False


Expr = Union[BinaryExpr, BoolExpr]

# ---------------------------------------------------------------- select tree


@dataclass(frozen=True)
class Scan:
    topic: str
    alias: Optional[str] = None

    @property
    def name(self) -> str:
        return self.alias or self.topic


@dataclass(frozen=True)
class MergeJoin:
    """n-ary log-time-ordered union (comma in the QL).  Tie order follows
    child listing order (merge_node.go:46-53)."""

    children: tuple[SelectNode, ...]


@dataclass(frozen=True)
class AsofJoin:
    """precedes/succeeds [immediate] ... [by less than N unit].

    keyword semantics (executor/executor.go:155-211): `succeeds` swaps the
    children; `neighbors` parses but is unimplemented.  threshold_ns == 0
    means unbounded."""

    keyword: TLiteral["precedes", "succeeds", "neighbors"]
    left: SelectNode
    right: SelectNode
    immediate: bool = False
    threshold_ns: int = 0


SelectNode = Union[Scan, MergeJoin, AsofJoin]

# ---------------------------------------------------------------- statements


@dataclass(frozen=True)
class Between:
    start_ns: int
    end_ns: int


@dataclass(frozen=True)
class Query:
    producers: tuple[str, ...]  # empty tuple means `from *`
    select: SelectNode
    between: Optional[Between] = None
    where: Optional[Expr] = None
    descending: bool = False
    limit: Optional[int] = None
    offset: Optional[int] = None
    explain: bool = False

    @property
    def all_producers(self) -> bool:
        return len(self.producers) == 0


@dataclass(frozen=True)
class Truncate:
    producer: str
    topic: str
    timestamp_ns: Optional[int] = None  # None means `now`


@dataclass(frozen=True)
class Statement:
    query: Optional[Query] = None
    truncate: Optional[Truncate] = None


UNIT_NS = {
    # executor/executor.go:177-183
    "nanoseconds": 1,
    "microseconds": 1_000,
    "milliseconds": 1_000_000,
    "seconds": 1_000_000_000,
    "minutes": 60_000_000_000,
}


def scans(node: SelectNode) -> list[Scan]:
    """All leaf scans of a select tree, in listing order."""
    if isinstance(node, Scan):
        return [node]
    if isinstance(node, MergeJoin):
        out: list[Scan] = []
        for c in node.children:
            out.extend(scans(c))
        return out
    if isinstance(node, AsofJoin):
        return scans(node.left) + scans(node.right)
    raise TypeError(f"unknown select node {node!r}")
