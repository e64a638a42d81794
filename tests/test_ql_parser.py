"""Parser tests mirroring the reference grammar tests
(server/ql/grammar_test.go:16-177, :480-760) in spirit."""

import pytest

from dp3_spark.ql import ast, parse
from dp3_spark.ql.parser import QLParseError, parse_iso8601_ns


def q(src):
    stmt = parse(src)
    assert stmt.query is not None
    return stmt.query


def test_basic_scan():
    query = q("from device t0;")
    assert query.producers == ("device",)
    assert query.select == ast.Scan("t0")
    assert not query.descending and query.limit is None


def test_star_producer():
    assert q("from * /fix;").all_producers


def test_multi_producer():
    assert q("from a, b /fix;").producers == ("a", "b")


def test_topic_with_slash_and_alias():
    s = q("from device /diagnostics as d;").select
    assert s == ast.Scan("/diagnostics", "d")


def test_between_integers():
    b = q("from device between 10 and 100 t0;").between
    assert (b.start_ns, b.end_ns) == (10, 100)


def test_between_iso8601():
    b = q("from device between '2024-01-01T00:00:00Z' and '2024-01-02' t0;").between
    assert b.start_ns == 1704067200 * 10**9
    assert b.end_ns == 1704153600 * 10**9


def test_iso8601_fractional_ns():
    assert parse_iso8601_ns("1970-01-01T00:00:01.5Z") == 1_500_000_000
    assert parse_iso8601_ns("1970-01-01T00:00:00.000000001Z") == 1


def test_merge_join():
    s = q("from device t0, t1, t2;").select
    assert isinstance(s, ast.MergeJoin)
    assert [c.topic for c in s.children] == ["t0", "t1", "t2"]


def test_asof_precedes_with_threshold():
    s = q("from device t0 precedes t1 by less than 10 seconds;").select
    assert isinstance(s, ast.AsofJoin)
    assert s.keyword == "precedes" and not s.immediate
    assert s.threshold_ns == 10 * 10**9
    assert s.left == ast.Scan("t0") and s.right == ast.Scan("t1")


def test_asof_succeeds_immediate():
    s = q("from device t0 succeeds immediate t1;").select
    assert s.keyword == "succeeds" and s.immediate and s.threshold_ns == 0


def test_asof_units():
    for unit, ns in ast.UNIT_NS.items():
        s = q(f"from device a precedes b by less than 2 {unit};").select
        assert s.threshold_ns == 2 * ns


def test_where_precedence_and_binds_tighter():
    w = q("from device t0 where t0.a = 1 or t0.b = 2 and t0.c = 3;").where
    assert isinstance(w, ast.BoolExpr) and w.op == "or"
    assert isinstance(w.children[0], ast.BinaryExpr)
    assert isinstance(w.children[1], ast.BoolExpr) and w.children[1].op == "and"


def test_where_parens():
    w = q("from device t0 where (t0.a = 1 or t0.b = 2) and t0.c = 3;").where
    assert isinstance(w, ast.BoolExpr) and w.op == "and"


def test_where_operators_and_literals():
    w = q("from device t0 where t0.s ~* 'He..o' and t0.f <= -1.5 and t0.b != true;").where
    ops = [c.op for c in w.children]
    assert ops == ["~*", "<=", "!="]
    kinds = [c.value.kind for c in w.children]
    assert kinds == ["string", "float", "bool"]


def test_string_escape():
    w = q(r"from device t0 where t0.s = 'it\'s';").where
    assert w.value.value == "it's"


def test_nested_field_and_array_path():
    w = q("from device f where f.position_covariance[3] > 0.5;").where
    assert w.field == "f.position_covariance[3]"


def test_multiple_where_clauses_anded():
    w = q("from device t0 where t0.a = 1 where t0.b = 2;").where
    assert isinstance(w, ast.BoolExpr) and w.op == "and"


def test_desc_limit_offset():
    query = q("from device t0 desc limit 10 offset 5;")
    assert query.descending and query.limit == 10 and query.offset == 5


def test_explain():
    assert q("explain from device t0;").explain


def test_truncate_now():
    t = parse("truncate device t0 now;").truncate
    assert t == ast.Truncate("device", "t0", None)


def test_truncate_timestamp():
    t = parse("truncate device t0 1000;").truncate
    assert t.timestamp_ns == 1000


def test_missing_semicolon():
    with pytest.raises(QLParseError):
        parse("from device t0")


def test_bad_unit():
    with pytest.raises(QLParseError):
        parse("from device a precedes b by less than 2 hours;")


def test_merge_then_asof_shape():
    s = q("from device t0, t1 precedes t2;").select
    assert isinstance(s, ast.MergeJoin)
    assert isinstance(s.children[0], ast.Scan)
    assert isinstance(s.children[1], ast.AsofJoin)
