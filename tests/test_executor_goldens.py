"""End-to-end QL goldens ported from the reference executor tests
(server/executor/executor_test.go:27-241) over the F1 alltypes fixture.

Each case asserts the exact (topic, log_time) output sequence, including
merge/asof tie order.
"""

import pytest

from dp3_spark.plans import CompileError, Compiler, FieldNotFoundError

JOIN_CASES = [
    ("basic scan", "from device t0;",
     [("t0", 0), ("t0", 1), ("t0", 2), ("t0", 3), ("t0", 4)]),
    ("scan matching no data", "from device t0 where t0.u8 = 100;", []),
    ("basic descending scan", "from device t0 desc;",
     [("t0", 4), ("t0", 3), ("t0", 2), ("t0", 1), ("t0", 0)]),
    ("basic merge join", "from device t0, t1;",
     [("t0", 0), ("t1", 0), ("t0", 1), ("t0", 2), ("t1", 2),
      ("t0", 3), ("t0", 4), ("t1", 4), ("t1", 6), ("t1", 8)]),
    ("merge join with where clause on one element",
     "from device t0, t1 where t1.u8 = 0;",
     [("t0", 0), ("t1", 0), ("t0", 1), ("t0", 2), ("t0", 3), ("t0", 4)]),
    ("merge join with where clause on both elements",
     "from device t0, t1 where t0.u8 = 0 or t1.u8 = 0;",
     [("t0", 0), ("t1", 0)]),
    ("asof join precedes",
     "from device t0 precedes t1 by less than 2 nanoseconds;",
     [("t0", 0), ("t1", 0), ("t0", 2), ("t1", 2), ("t0", 4), ("t1", 4)]),
    ("asof join succeeds",
     "from device t0 succeeds t1 by less than 2 nanoseconds;",
     [("t1", 0), ("t0", 0), ("t0", 1), ("t1", 2), ("t0", 2), ("t0", 3),
      ("t1", 4), ("t0", 4)]),
    ("asof join with precedes without immediate",
     "from device t1 precedes t8 by less than 100 nanoseconds;",
     [("t1", 0), ("t8", 0), ("t1", 8), ("t8", 9), ("t8", 18), ("t8", 27), ("t8", 36)]),
    ("asof join with precedes with immediate",
     "from device t1 precedes immediate t8 by less than 100 nanoseconds;",
     [("t1", 0), ("t8", 0), ("t1", 8), ("t8", 9)]),
    ("asof join with where clause",
     "from device t0 precedes immediate t1 by less than 10 nanoseconds where t0.u8 = 0;",
     [("t0", 0), ("t1", 0)]),
    ("merge join with alias",
     "from device t0 as a, t1 as b where a.u8 = 0 or b.u8 = 0;",
     [("t0", 0), ("t1", 0)]),
    ("merge join one alias one not",
     "from device t0 as a, t1 where a.u8 = 0 or t1.u8 = 0;",
     [("t0", 0), ("t1", 0)]),
    ("asof join with alias",
     "from device t0 as a precedes t1 as b by less than 10 nanoseconds "
     "where a.u8 = 0 or b.u8 = 0;",
     [("t0", 0), ("t1", 0)]),
    ("limit",
     "from device t0 as a precedes t1 as b by less than 10 nanoseconds "
     "where a.u8 = 0 or b.u8 = 0 limit 1;",
     [("t0", 0)]),
    ("offset",
     "from device t0 as a precedes t1 as b by less than 10 nanoseconds "
     "where a.u8 = 0 or b.u8 = 0 offset 1;",
     [("t1", 0)]),
    ("from star expands producers", "from * t0 limit 2;",
     [("t0", 0), ("t0", 1)]),
    ("unbounded asof (no threshold)",
     "from device t1 precedes t8;",
     # t=0 is unbounded: every right after a left matches the latest left
     [("t1", 0), ("t8", 0), ("t1", 8), ("t8", 9), ("t8", 18), ("t8", 27), ("t8", 36)]),
    ("between is half-open", "from device between 1 and 4 t0;",
     [("t0", 1), ("t0", 2), ("t0", 3)]),
]


@pytest.mark.parametrize("name,query,expected", JOIN_CASES, ids=[c[0] for c in JOIN_CASES])
def test_join_scenarios(alltypes_store, name, query, expected):
    df = Compiler(alltypes_store).compile(query)
    got = [(r["topic"], r["log_time"]) for r in df.collect()]
    assert got == expected


# --- string comparison goldens (executor_test.go:149-185) -------------------
STRING_CASES = [
    ("=", "'hello'", [0, 1, 2, 3, 4]),
    ("<", "'i'", [0, 1, 2, 3, 4]),
    (">", "'g'", [0, 1, 2, 3, 4]),
    ("<=", "'hello'", [0, 1, 2, 3, 4]),
    (">=", "'hello'", [0, 1, 2, 3, 4]),
    ("!=", "'hello'", []),
    ("~", "'h.*o'", [0, 1, 2, 3, 4]),
    ("~", "'^ello'", []),
    ("~*", "'HELLO'", [0, 1, 2, 3, 4]),
]


@pytest.mark.parametrize("op,lit,expected", STRING_CASES)
def test_string_ops(alltypes_store, op, lit, expected):
    df = Compiler(alltypes_store).compile(f"from device t0 where t0.s {op} {lit};")
    assert [r["log_time"] for r in df.collect()] == expected


# --- numeric type x operator matrix (executor_test.go:187-241) --------------
NUMERIC_FIELDS = ["u8", "u16", "u32", "u64", "i8", "i16", "i32", "i64", "f32", "f64"]
OP_EXPECT = {
    "=": [1],
    "<": [0],
    ">": [2, 3, 4],
    "<=": [0, 1],
    ">=": [1, 2, 3, 4],
    "!=": [0, 2, 3, 4],
}


@pytest.mark.parametrize("field", NUMERIC_FIELDS)
def test_numeric_op_matrix(alltypes_store, field):
    compiler = Compiler(alltypes_store)
    for op, expected in OP_EXPECT.items():
        df = compiler.compile(f"from device t0 where t0.{field} {op} 1;")
        got = sorted(r["log_time"] for r in df.collect())
        assert got == expected, f"{field} {op} 1"


# --- error semantics (SURVEY.md §2.3) ---------------------------------------
def test_unknown_field_errors(alltypes_store):
    with pytest.raises(FieldNotFoundError):
        Compiler(alltypes_store).compile("from device t0 where t0.nope = 1;")


def test_unqualified_field_errors(alltypes_store):
    with pytest.raises(CompileError, match="qualified with a dot"):
        Compiler(alltypes_store).compile("from device t0 where u8 = 1;")


def test_unknown_alias_errors(alltypes_store):
    with pytest.raises(CompileError, match="unresolved table alias: zz"):
        Compiler(alltypes_store).compile("from device t0 where zz.u8 = 1;")


def test_multi_alias_conjunct_errors(alltypes_store):
    with pytest.raises(CompileError, match="more than one alias"):
        Compiler(alltypes_store).compile("from device t0, t1 where t0.u8 = 1 and t1.u8 = 2;")


def test_grouped_or_spanning_aliases_errors(alltypes_store):
    # plan_test.go:30-34: parens make the OR a single branch -> error
    with pytest.raises(CompileError, match="more than one alias"):
        Compiler(alltypes_store).compile("from device t0, t1 where (t0.u8 = 0 or t1.u8 = 0);")


def test_grouped_or_single_alias_ok(alltypes_store):
    df = Compiler(alltypes_store).compile(
        "from device t0, t1 where (t0.u8 = 0 or t0.u8 = 1) and t0.u8 <= 4;"
    )
    got = [(r["topic"], r["log_time"]) for r in df.collect()]
    # t0 filtered to u8 in {0,1}; t1 unfiltered
    assert [g for g in got if g[0] == "t0"] == [("t0", 0), ("t0", 1)]
    assert len([g for g in got if g[0] == "t1"]) == 5


def test_partly_unqualified_where_errors(alltypes_store):
    with pytest.raises(CompileError, match="must be qualified with a dot"):
        Compiler(alltypes_store).compile("from device t0 where t0.u8 = 1 and u16 = 2;")


def test_alias_shadowing_errors(alltypes_store):
    # plan_test.go: "from device a as b where a.foo = 10 and b.bar = 20"
    with pytest.raises(CompileError, match="more than one alias"):
        Compiler(alltypes_store).compile("from device t0 as b where t0.u8 = 1 and b.u16 = 2;")


def test_int_field_float_literal_errors(alltypes_store):
    with pytest.raises(CompileError):
        Compiler(alltypes_store).compile("from device t0 where t0.u8 = 1.5;")


def test_float_field_int_literal_ok(alltypes_store):
    df = Compiler(alltypes_store).compile("from device t0 where t0.f64 = 1;")
    assert [r["log_time"] for r in df.collect()] == [1]


def test_regex_on_numeric_errors(alltypes_store):
    with pytest.raises(CompileError):
        Compiler(alltypes_store).compile("from device t0 where t0.u8 ~ 'x';")


def test_neighbors_not_implemented(alltypes_store):
    with pytest.raises(NotImplementedError):
        Compiler(alltypes_store).compile("from device t0 neighbors t1;")


def test_explain_returns_plan(alltypes_store):
    df = Compiler(alltypes_store).compile("explain from device t0;")
    text = "\n".join(r["plan"] for r in df.collect())
    assert "Physical Plan" in text
    # nodestats parity (executor/nodestats.go): explain executes the query
    # and reports per-operator runtime metrics
    assert "Node Stats (executed)" in text
    assert "rows=" in text


def test_explain_node_stats_merge_asof(alltypes_store):
    """Golden for the metrics harvest on a merge+asof pipeline: every
    operator row has id/depth/operator/metrics, the sort that implements
    the ordered merge reports its output rows, and the scan row count
    matches the fixture."""
    from dp3_spark.plans.nodestats import executed_node_stats

    c = Compiler(alltypes_store)
    df = c.compile("from device t0 precedes t1 by less than 2 nanoseconds;")
    stats = executed_node_stats(df)
    ops = [s["operator"] for s in stats]
    assert any(o.startswith("Scan") for o in ops)
    assert any("Sort" in o for o in ops)
    for s in stats:
        assert isinstance(s["metrics"], dict)
        assert s["node_id"] >= 0 and s["depth"] >= 0
    # root tuplesOut: the asof result for this query is 6 rows (JOIN_CASES)
    assert stats[0]["operator"] == "Result" and stats[0]["rows"] == 6
    # scan tuplesOut: full fixture is 10 topics x 5 messages
    scans = [s for s in stats if s["operator"].startswith("Scan")]
    assert scans and all(s["rows"] == 50 for s in scans)
    # per-topic filters under the scans emit 5 rows each
    assert [s["rows"] for s in stats if s["operator"] == "Filter" and s["rows"] == 5]
