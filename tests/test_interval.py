"""Interval overlap join (operators/interval.py): randomized equivalence
vs the naive theta join, boundary semantics, exactly-once emission; plus
components.keep_best canonical selection."""

import random

import pytest
from pyspark.sql import functions as F

from dp3_spark.operators import components as CC
from dp3_spark.operators import interval as IV


def _naive(spark, a_rows, b_rows):
    """Reference: all pairs, half-open overlap predicate."""
    out = set()
    for ia, (sa, ea) in a_rows:
        for ib, (sb, eb) in b_rows:
            if sa < eb and sb < ea:
                out.add((ia, ib))
    return out


def _frames(spark, a_rows, b_rows):
    a = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in a_rows], "aid long, a_s long, a_e long"
    )
    b = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in b_rows], "bid long, b_s long, b_e long"
    )
    return a, b


@pytest.mark.parametrize("cell", [7, 100, 1000])
def test_overlap_join_matches_naive(spark, cell):
    rng = random.Random(42)
    a_rows = [
        (i, (s := rng.randrange(0, 5000), s + rng.randrange(0, 400)))
        for i in range(120)
    ]
    b_rows = [
        (i, (s := rng.randrange(0, 5000), s + rng.randrange(0, 80)))
        for i in range(150)
    ]
    a, b = _frames(spark, a_rows, b_rows)
    got = IV.overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", cell=cell)
    rows = got.select("aid", "bid").collect()
    pairs = [(r["aid"], r["bid"]) for r in rows]
    # exactly-once: no pair emitted twice (the first-shared-cell rule)
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == _naive(spark, a_rows, b_rows)


def test_overlap_join_boundaries(spark):
    # half-open: touching intervals do NOT overlap; zero-length interval
    # matches only strict interiors; containment + identity match.
    a_rows = [
        (0, (10, 20)),   # vs b0 [20,30): touch -> no
        (1, (10, 20)),   # vs b1 [15,16): contained -> yes
        (2, (50, 50)),   # zero length at 50
        (3, (0, 100)),
    ]
    b_rows = [
        (0, (20, 30)),
        (1, (15, 16)),
        (2, (40, 60)),   # contains point 50 strictly -> matches a2
        (3, (50, 50)),   # zero vs zero -> no
        (4, (0, 100)),   # identical to a3 -> yes
    ]
    a, b = _frames(spark, a_rows, b_rows)
    got = {
        (r["aid"], r["bid"])
        for r in IV.overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", cell=8).collect()
    }
    assert got == _naive(spark, a_rows, b_rows)
    assert (0, 0) not in got and (2, 2) in got and (2, 3) not in got


def test_overlap_join_rejects_bad_cell(spark):
    a, b = _frames(spark, [(0, (0, 1))], [(0, (0, 1))])
    with pytest.raises(ValueError):
        IV.overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", cell=0)


def test_keep_best_picks_highest_score_then_smallest_id(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 5), (9, 7)],
        "doc_id long, n_chars long",
    )
    clusters = spark.createDataFrame(
        # cluster 1 = {1,2,3}; cluster 4 = {4}; cluster 9 = {9}
        [(1, 1, 3), (2, 1, 3), (3, 1, 3), (4, 4, 1), (9, 9, 1)],
        "doc_id long, component long, cluster_size long",
    )
    out = {
        r["doc_id"]: r["keep"]
        for r in CC.keep_best(clusters, docs, "n_chars").collect()
    }
    # 2 and 3 tie on score 99 -> smaller id 2 wins; singletons keep
    assert out == {1: False, 2: True, 3: False, 4: True, 9: True}


def test_overlap_join_ns_epoch_boundaries_exact(spark):
    """Regression: cell assignment must use exact int64 floor division.
    ns epochs (~2^60) exceed double's 53-bit mantissa, so a `/`-based
    floor can misplace bounds sitting exactly on a cell boundary."""
    H = 3_600_000_000_000  # 1h in ns
    T = 1_705_406_400_000_000_000  # exact hour boundary
    a_rows = [
        (0, (T, T + H)),          # exactly one cell
        (1, (T - 1, T + 1)),      # straddles the boundary
        (2, (T + H, T + H)),      # zero-length on a boundary
    ]
    b_rows = [
        (0, (T + H, T + 2 * H)),  # touches a0 -> no overlap
        (1, (T, T + H)),          # identical to a0 -> yes
        (2, (T - H, T)),          # ends exactly at T -> no overlap w/ a0
        (3, (T + H - 1, T + H + 1)),  # strictly contains a2's point
    ]
    a, b = _frames(spark, a_rows, b_rows)
    got = {
        (r["aid"], r["bid"])
        for r in IV.overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", cell=H).collect()
    }
    assert got == _naive(spark, a_rows, b_rows)
    assert (0, 0) not in got and (0, 1) in got and (0, 2) not in got
    assert (2, 3) in got and (2, 0) not in got


def test_overlap_join_auto_cell_matches_naive(spark):
    rng = random.Random(7)
    a_rows = [
        (i, (s := rng.randrange(0, 3000), s + rng.randrange(0, 500)))
        for i in range(80)
    ]
    b_rows = [(i, (s := rng.randrange(0, 3000), s + 40)) for i in range(90)]
    a, b = _frames(spark, a_rows, b_rows)
    got = {
        (r["aid"], r["bid"])
        for r in IV.overlap_join(a, b, "a_s", "a_e", "b_s", "b_e").collect()
    }
    assert got == _naive(spark, a_rows, b_rows)
    c = IV.auto_cell(a, b, "a_s", "a_e", "b_s", "b_e")
    assert c >= 40  # at least the short side's fixed length


def test_overlap_join_rejects_shared_or_reserved_columns(spark):
    a = spark.createDataFrame([(0, 1, 2)], "x long, a_s long, a_e long")
    b = spark.createDataFrame([(0, 1, 2)], "x long, b_s long, b_e long")
    with pytest.raises(ValueError, match="disjoint"):
        IV.overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", cell=8)
    a2 = spark.createDataFrame([(0, 1, 2)], "_cell long, a_s long, a_e long")
    b2 = spark.createDataFrame([(0, 1, 2)], "bid long, b_s long, b_e long")
    with pytest.raises(ValueError, match="reserved"):
        IV.overlap_join(a2, b2, "a_s", "a_e", "b_s", "b_e", cell=8)
