"""Trigram-signature string pruning (operators/trigram.py) — parity with
the reference statfilter's trigram index (server/util/trigram/trigram.go,
server/executor/statfilter.go:102-127): build a per-file signature
sidecar, probe equality/substring needles, assert files are actually
skipped AND results are identical to the unpruned scan."""

import os

import pytest
from pyspark.sql import functions as F

from dp3_spark.operators import trigram as TG


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """Four files, each holding one distinct city block — bounds overlap
    lexically so min/max alone cannot separate needles INSIDE the range
    (the case the trigram bits exist for)."""
    root = tmp_path_factory.mktemp("tg")
    tbl = os.path.join(root, "tbl")
    idx = os.path.join(root, "idx")
    blocks = [
        ["amsterdam", "athens", "austin"],
        ["berlin", "boston", "bristol"],
        ["calgary", "chicago", "cologne"],
        ["denver", "dublin", None],
    ]
    rows = [
        (fid * 100 + i, city)
        for fid, cities in enumerate(blocks)
        for i, city in enumerate(cities)
    ]
    df = spark.createDataFrame(rows, "id long, city string")
    # one output file per block: repartition on the block id
    df.withColumn("b", F.col("id") / 100).repartitionByRange(
        4, "b"
    ).drop("b").write.mode("overwrite").parquet(tbl)
    TG.build_trigram_index(spark, tbl, ["city"], idx)
    return tbl, idx


def test_eq_probe_prunes_to_one_file(spark, table):
    tbl, idx = table
    files = TG.pruned_files(spark, idx, "city", "boston")
    assert len(TG.indexed_files(spark, idx, "city")) == 4
    assert len(files) == 1
    out = TG.pruned_read(spark, tbl, idx, "city", "boston")
    assert [r["id"] for r in out.collect()] == [101]


def test_eq_probe_inside_bounds_but_absent_skips_all(spark, table):
    """'bogota' sorts inside the berlin-file's [berlin, bristol] range —
    min/max keeps the file, the trigram bits kill it (the exact scenario
    statfilter.go:124-126 orders Contains before the range check)."""
    tbl, idx = table
    files = TG.pruned_files(spark, idx, "city", "bogota")
    assert files == []
    out = TG.pruned_read(spark, tbl, idx, "city", "bogota")
    assert out.count() == 0
    # stable schema on the zero-file path
    assert out.columns == ["id", "city"]


def test_results_identical_to_full_scan(spark, table):
    tbl, idx = table
    full = spark.read.parquet(tbl)
    for needle in ["amsterdam", "dublin", "zurich", "berlin"]:
        got = sorted(
            r["id"]
            for r in TG.pruned_read(spark, tbl, idx, "city", needle).collect()
        )
        want = sorted(
            r["id"] for r in full.filter(F.col("city") == needle).collect()
        )
        assert got == want, needle


def test_contains_probe(spark, table):
    tbl, idx = table
    # 'icago' occurs only inside 'chicago' — unpadded windows subset rule
    files = TG.pruned_files(spark, idx, "city", "icago", mode="contains")
    assert len(files) == 1
    out = TG.pruned_read(spark, tbl, idx, "city", "icago", mode="contains")
    assert [r["city"] for r in out.collect()] == ["chicago"]


def test_contains_short_needle_passes_through(spark, table):
    """<3 chars -> no complete trigram window -> no pruning (reference
    pass-through when no usable stats, statfilter.go:118-122) — but the
    predicate still filters correctly."""
    tbl, idx = table
    files = TG.pruned_files(spark, idx, "city", "du", mode="contains")
    assert len(files) == len(TG.indexed_files(spark, idx, "city"))
    out = TG.pruned_read(spark, tbl, idx, "city", "du", mode="contains")
    assert [r["city"] for r in out.collect()] == ["dublin"]


def test_signature_superset_never_false_skips(spark, table):
    """Every value present in the table must survive its own probe on the
    file that holds it (no false negatives, the correctness half of the
    bloom-style containment argument)."""
    tbl, idx = table
    full = spark.read.parquet(tbl)
    for r in full.filter(F.col("city").isNotNull()).collect():
        files = TG.pruned_files(spark, idx, "city", r["city"])
        assert files, r["city"]


def test_null_and_empty_values(spark, tmp_path):
    tbl = os.path.join(str(tmp_path), "t")
    idx = os.path.join(str(tmp_path), "i")
    spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "id long, s string"
    ).coalesce(1).write.parquet(tbl)
    TG.build_trigram_index(spark, tbl, ["s"], idx)
    # empty-string probe: no bits, range check "" >= "" passes (min is "")
    out = TG.pruned_read(spark, tbl, idx, "s", "")
    assert [r["id"] for r in out.collect()] == [2]
    out = TG.pruned_read(spark, tbl, idx, "s", "x")
    assert [r["id"] for r in out.collect()] == [3]


def test_no_false_negatives_bulk_random_unicode(spark, tmp_path):
    """For every (value, file) in a random multi-byte-unicode corpus, the
    file's aggregated signature must contain the value's padded bits —
    checked in ONE join query instead of per-probe jobs.  This is the
    false-negative-free half of the containment argument over inputs the
    deterministic tests don't reach (emoji, CJK, combining-width chars)."""
    import random

    rnd = random.Random(7)
    alphabet = "abcde ñüß漢字\U0001f389xyz"
    vals = [
        "".join(rnd.choice(alphabet) for _ in range(rnd.randint(1, 20)))
        for _ in range(80)
    ]
    tbl = os.path.join(str(tmp_path), "t")
    idx = os.path.join(str(tmp_path), "i")
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, s string"
    ).repartition(4).write.parquet(tbl)
    TG.build_trigram_index(spark, tbl, ["s"], idx)
    lo, hi = TG._signature_sql("s", padded=True)
    per_value = (
        spark.read.parquet(tbl)
        .select(F.input_file_name().alias("file"), "s")
        .selectExpr("file", f"{lo} as vlo", f"{hi} as vhi")
    )
    violations = (
        per_value.join(spark.read.parquet(idx), "file")
        .filter(
            (F.col("sig_lo").bitwiseAND(F.col("vlo")) != F.col("vlo"))
            | (F.col("sig_hi").bitwiseAND(F.col("vhi")) != F.col("vhi"))
        )
        .count()
    )
    assert violations == 0


def test_versioned_table_incremental_index_and_probe(spark, tmp_path):
    """Lifecycle integration: append() maintains the sidecar
    incrementally (only new files indexed per batch), read_string_probe
    matches read().filter() exactly — including tombstone masking — and
    compact() rebuilds the index over the new generation."""
    from dp3_spark.streaming.lifecycle import VersionedLogTable

    vt = VersionedLogTable(spark, str(tmp_path / "vt"), trigram_cols=("props",))
    b1 = spark.createDataFrame(
        [("p1", "click", 100, 1, "alpha"), ("p1", "click", 200, 2, "beta")],
        "producer string, topic string, log_time long, sequence long, props string",
    )
    b2 = spark.createDataFrame(
        [("p1", "click", 300, 3, "gamma"), ("p2", "view", 400, 4, "delta")],
        "producer string, topic string, log_time long, sequence long, props string",
    )
    vt.append(b1)
    n_after_first = len(
        {r["file"] for r in spark.read.parquet(vt.trigram_index_path).collect()}
    )
    vt.append(b2)
    files_indexed = {
        r["file"] for r in spark.read.parquet(vt.trigram_index_path).collect()
    }
    assert len(files_indexed) > n_after_first  # second batch added, first kept
    assert vt.update_trigram_index() == 0  # idempotent: nothing new

    for needle, want_seq in [("alpha", [1]), ("delta", [4]), ("omega", [])]:
        got = sorted(
            r["sequence"] for r in vt.read_string_probe("props", needle).collect()
        )
        want = sorted(
            r["sequence"]
            for r in vt.read().filter(F.col("props") == needle).collect()
        )
        assert got == want == (want_seq)

    # probe keeps partition columns (basePath) and tombstone semantics
    row = vt.read_string_probe("props", "gamma").collect()[0]
    assert (row["producer"], row["topic"]) == ("p1", "click")
    vt.delete_range("p1", "click", 0, 250)  # masks sequences 1, 2
    assert vt.read_string_probe("props", "alpha").count() == 0
    assert vt.read_string_probe("props", "gamma").count() == 1

    vt.compact()
    assert sorted(r["sequence"] for r in vt.read().collect()) == [3, 4]
    got = [r["sequence"] for r in vt.read_string_probe("props", "gamma").collect()]
    assert got == [3]
    assert vt.read_string_probe("props", "alpha").count() == 0


def test_ql_compiler_uses_trigram_probe(spark, tmp_path):
    """statfilter-inside-scan parity: a QL string-equality WHERE over a
    versioned table's log_store() reads fewer files than the unpruned
    plan, with identical rows."""
    from dp3_spark.plans import Compiler
    from dp3_spark.streaming.lifecycle import VersionedLogTable

    vt = VersionedLogTable(spark, str(tmp_path / "vt"), trigram_cols=("props",))
    # separate appends -> separate files per (producer, topic) partition
    for i, props in enumerate(["alpha", "beta", "gamma", "delta"]):
        vt.append(
            spark.createDataFrame(
                [("p1", "click", 100 * (i + 1), i, props)],
                "producer string, topic string, log_time long, sequence long, props string",
            )
        )
    store = vt.log_store()
    c = Compiler(store)
    pruned = c.compile("from p1 click where click.props = 'gamma';")
    rows = pruned.collect()
    assert [(r["sequence"], r["props"]) for r in rows] == [(2, "gamma")]
    # unpruned twin: same store without the probe hook
    import dataclasses

    full = Compiler(dataclasses.replace(store, string_probe=None)).compile(
        "from p1 click where click.props = 'gamma';"
    )
    assert [tuple(r) for r in full.collect()] == [tuple(r) for r in rows]
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    # non-equality / regex predicates keep the full scan (no false pruning)
    rx = c.compile("from p1 click where click.props ~ 'a$';")
    assert sorted(r["props"] for r in rx.collect()) == ["alpha", "beta", "delta", "gamma"]


def test_probe_correct_with_stale_and_missing_index(spark, tmp_path):
    """Correctness-first contract under every index state: a data file
    the sidecar does not cover is always scanned (crash between append's
    parquet commit and the index update), and a missing sidecar falls
    back to the full scan."""
    import shutil

    from dp3_spark.streaming.lifecycle import VersionedLogTable

    vt = VersionedLogTable(spark, str(tmp_path / "vt"), trigram_cols=("props",))
    vt.append(
        spark.createDataFrame(
            [("p1", "click", 100, 1, "alpha")],
            "producer string, topic string, log_time long, sequence long, props string",
        )
    )
    # simulate the crash window: write a second batch WITHOUT indexing it
    # (same bucketed at-rest layout append() uses)
    v2 = vt._next_version()
    crash = spark.createDataFrame(
        [("p1", "click", 200, 2, "beta", v2)],
        "producer string, topic string, log_time long, sequence long, "
        "props string, version int",  # lit(int) in append() writes int32
    ).withColumn("producer_bucket", vt._bucket_expr())
    crash.write.mode("append").partitionBy("topic", "producer_bucket").parquet(
        vt._resolve_data_path()
    )
    vt._publish(v2)  # committed but unindexed (crash hit the index step)
    # beta exists only in the unindexed file — must still be found
    assert [r["sequence"] for r in vt.read_string_probe("props", "beta").collect()] == [2]
    # missing sidecar entirely -> full-scan fallback, not a crash
    shutil.rmtree(vt.trigram_index_path)
    assert [r["sequence"] for r in vt.read_string_probe("props", "alpha").collect()] == [1]
    # repair then prune again
    assert vt.update_trigram_index() > 0
    assert [r["sequence"] for r in vt.read_string_probe("props", "beta").collect()] == [2]


def test_trigram_cols_backfill_new_column(spark, tmp_path):
    """Adding a column to trigram_cols on an existing table back-fills
    its index rows on the next update (per-column diff)."""
    from dp3_spark.streaming.lifecycle import VersionedLogTable

    root = str(tmp_path / "vt")
    vt = VersionedLogTable(spark, root, trigram_cols=("props",))
    vt.append(
        spark.createDataFrame(
            [("p1", "click", 100, 1, "alpha", "x1")],
            "producer string, topic string, log_time long, sequence long, "
            "props string, extra string",
        )
    )
    # reopen with a second indexed column: next update back-fills it
    vt2 = VersionedLogTable(spark, root, trigram_cols=("props", "extra"))
    assert vt2.update_trigram_index() > 0
    assert vt2.update_trigram_index() == 0  # then idempotent
    out = vt2.read_string_probe("extra", "x1").collect()
    assert [r["sequence"] for r in out] == [1]
    from dp3_spark.operators import trigram as TG

    assert TG.indexed_files(spark, vt2.trigram_index_path, "extra")
