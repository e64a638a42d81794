"""Plan-quality regression guards: the properties that make queries scale
must be visible in the physical plan (SURVEY.md §4 — Catalyst replaces the
reference's hand-built statfilter/pushdown machinery, so verify it actually
engages)."""

import pytest
from pyspark.sql import functions as F

from dp3_spark.catalog import events_log_store, register_views
from dp3_spark.plans import Compiler

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_scan_filters_pushed_to_parquet(spark):
    """QL where + between + topic must reach the parquet scan as
    PushedFilters (the statfilter/zone-map analog, executor/statfilter.go)."""
    store = events_log_store(spark, SF)
    df = Compiler(store).compile(
        "from * between 1704412800000000000 and 1705708800000000000 "
        "click where click.value > 100.0;"
    )
    txt = formatted(df)
    assert "PushedFilters:" in txt
    pushed = [l for l in txt.splitlines() if "PushedFilters:" in l][0]
    assert "EqualTo(event_type,click)" in pushed
    assert "GreaterThan(value,100.0)" in pushed
    assert "GreaterThanOrEqual(ts," in pushed  # between -> scan bounds


def test_us_truncated_store_still_pushes_time_bounds(spark):
    """The engine's log_time is a derived column (int64 ns from a µs
    timestamp, or µs-truncated nanos), which parquet can't prune on — the
    implied raw-ts range must still reach the scan
    (catalog.time_range_filter)."""
    store = events_log_store(spark, SF, us_truncate=True)
    df = Compiler(store).compile(
        "from * between 1704412800000000000 and 1705708800000000000 purchase;"
    )
    pushed = [l for l in formatted(df).splitlines() if "PushedFilters:" in l][0]
    # bounds appear as ns longs (ns-typed fixture) or timestamp literals
    # (µs-typed fixture); either way both range ends must be pushed.
    assert "GreaterThanOrEqual(ts,1704412800000000000)" in pushed or (
        "GreaterThanOrEqual(ts,2024-01-05" in pushed
    )
    assert "LessThan(ts,1705708800000000999)" in pushed or (
        "LessThan(ts,2024-01-20" in pushed
    )
    assert "__ptime__" not in df.columns  # internal column never leaks


def test_scan_prunes_columns(spark):
    """Skeleton projection must prune payload columns at the scan
    (the bytecode partial-deserialization analog, util/schema/parser.go)."""
    store = events_log_store(spark, SF)
    df = Compiler(store).compile("from * click;").select("topic", "log_time", "sequence")
    txt = formatted(df)
    schema_lines = [l for l in txt.splitlines() if "ReadSchema" in l]
    assert schema_lines, txt
    assert "props" not in schema_lines[0]  # payload column pruned
    assert "value" not in schema_lines[0]


def test_merge_collapses_to_single_scan(spark):
    """A merge of unfiltered topics is ONE storage pass with an In filter,
    not N scans."""
    store = events_log_store(spark, SF)
    df = Compiler(store).compile("from * click, view, purchase;")
    txt = plan_of(df)
    assert txt.count("FileScan parquet") == 1
    assert "In(event_type" in txt


def test_small_dims_broadcast(spark):
    """TPC-H joins against nation/region must broadcast the dims, never
    shuffle lineitem for them."""
    register_views(spark, SF)
    df = spark.sql(
        """
        select n.n_name, count(*) as n from lineitem l
        join supplier s on l.l_suppkey = s.s_suppkey
        join nation n on s.s_nationkey = n.n_nationkey
        group by n.n_name
        """
    )
    txt = plan_of(df)
    assert "BroadcastHashJoin" in txt


def test_tpch_q9_broadcasts_dims_no_cartesian(spark):
    """The 5-way q9 join must broadcast the small sides and never fall
    back to a cartesian/broadcast-nested-loop plan."""
    from dp3_spark import queries as Q

    df = Q.queries()["tpch_q9_profit"](spark, SF)
    txt = plan_of(df)
    assert txt.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt


def test_tpch_q18_in_subquery_is_semi_join(spark):
    """q18's HAVING-inside-IN must plan as a LeftSemi join, not a
    distinct+inner-join rewrite that would duplicate rows."""
    from dp3_spark import queries as Q

    df = Q.queries()["tpch_q18_large_orders"](spark, SF)
    txt = plan_of(df)
    assert "LeftSemi" in txt


def test_asof_single_sort_per_window_chain(spark):
    """The as-of join's windows share partitioning+ordering, so the plan
    should not re-sort between the two window operators."""
    store = events_log_store(spark, SF)
    df = Compiler(store).compile("from * click precedes purchase by less than 1 minutes;")
    txt = plan_of(df)
    # two logical window groups but at most two physical sorts inside the
    # asof (one per distinct partitioning: producer vs producer+left_rn)
    assert txt.count("Window") >= 2
    n_sorts = txt.count("Sort [")
    assert n_sorts <= 4, f"unexpected sort explosion:\n{txt}"


def test_whole_stage_codegen_covers_filters(spark):
    """Typed comparisons stay JVM-side inside WholeStageCodegen (no
    BatchEvalPython in the hot path)."""
    store = events_log_store(spark, SF)
    df = Compiler(store).compile("from * click where click.value >= 10.5;")
    df.collect()  # AQE: codegen stages appear only in the finalized plan
    txt = plan_of(df)
    assert "*(" in txt  # WholeStageCodegen stage marker
    assert "BatchEvalPython" not in txt


def test_text_pipeline_no_python_udf(spark):
    from dp3_spark import queries as Q

    df = Q.queries()["text_metrics"](spark, SF)
    txt = plan_of(df)
    assert "BatchEvalPython" not in txt
    assert "ArrowEvalPython" not in txt


def test_bloom_filter_skips_string_miss_row_groups(spark, tmp_path):
    """Trigram-pruning analog (statfilter.go:112): a string-equality probe
    for a value the table does not contain must skip row groups via the
    parquet bloom filter — the probe sits lexically INSIDE min/max (so
    zone maps can't skip) and dictionary encoding is disabled (so only
    the bloom can).  Asserted via the scan's numOutputRows: 0 with
    blooms, every row without."""
    from dp3_spark.streaming.ingest import bloom_options

    df = spark.range(50_000).select(
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit("aaa_"), F.col("id").cast("string")),
        )
        .otherwise(F.concat(F.lit("zzz_"), F.col("id").cast("string")))
        .alias("s"),
        F.col("id"),
    )

    def scan_rows(path):
        d = spark.read.parquet(path).filter(F.col("s") == "mmm_absent")
        d.collect()
        leaf = d._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        return leaf.metrics().apply("numOutputRows").value()

    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    base = df.coalesce(1).write.mode("overwrite").option(
        "parquet.enable.dictionary", "false"
    )
    base.parquet(plain)
    w = df.coalesce(1).write.mode("overwrite").option(
        "parquet.enable.dictionary", "false"
    )
    for k, v in bloom_options(["s"], ndv=100_000).items():
        w = w.option(k, v)
    w.parquet(bloomed)
    assert scan_rows(plain) == 50_000  # in-range miss: zone maps can't help
    assert scan_rows(bloomed) == 0  # bloom skips every row group


def test_versioned_table_appends_bloom_filters(spark, tmp_path):
    """VersionedLogTable(bloom_cols=...) writes blooms through append:
    an in-range string miss on the payload column reads 0 rows."""
    from dp3_spark.streaming.lifecycle import VersionedLogTable

    vt = VersionedLogTable(spark, str(tmp_path / "vt"), bloom_cols=("props",))
    rows = spark.range(20_000).select(
        F.lit("p").alias("producer"),
        F.lit("t").alias("topic"),
        (F.col("id") * 1000).alias("log_time"),
        F.col("id").alias("sequence"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit("aaa_"), F.col("id").cast("string")),
        )
        .otherwise(F.concat(F.lit("zzz_"), F.col("id").cast("string")))
        .alias("props"),
    )
    vt.append(rows)
    d = vt.read().filter(F.col("props") == "mmm_absent")
    assert d.count() == 0
    d2 = spark.read.parquet(vt._resolve_data_path()).filter(
        F.col("props") == "mmm_absent"
    )
    d2.collect()
    leaf = d2._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    # parquet dictionary encoding may also prune here; bloom guarantees it
    assert leaf.metrics().apply("numOutputRows").value() == 0


def test_versioned_table_bucket_partition_pruning(spark, tmp_path):
    """The bucketed at-rest layout (topic, producer_bucket) must give a
    producer-equality probe real PARTITION pruning: the scan lists only
    the probe value's bucket dir — at 100 TB this is the difference
    between touching 1/N of the files and listing the whole table.  The
    bucket predicate comes from a constant-folded xxhash64 of the
    literal, so Catalyst prunes at planning time."""
    from dp3_spark.streaming.lifecycle import VersionedLogTable

    vt = VersionedLogTable(spark, str(tmp_path / "vt"), producer_buckets=16)
    rows = spark.range(8_000).select(
        F.concat(F.lit("dev"), (F.col("id") % 50).cast("string")).alias("producer"),
        F.lit("t").alias("topic"),
        (F.col("id") * 1000).alias("log_time"),
        F.col("id").alias("sequence"),
        F.lit("x").alias("props"),
    )
    vt.append(rows)
    probe = vt.read_string_probe("producer", "dev7")
    expect = sorted(
        r["sequence"] for r in vt.read().filter(F.col("producer") == "dev7").collect()
    )
    assert sorted(r["sequence"] for r in probe.collect()) == expect and expect
    leaf = probe._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    scanned = leaf.metrics().apply("numFiles").value()
    total = len(vt._list_data_files())
    # 16 buckets over 50 producers: one bucket dir ~= total/16 files
    assert 0 < scanned < total / 4, (scanned, total)


def test_hll_sketch_is_pure_codegen(spark):
    """The whole HLL pipeline — hash, register, rank, sketch build, merge,
    estimate — must stay JVM-side: no Python evaluation of any kind in
    the plan (the md5/conv/bin expressions are all built-ins)."""
    from dp3_spark.operators import sketch as SK

    df = spark.createDataFrame(
        [("g", f"u{i}") for i in range(100)], "grp string, uid string"
    )
    est = SK.hll_sketch(df, keys=["grp"], value_col="uid").withColumn(
        "est", SK.hll_estimate_expr()
    )
    plan = plan_of(est)
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert marker not in plan, marker


def test_resample_plans_without_join(spark):
    """resample_hold/linear must plan as union+window — a range join
    would fall to BroadcastNestedLoopJoin and explode at scale."""
    from dp3_spark import queries as Q

    for name in ("stat_resample_hourly", "stat_resample_lerp"):
        df = Q.queries()[name](spark, SF)
        txt = plan_of(df)
        assert "NestedLoop" not in txt, name
        assert "Join" not in txt, name  # no join operator of any kind
        assert "Window" in txt, name


def test_knn_corpus_never_shuffles_vectors(spark):
    """knn_classify: the query side broadcasts; the only exchanges beyond
    the broadcast carry the thin neighbor/vote rows, never the corpus
    embedding column."""
    from dp3_spark import queries as Q

    df = Q.queries()["sim_knn_classify"](spark, SF)
    txt = plan_of(df)
    assert "BroadcastExchange" in txt
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", txt):
        assert "embedding" not in m.group(1)


def test_paragraph_dedup_single_fingerprint_shuffle_no_python(spark):
    from dp3_spark import queries as Q

    df = Q.queries()["dedup_paragraphs"](spark, SF)
    txt = plan_of(df)
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt
    assert "NestedLoop" not in txt


def test_bm25_shuffles_only_query_term_postings(spark):
    """search_bm25's scale contract: the `term IN (query)` filter must sit
    BELOW the (doc_id, term) aggregation (so the shuffle carries only
    query-term postings), the idf/scalar sides must broadcast, and the
    documents scan must read only (doc_id, text)."""
    from dp3_spark import queries as Q

    df = Q.queries()["search_bm25"](spark, SF)
    txt = formatted(df)
    assert "dup" in txt and "quantum" in txt  # literal query terms present
    # the term filter exists and the postings aggregation shuffles on the
    # (doc_id, ...) grouping — i.e. after the filter pruned non-query terms
    assert "array_contains" in txt
    # formatted mode lists node arguments separately from the tree
    assert "hashpartitioning(doc_id" in txt
    plan = plan_of(df)
    assert "BroadcastExchange" in plan  # idf + scalars broadcast
    assert "CartesianProduct" not in plan
    # scan pruned to the two needed columns
    import re
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", txt)
    assert any(set(s.split(",")) <= {"doc_id:bigint", "text:string"} and s for s in scans)


def test_pq_topk_numpy_scan_never_shuffles_corpus(spark):
    """pq_topk's numpy path is one mapInPandas scan of the corpus with a
    q*k-row global top-k: no exchange may appear between the corpus scan
    and the ADC kernel (the corpus itself never shuffles)."""
    from dp3_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    df = SIM.pq_topk(emb, q, k=3, iters=0, assign="numpy")
    txt = plan_of(df)
    scan_i = txt.rindex("FileScan parquet")  # the corpus scan (deepest)
    kernel_i = txt.rindex("MapInPandas")
    between = txt[kernel_i:scan_i]
    assert "Exchange" not in between
    # exactly one shuffle total: the q*k-row top-k window
    assert txt.count("Exchange hashpartitioning") == 1


def test_incremental_probe_broadcasts_batch_not_index(spark):
    """minhash_lsh_pairs_incremental's candidate stage must broadcast the
    BATCH band keys and leave the index side as a map-only scan — no
    exchange may sit between the index signature scan and the candidate
    join (the corpus-refresh contract: per-batch shuffle volume is
    candidates only, never O(index))."""
    from dp3_spark.operators import dedup as DD

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    index_docs = docs.filter(F.col("doc_id") % 5 != 0)
    new_docs = docs.filter(F.col("doc_id") % 5 == 0)
    sigs = DD.minhash_signatures(index_docs, "doc_id", "text", n=3, num_hashes=128)
    sigs_new = DD.minhash_signatures(new_docs, "doc_id", "text", n=3, num_hashes=128)
    # the public API localCheckpoints the candidate frame (it feeds the
    # endpoint slice AND the verify), which truncates the visible plan —
    # guard the candidate stage itself, pre-checkpoint
    cand = DD._probe_candidates(sigs_new, sigs, None, 16, 8)
    txt = plan_of(cand)
    assert "BroadcastHashJoin" in txt          # batch band keys broadcast
    assert "CartesianProduct" not in txt
    # the index side of the candidate join reads the signature relation
    # with no shuffle: every Exchange in the plan is below a different
    # operator (verify/aggregate), not between the sig scan and the join.
    # Cheap proxy: the first BroadcastHashJoin's streamed child contains
    # no Exchange before the next join boundary.
    head = txt.split("BroadcastHashJoin", 1)[1]
    streamed_side = head.split("BroadcastExchange", 1)[0]
    assert "Exchange hashpartitioning" not in streamed_side


def test_interval_overlap_is_equi_join_never_nested_loop(spark):
    """The grid-bucketed interval join must plan as an equi-join on the
    cell id (BroadcastHashJoin / SortMergeJoin) — the theta-join
    formulation's BroadcastNestedLoopJoin or CartesianProduct is exactly
    what the operator exists to avoid.  The pair aggregation must also
    map-side combine (partial HashAggregate below the exchange)."""
    from dp3_spark import queries as Q

    df = Q.queries()["events_interval_overlap"](spark, SF)
    txt = plan_of(df)
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
    assert ("BroadcastHashJoin" in txt) or ("SortMergeJoin" in txt)


def test_phrase_search_filters_postings_below_shuffle(spark):
    """search_phrase's scale contract: the `term IN (phrase)` filter must
    prune non-phrase tokens BEFORE the doc-keyed collect_list shuffle,
    there is exactly ONE postings shuffle, the top-k is
    TakeOrderedAndProject (never a global sort), and the documents scan
    reads only (doc_id, text)."""
    import re

    from dp3_spark import queries as Q

    df = Q.queries()["search_phrase"](spark, SF)
    txt = formatted(df)
    assert "big" in txt and "table" in txt  # literal phrase terms present
    assert "hashpartitioning(doc_id" in txt
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    # one postings shuffle + nothing else on the corpus path
    assert plan.count("Exchange hashpartitioning") <= 1
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", txt)
    assert any(set(s.split(",")) <= {"doc_id:bigint", "text:string"} and s for s in scans)


def test_zorder_scan_pushes_both_range_predicates(spark):
    """zorder_pruned_scan's 2D predicate must reach the parquet scan as
    PushedFilters on BOTH dimensions — that is what row-group skipping
    on the z layout runs on."""
    from dp3_spark import queries as Q

    df = Q.queries()["zorder_pruned_scan"](spark, SF)
    txt = formatted(df)
    pushed = [l for l in txt.splitlines() if "PushedFilters:" in l][0]
    assert "GreaterThanOrEqual(user_id,4)" in pushed
    assert "LessThan(user_id,8)" in pushed
    assert "GreaterThanOrEqual(log_time," in pushed
    assert "LessThan(log_time," in pushed


def test_bm25_indexed_probe_reads_only_query_term_postings(spark, tmp_path):
    """The persisted-index probe's scale contract: `term IN (query)` is
    pushed to the postings scan, and the term-clustered layout actually
    skips non-matching row groups (scan rows << total postings)."""
    from dp3_spark.operators import search as SRCH

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p, s = str(tmp_path / "post"), str(tmp_path / "scal")
    SRCH.build_inverted_index(docs, p, s)
    total = spark.read.parquet(p).count()
    df = SRCH.bm25_topk_indexed(spark, p, s, ["dup", "spark"], k=5)
    txt = formatted(df)
    pushed = [l for l in txt.splitlines() if "PushedFilters:" in l]
    assert any("In(term, [dup,spark])" in l for l in pushed), pushed
    d = spark.read.parquet(p).filter(F.col("term").isin(["dup", "spark"]))
    d.collect()
    leaf = d._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    probe_rows = leaf.metrics().apply("numOutputRows").value()
    assert probe_rows < total * 0.6, (probe_rows, total)


def test_bpe_iterations_touch_vocab_not_corpus(spark):
    """bpe_train's scale contract: the corpus is read once (word_counts'
    map-combinable groupBy — partial aggregation below the single word
    shuffle); every merge iteration plans over the checkpointed vocab
    table, and the encoder joins exploded words against a BROADCAST
    vocab — the corpus side never shuffles for the join."""
    from dp3_spark.operators import bpe as B

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    wc = B.word_counts(docs)
    wtxt = plan_of(wc)
    # partial aggregation before the single shuffle (map-side combine)
    assert wtxt.count("HashAggregate") >= 2
    assert wtxt.count("Exchange") <= 2  # repartition + the groupBy shuffle

    merges, states = B.bpe_train(docs, n_merges=2)
    # iteration input is a checkpointed (scan-like) vocab table: the
    # per-merge pair-count plan must not re-read the documents parquet
    ptxt = plan_of(B._pair_counts(states))
    assert "documents.parquet" not in ptxt

    enc = B.encode_token_counts(docs, states)
    etxt = plan_of(enc)
    assert "BroadcastHashJoin" in etxt  # vocab is the broadcast side
    assert "SortMergeJoin" not in etxt and "CartesianProduct" not in etxt
