"""DSIR importance resampling (operators/dsir.py): hashed-ngram profiles,
micro-quantized log ratios, deterministic top-k selection."""

from pyspark.sql import functions as F

from dp3_spark.operators import dsir as D


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_profile_counts_uni_and_bigrams(spark):
    docs = _docs(spark, [(1, "a b"), (2, "a")])
    # ngrams: doc1 -> a, b, 'a b'; doc2 -> a  => 4 total
    prof = D.hashed_ngram_profile(docs, buckets=64)
    assert prof.agg(F.sum("cnt")).collect()[0][0] == 4


def test_target_like_docs_outrank_disjoint(spark):
    """Documents sharing the target's n-grams must score above documents
    with none of them, and the selection is deterministic."""
    target = _docs(spark, [(100, "solar panel array output"), (101, "solar panel kit")])
    pool = _docs(
        spark,
        [
            (1, "solar panel array"),          # strongly target-like
            (2, "panel output report"),        # partially target-like
            (3, "quarterly tax ledger notes"), # disjoint
            (4, "zebra quail xylophone"),      # disjoint
        ],
    )
    top = D.dsir_topk(pool, target, k=2, buckets=256)
    picked = [r["doc_id"] for r in top.collect()]
    assert picked[0] == 1 and set(picked) <= {1, 2}
    again = [r["doc_id"] for r in D.dsir_topk(pool, target, k=2, buckets=256).collect()]
    assert picked == again  # fully deterministic, no RNG anywhere


def test_weights_are_integer_micro_units(spark):
    target = _docs(spark, [(9, "alpha beta")])
    pool = _docs(spark, [(1, "alpha beta"), (2, "gamma delta")])
    w = D.dsir_log_weights(pool, target, buckets=128).collect()
    by_id = {r["doc_id"]: r for r in w}
    assert by_id[1]["weight_micro"] > by_id[2]["weight_micro"]
    for r in w:
        assert isinstance(r["weight_micro"], int)  # int64 micro-units
        assert r["n_ngrams"] == 3  # 2 unigrams + 1 bigram


def test_gumbel_sample_seeded_deterministic_and_seed_sensitive(spark):
    """dsir_sample: same seed -> identical selection (rerunnable at
    100 TB, hash-gateable); different seed -> an independent draw that
    can differ.  Strongly target-like docs still dominate (the noise is
    Gumbel(0,1) against a much wider weight spread)."""
    target = _docs(spark, [(100, "solar panel array output"), (101, "solar panel kit")])
    pool = _docs(
        spark,
        [
            (1, "solar panel array"),
            (2, "panel output report"),
            (3, "quarterly tax ledger notes"),
            (4, "zebra quail xylophone"),
            (5, "solar array output"),
        ],
    )
    a = [r["doc_id"] for r in D.dsir_sample(pool, target, k=2, seed="s1", buckets=256).collect()]
    b = [r["doc_id"] for r in D.dsir_sample(pool, target, k=2, seed="s1", buckets=256).collect()]
    assert a == b  # seeded determinism
    # the key is weight + noise: every selected doc carries both columns
    rows = D.dsir_sample(pool, target, k=2, seed="s1", buckets=256).collect()
    for r in rows:
        assert r["key_micro"] == r["weight_micro"] + r["gumbel_micro"]
        assert isinstance(r["gumbel_micro"], int)


def test_gumbel_noise_distribution_sane(spark):
    """The md5-uniform Gumbel draws have roughly the Gumbel(0,1) moments
    (mean ~ Euler-Mascheroni 0.577, few draws below -2): a sanity pin
    that the -ln(-ln(u)) transform is wired right, not a stats test."""
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    g_s, _ = D.gumbel_micro_exprs("doc_id", "moments")
    vals = [r["g"] / 1e6 for r in df.select(F.expr(g_s).alias("g")).collect()]
    mean = sum(vals) / len(vals)
    assert 0.45 < mean < 0.7  # Gumbel(0,1) mean = 0.5772...
    assert min(vals) > -2.5 and max(vals) < 12  # support sanity


def test_target_pred_single_pass_equals_two_frame_form(spark):
    """The in-pipeline shape: target = a slice of the scored pool.  The
    single-pass conditional-aggregation profile (target_pred) must give
    IDENTICAL weights, ranked selection, and Gumbel draw to the two-frame
    form with target = docs.filter(pred) — the optimization changes pass
    count, never a count or a micro unit."""
    import pytest

    rows = [
        (i, ("alpha beta gamma " * (i % 3 + 1)) if i % 2 else ("delta eps " * (i % 4 + 1)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pred = F.col("doc_id") % 2 == 1

    def key(df):
        return sorted(tuple(r) for r in df.collect())

    two = D.dsir_topk(docs, docs.filter(pred), k=10, buckets=128)
    one = D.dsir_topk(docs, target_pred=pred, k=10, buckets=128)
    assert key(one) == key(two)

    two_s = D.dsir_sample(docs, docs.filter(pred), k=10, seed="s", buckets=128)
    one_s = D.dsir_sample(docs, target_pred=pred, k=10, seed="s", buckets=128)
    assert key(one_s) == key(two_s)

    with pytest.raises(ValueError, match="exactly one"):
        D.dsir_log_weights(docs)
    with pytest.raises(ValueError, match="exactly one"):
        D.dsir_log_weights(docs, docs.filter(pred), target_pred=pred)
