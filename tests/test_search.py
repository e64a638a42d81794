"""BM25 keyword search (operators/search.py): scoring semantics on a
hand corpus, edge cases the fixture-scale oracle can't isolate."""

import math

import pytest
from pyspark.sql import functions as F

from dp3_spark.operators import search as SRCH


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "cat dog cat"),            # tf(cat)=2, dl=3
        (1, "cat mouse mouse mouse"),  # tf(cat)=1, dl=4
        (2, "dog dog dog dog"),        # no cat, dl=4
        (3, "bird"),                   # dl=1
        (4, None),                     # null text: dl=0, no postings
        (5, "  cat  "),                # whitespace runs: dl=1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25(tf, dl, n, df, avgdl, k1=SRCH.K1, b=SRCH.B):
    idf_micro = math.floor(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * 1e6 + 0.5)
    tfnorm = (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + (b * dl) / avgdl))
    return math.floor(idf_micro * tfnorm + 0.5)


def test_bm25_scores_match_closed_form(docs):
    out = {r["doc_id"]: r for r in SRCH.bm25_topk(docs, ["cat"], k=10).collect()}
    # corpus scalars: 6 docs, lengths 3+4+4+1+0+1 = 13
    n, avgdl = 6, 13.0 / 6.0
    assert set(out) == {0, 1, 5}
    assert out[0]["score_micro"] == _bm25(2, 3, n, 3, avgdl)
    assert out[1]["score_micro"] == _bm25(1, 4, n, 3, avgdl)
    assert out[5]["score_micro"] == _bm25(1, 1, n, 3, avgdl)
    # shortest doc with the term outranks the long one at equal tf
    assert out[5]["score_micro"] > out[1]["score_micro"]
    assert all(r["matched_terms"] == 1 for r in out.values())


def test_bm25_rare_term_outranks_common(docs):
    # 'bird' (df=1) is worth more than 'dog' (df=2) at comparable tf/dl
    out = {r["doc_id"]: r["score_micro"]
           for r in SRCH.bm25_topk(docs, ["bird", "dog"], k=10).collect()}
    assert out[3] > out[0]  # doc3: bird tf=1 dl=1; doc0: dog tf=1 dl=3


def test_bm25_absent_terms_contribute_nothing(docs):
    assert SRCH.bm25_topk(docs, ["unicorn"], k=5).count() == 0
    both = {r["doc_id"]: r for r in SRCH.bm25_topk(docs, ["cat", "unicorn"], k=10).collect()}
    only = {r["doc_id"]: r for r in SRCH.bm25_topk(docs, ["cat"], k=10).collect()}
    assert {d: r["score_micro"] for d, r in both.items()} == {
        d: r["score_micro"] for d, r in only.items()
    }


def test_bm25_rank_and_k(docs):
    out = SRCH.bm25_topk(docs, ["cat", "dog"], k=2).collect()
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]
    full = SRCH.bm25_topk(docs, ["cat", "dog"], k=10).collect()
    top2 = sorted(full, key=lambda r: (-r["score_micro"], r["doc_id"]))[:2]
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in top2}


def test_bm25_empty_query_rejected(docs):
    with pytest.raises(ValueError):
        SRCH.bm25_topk(docs, [])


def test_hybrid_rrf_fusion_math(spark):
    """RRF semantics on hand data: a doc in both lists beats docs in one
    list; micro-quantized reciprocals sum exactly."""
    import math

    from dp3_spark.operators import similarity as SIM

    docs = spark.createDataFrame(
        [(0, "cat dog"), (1, "cat cat cat"), (2, "bird"), (3, "dog dog")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),   # query
            (1, [0.9, 0.1]),   # nearest to query
            (2, [0.0, 1.0]),
            (3, [0.5, 0.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r["doc_id"]: r for r in SRCH.hybrid_rrf(
        docs, emb, ["cat"], 0, k=4, k_each=3, c=60
    ).collect()}
    bm = {r["doc_id"]: r["rank"] for r in SRCH.bm25_topk(docs, ["cat"], k=3).collect()}
    dn = {r["neighbor_id"]: r["rank"] for r in SIM.cosine_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=3
    ).collect()}
    for d, r in out.items():
        want = sum(
            math.floor(1e6 / (60 + lst[d]) + 0.5) for lst in (bm, dn) if d in lst
        )
        assert r["rrf_micro"] == want
        assert r["n_lists"] == sum(d in lst for lst in (bm, dn))
    # doc 1 is in both lists (bm25 rank 1, dense rank 1) -> fused rank 1
    assert out[1]["rank"] == 1 and out[1]["n_lists"] == 2


def test_bm25_one_pass_dispatch_parity(docs, monkeypatch):
    """The single-pass (Observation + checkpointed postings) shape and the
    classic lazy 3-subtree shape must produce identical rows — the
    dispatch (BM25_ONE_PASS_MIN_BYTES) is a plan choice, never a value
    choice.  Forcing the threshold to 0 routes the hand corpus through
    the single-pass branch; on a LocalRelation corpus the observation
    never fires and the branch falls back to lazy scalars, so this also
    covers the fallback."""
    classic = sorted(map(tuple, SRCH.bm25_topk(docs, ["cat", "dog"], k=10).collect()))
    monkeypatch.setattr(SRCH, "BM25_ONE_PASS_MIN_BYTES", 0)
    forced = sorted(map(tuple, SRCH.bm25_topk(docs, ["cat", "dog"], k=10).collect()))
    assert classic == forced


def test_bm25_one_pass_parquet_parity(spark, tmp_path, monkeypatch):
    """Same parity on a PARQUET-backed corpus, where the Observation
    genuinely fires and supplies the scalars from the single tokenize
    pass."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": range(200),
            "text": [f"cat dog word{i} {'dog ' * (i % 5)}" for i in range(200)],
        }
    )
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(pdf).write.parquet(path)
    docs = spark.read.parquet(path)
    classic = sorted(map(tuple, SRCH.bm25_topk(docs, ["cat", "dog"], k=15).collect()))
    monkeypatch.setattr(SRCH, "BM25_ONE_PASS_MIN_BYTES", 0)
    forced = sorted(map(tuple, SRCH.bm25_topk(docs, ["cat", "dog"], k=15).collect()))
    assert classic == forced
