"""Property tests: BM25 and PQ-ADC against independent pure-python
reference implementations on random corpora — the engine-side plans
(postings shuffle, codegen folds, BLAS kernels) must reproduce the
arithmetic definition exactly, not just on the fixture vocabulary."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dp3_spark.operators import search as SRCH
from dp3_spark.operators import similarity as SIM

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
    min_size=1,
    max_size=12,
)


def _bm25_reference(docs, terms, k, k1=SRCH.K1, b=SRCH.B):
    """Independent python implementation of the operator's contract."""
    dls = [len(d) for d in docs]
    n = len(docs)
    avgdl = float(sum(dls)) / float(n)
    tf = {}
    for i, d in enumerate(docs):
        for t in d:
            if t in terms:
                tf[(i, t)] = tf.get((i, t), 0) + 1
    df = {}
    for (_, t), _c in tf.items():
        df[t] = df.get(t, 0) + 1
    idf_micro = {
        t: math.floor(math.log(1.0 + (n - dft + 0.5) / (dft + 0.5)) * 1e6 + 0.5)
        for t, dft in df.items()
    }
    scores = {}
    matched = {}
    for (i, t), c in tf.items():
        tfnorm = (c * (k1 + 1.0)) / (c + k1 * ((1.0 - b) + (b * dls[i]) / avgdl))
        scores[i] = scores.get(i, 0) + math.floor(idf_micro[t] * tfnorm + 0.5)
        matched[i] = matched.get(i, 0) + 1
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [
        (i, matched[i], s, r + 1) for r, (i, s) in enumerate(ranked)
    ]


@pytest.mark.usefixtures("spark")
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=corpus_strategy, nterms=st.integers(1, 3))
def test_bm25_matches_python_reference(spark, docs, nterms):
    terms = WORDS[:nterms] + ["missingword"]
    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in SRCH.bm25_topk(df, terms, k=5).collect()
    )
    want = sorted(_bm25_reference(docs, set(terms), 5))
    assert got == want


def _pq_reference(vecs, q_ids, m, k_codes, k):
    """Independent ADC scan: seeded codebooks, argmin encode, micro
    tables, int64 sums, (score desc, id asc) top-k."""
    ids = sorted(vecs)
    dim = len(vecs[ids[0]])
    d = dim // m
    seeds = ids[:k_codes]
    books = [[vecs[s][ss * d : (ss + 1) * d] for s in seeds] for ss in range(m)]
    codes = {}
    for i in ids:
        codes[i] = []
        for ss in range(m):
            sub = vecs[i][ss * d : (ss + 1) * d]
            best = min(
                range(len(books[ss])),
                key=lambda j: (
                    sum((x - y) * (x - y) for x, y in zip(sub, books[ss][j])),
                    j,
                ),
            )
            codes[i].append(best)
    out = []
    for qi in q_ids:
        dt = [
            [
                math.floor(
                    sum(x * y for x, y in zip(vecs[qi][ss * d : (ss + 1) * d], cw))
                    * 1e6
                    + 0.5
                )
                for cw in books[ss]
            ]
            for ss in range(m)
        ]
        scored = [
            (i, sum(dt[ss][codes[i][ss]] for ss in range(m)))
            for i in ids
            if i != qi
        ]
        scored.sort(key=lambda t: (-t[1], t[0]))
        out += [(qi, i, s, r + 1) for r, (i, s) in enumerate(scored[:k])]
    return out


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(6, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_pq_topk_matches_python_reference(spark, n, seed):
    dim, m, k_codes, k = 8, 4, 4, 3
    x = seed or 1
    vecs = {}
    for i in range(n):
        v = []
        for _ in range(dim):
            x = (1103515245 * x + 12345) % (1 << 31)
            v.append((x / float(1 << 31)) * 2.0 - 1.0)
        vecs[i] = v
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    q_ids = [0, 1]
    q = df.filter(F.col("vec_id") < 2)
    want = sorted(_pq_reference(vecs, q_ids, m, k_codes, k))
    for mode in ("sql", "numpy"):
        got = sorted(
            tuple(r)
            for r in SIM.pq_topk(
                df, q, k=k, m=m, k_codes=k_codes, iters=0, assign=mode
            ).collect()
        )
        assert got == want, mode


def _phrase_reference(docs, phrase, k):
    """Independent python count of consecutive-token occurrences."""
    counts = {}
    L = len(phrase)
    for i, d in enumerate(docs):
        c = sum(1 for p in range(len(d) - L + 1) if d[p : p + L] == phrase)
        if c:
            counts[i] = c
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i, c, r + 1) for r, (i, c) in enumerate(ranked)]


@pytest.mark.usefixtures("spark")
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=corpus_strategy,
    phrase=st.lists(st.sampled_from(WORDS[:3]), min_size=1, max_size=3),
)
def test_phrase_matches_python_reference(spark, docs, phrase):
    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["doc_id"], r["n_occurrences"], r["rank"])
        for r in SRCH.phrase_topk(df, phrase, k=5).orderBy("rank").collect()
    ]
    assert got == _phrase_reference(docs, phrase, 5)


def test_phrase_overlapping_and_repeated_terms(spark):
    # overlapping matches count individually; repeated-term phrases work
    df = spark.createDataFrame(
        [(0, "a a a a"), (1, "a b a b a"), (2, "b b")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_occurrences"]
        for r in SRCH.phrase_topk(df, ["a", "a"], k=10).collect()
    }
    assert out == {0: 3}
    out2 = {
        r["doc_id"]: r["n_occurrences"]
        for r in SRCH.phrase_topk(df, ["a", "b"], k=10).collect()
    }
    assert out2 == {1: 2}
