"""Product quantization ANN (operators/similarity.py pq_*): encode shape,
sql/numpy kernel parity, recall scaling with codebook size, error paths."""

import math

import pytest
from pyspark.sql import functions as F

from dp3_spark.operators import similarity as SIM


def _lcg_vecs(n, dim, seed=1):
    """Deterministic pseudo-random vectors (no RNG state dependence)."""
    x = seed
    out = []
    for i in range(n):
        v = []
        for _ in range(dim):
            x = (1103515245 * x + 12345) % (1 << 31)
            v.append((x / float(1 << 31)) * 2.0 - 1.0)
        out.append((i, v))
    return out


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _lcg_vecs(200, 16), "vec_id long, embedding array<double>"
    ).localCheckpoint(eager=True)


def test_pq_encode_shape_and_range(emb):
    books = SIM.pq_fit_codebooks(emb, m=4, k_codes=8, iters=0)
    assert len(books) == 4 and len(books[0]) == 8 and len(books[0][0]) == 4
    enc = SIM.pq_encode(emb, books, assign="numpy").collect()
    assert len(enc) == 200 * 4
    assert all(0 <= r["code"] < 8 and 0 <= r["subspace"] < 4 for r in enc)
    # sql path encodes identically (sequential fold vs BLAS argmin)
    enc_sql = SIM.pq_encode(emb, books, assign="sql").collect()
    assert sorted(map(tuple, enc)) == sorted(map(tuple, enc_sql))


def test_pq_topk_sql_numpy_parity(emb):
    q = emb.filter(F.col("vec_id") < 10)
    a = SIM.pq_topk(emb, q, k=5, m=4, k_codes=8, iters=0, assign="sql").collect()
    b = SIM.pq_topk(emb, q, k=5, m=4, k_codes=8, iters=0, assign="numpy").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_q = {}
    for r in a:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        assert sorted(r["rank"] for r in rows) == [1, 2, 3, 4, 5]
        assert all(r["neighbor_id"] != r["query_id"] for r in rows)


def test_pq_recall_scales_with_codebook(emb):
    """More codes + Lloyd refinement must not lose to the coarsest seeded
    codebook — the quality knob the 100 TB deployment would turn."""
    q = emb.filter(F.col("vec_id") < 10)
    exact = SIM.ip_topk(emb, q, k=5)

    def mean_recall(k_codes, iters):
        ap = SIM.pq_topk(emb, q, k=5, m=4, k_codes=k_codes, iters=iters)
        rows = SIM.topk_recall(exact, ap, k=5).collect()
        return sum(r["recall"] for r in rows) / len(rows)

    coarse, fine = mean_recall(4, 0), mean_recall(64, 2)
    assert fine >= coarse
    assert fine >= 0.3


def test_ip_topk_matches_python_brute(emb):
    rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    got = SIM.ip_topk(emb, emb.filter(F.col("vec_id") == 3), k=4).collect()
    qv = rows[3]
    scored = sorted(
        ((sum(x * y for x, y in zip(qv, v)), -i) for i, v in rows.items() if i != 3),
        key=lambda t: (-t[0], -t[1]),
    )
    want = [-i for _, i in scored[:4]]
    assert [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"])] == want
    for r in got:
        assert math.isclose(r["ip"], sum(x * y for x, y in zip(qv, rows[r["neighbor_id"]])))


def test_pq_error_paths(emb):
    with pytest.raises(ValueError, match="not divisible"):
        SIM.pq_fit_codebooks(emb, m=5)
    with pytest.raises(ValueError, match="assign"):
        SIM.pq_topk(emb, emb.limit(1), assign="nope")
    empty_q = emb.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="query"):
        SIM.pq_topk(emb, empty_q, m=4, assign="numpy")
