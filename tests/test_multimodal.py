"""Perceptual-hash image dedup (multimodal.image_dhash / image_dup_pairs):
real decode -> integer dHash -> pigeonhole hamming blocking, against
hand-computed vectors."""

import pytest

def test_image_dhash_known_vector_and_roundtrip(spark):
    """dHash bits are pure integer gradient signs of the DECODED pixels:
    a hand-computed 32x32 ramp must produce the exact packed hash, PNG
    and BMP payloads must agree (both decoders are lossless), and an
    off-geometry frame must refuse."""
    import numpy as np

    from dp3_spark.sources import multimodal as MM

    r = np.arange(32).reshape(-1, 1)
    c = np.arange(32).reshape(1, -1)
    gray = ((r * 3 + c * 7) % 256).astype(np.uint8)
    img = np.repeat(gray[..., None], 3, axis=2)

    # reference hash straight from the definition
    sums = gray.astype(np.int64).reshape(8, 4, 8, 4).sum(axis=(1, 3))
    bits = (sums[:, :-1] > sums[:, 1:]).astype(np.int64)
    idx = np.arange(8).reshape(-1, 1) * 7 + np.arange(7).reshape(1, -1)
    expect = int((bits << idx).sum())

    df = spark.createDataFrame(
        [(1, bytearray(MM.encode_png(img))), (2, bytearray(MM.encode_bmp(img)))],
        "doc_id long, payload binary",
    )
    got = {r["id"]: r["dhash"] for r in MM.image_dhash(df).collect()}
    assert got == {1: expect, 2: expect}

    bad = spark.createDataFrame(
        [(3, bytearray(MM.encode_png(img[:16])))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="32x32"):
        MM.image_dhash(bad).collect()


def test_image_dup_pairs_blocks_never_cartesian(spark):
    """Hamming blocking must plan as an equi-join on (blk, key) — never a
    cartesian product — and find exact dups (hamming 0) plus near dups
    within the cap while excluding distant frames."""
    import numpy as np

    from dp3_spark.sources import multimodal as MM

    r = np.arange(32).reshape(-1, 1)
    c = np.arange(32).reshape(1, -1)

    def png(v):
        gray = (v % 256).astype(np.uint8)
        return bytearray(MM.encode_png(np.repeat(gray[..., None], 3, axis=2)))

    base = r * 5 + c * 11
    near = base + ((r * 32 + c) % 131 == 0)  # nudges few block sums
    far = (r * 32 + c) * 37  # different structure entirely
    df = spark.createDataFrame(
        [(1, png(base)), (2, png(base)), (3, png(near)), (4, png(far))],
        "doc_id long, payload binary",
    )
    out = MM.image_dup_pairs(df, max_hamming=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    pairs = {(p["id_a"], p["id_b"]): p["hamming"] for p in out.collect()}
    assert pairs[(1, 2)] == 0  # exact copy found
    assert all(4 not in k for k in pairs)  # distant frame excluded


def test_image_dhash_on_error_skip_quarantines_bad_payloads(spark):
    """on_error='skip' drops undecodable or wrong-geometry payloads from
    the signature output instead of aborting the whole dedup job; the
    default stays strict (raise).  At corpus scale a few corrupt frames
    are the norm — one bad row must not kill a 100 TB pass."""
    import numpy as np

    from dp3_spark.sources import multimodal as MM

    r = np.arange(32).reshape(-1, 1)
    c = np.arange(32).reshape(1, -1)
    gray = ((r * 3 + c * 7) % 256).astype(np.uint8)
    img = np.repeat(gray[..., None], 3, axis=2)
    good = bytearray(MM.encode_png(img))
    wrong_size = bytearray(MM.encode_png(img[:16]))
    garbage = bytearray(b"\x89PNGnot really a png at all")

    df = spark.createDataFrame(
        [(1, good), (2, wrong_size), (3, garbage), (4, good)],
        "doc_id long, payload binary",
    )
    out = MM.image_dhash(df, on_error="skip").collect()
    ids = sorted(r["id"] for r in out)
    assert ids == [1, 4]  # bad rows quarantined, good rows hashed
    assert out[0]["dhash"] == out[1]["dhash"]

    with pytest.raises(Exception):  # strict default still aborts
        MM.image_dhash(df).collect()
    with pytest.raises(ValueError, match="on_error"):
        MM.image_dhash(df, on_error="quarantine")

    # pairs path threads the option through
    pairs = MM.image_dup_pairs(df, on_error="skip").collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(1, 4)}
