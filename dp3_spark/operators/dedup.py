"""Deduplication operators for training-data pipelines.

Beyond-reference surface (task brief): exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.  All are DataFrame compositions using
the portable primitives in dp3_spark.functions — JVM-side, no Python UDFs,
and (except SimHash bit-ops, which are still deterministic) each has an
exactly-matching DuckDB oracle.

Scale notes (100 TB):
- exact dedup is a hash-partition groupBy on the fingerprint — one shuffle,
  map-side combinable.
- minhash LSH shuffles (band_idx, band_hash) -> candidate pairs; band count
  bounds the blow-up, and the verify step joins back only candidate ids
  (self-join on id is hash-partitioned).  Skewed buckets (boilerplate docs)
  are handled by AQE skew-join splitting.
- all-pairs n-gram jaccard uses an inverted shingle-hash index (explode ->
  join on hash) rather than a cartesian product; frequency-capping drops
  ubiquitous shingles to bound the index fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dp3_spark.functions import text as TXT

POLY_MOD = TXT.POLY_MOD

# MinHash permutation constants: h_j(x) = (A[j] * x + B[j]) mod P.
# Fixed seeds so the oracle SQL embeds identical values.
MINHASH_P = 2_147_483_647  # 2^31 - 1; products stay < 2^62 (no int64 overflow)


def minhash_coeffs(num: int) -> list[tuple[int, int]]:
    # deterministic LCG-derived coefficients (seed fixed, no RNG state)
    coeffs = []
    x = 42
    for _ in range(num):
        x = (x * 6_364_136_223_846_793_005 + 1_442_695_040_888_963_407) % (2**63)
        a = (x % (MINHASH_P - 1)) + 1
        x = (x * 6_364_136_223_846_793_005 + 1_442_695_040_888_963_407) % (2**63)
        b = x % MINHASH_P
        coeffs.append((a, b))
    return coeffs


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id representative per normalized-content fingerprint.
    Output: one row per distinct content with n_copies."""
    fp_s, _ = TXT.fingerprint(text_col)
    with_fp = df.withColumn("fp", F.expr(fp_s))
    w = Window.partitionBy("fp").orderBy(F.col(id_col))
    return (
        with_fp.withColumn("__rn__", F.row_number().over(w))
        .withColumn("n_copies", F.count("*").over(Window.partitionBy("fp")))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def shingle_hash_df(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    # two projections: normalization materializes once per row, then the
    # shingle fold references the plain column.  One inlined expression
    # would re-run the regex per shingle position — O(len^2)/doc.  The
    # multi-reference of __norm__ also stops CollapseProject from fusing.
    norm_s, _ = TXT.normalize(text_col)
    sh_s, _ = TXT.shingle_hashes("__norm__", n, pre_normalized=True)
    return (
        df.select(F.col(id_col).alias("id"), F.expr(norm_s).alias("__norm__"))
        .select("id", F.expr(sh_s).alias("shingles"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with Jaccard(shingle-hash sets) >= threshold.

    Inverted-index join: explode shingle hashes, self-join on hash,
    count shared hashes per pair, then |A ∪ B| = |A| + |B| - shared.
    `max_shingle_freq` drops shingles appearing in more than that many docs
    (stopword-shingle fan-out cap for the 100 TB path)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = (
        shingle_hash_df(df.repartition(par), id_col, text_col, n)
        .withColumn("card", F.size("shingles"))
    )
    exploded = sh.select("id", "card", F.explode("shingles").alias("h"))
    if max_shingle_freq is not None:
        freq = exploded.groupBy("h").agg(F.count("*").alias("__df__"))
        exploded = (
            exploded.join(freq, "h").filter(F.col("__df__") <= max_shingle_freq).drop("__df__")
        )
    a = exploded.select(
        F.col("id").alias("id_a"), F.col("card").alias("card_a"), F.col("h")
    )
    b = exploded.select(
        F.col("id").alias("id_b"), F.col("card").alias("card_b"), F.col("h")
    )
    pairs = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "card_a", "card_b")
        .agg(F.count("*").alias("shared"))
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("card_a") + F.col("card_b") - F.col("shared")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )
    return pairs


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.6,
) -> DataFrame:
    """MinHash + LSH near-dup pairs, verified with exact Jaccard.

    shingle-hash -> `num_hashes` permutation minima -> `bands` band keys ->
    bucket join for candidates -> exact jaccard verify >= threshold.
    Deterministic (fixed coefficients) so results are reproducible and
    oracle-checkable."""
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must divide into equal bands")
    rows = num_hashes // bands
    coeffs = minhash_coeffs(num_hashes)
    # a small parquet reads as few partitions; the signature fold is
    # CPU-bound per row, so spread it across all cores first
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = (
        shingle_hash_df(df.repartition(par), id_col, text_col, n)
        .withColumn("card", F.size("shingles"))
    )
    sig_cols = [
        F.expr(
            f"aggregate(transform(shingles, x -> ({a}L * x + {b}L) % {MINHASH_P}L), "
            f"cast({MINHASH_P} as bigint), (acc, v) -> least(acc, v))"
        ).alias(f"mh{j}")
        for j, (a, b) in enumerate(coeffs)
    ]
    # cache + eager materialization: the shingle+minhash fold is CPU-heavy
    # but byte-small, so AQE would coalesce any recomputation of it (e.g.
    # inside the verify join's broadcast subtree) down to one task, and lazy
    # cache timing makes runtimes vary run-to-run.  Materializing once keeps
    # every consumer parallel and non-redundant.  At true cluster scale this
    # becomes a persisted signatures table, which is how repeated dedup runs
    # anyway.
    sigs = sh.select("id", "shingles", "card", *sig_cols).cache()
    sigs.count()
    band_rows = []
    for bi in range(bands):
        key = F.concat_ws(
            "_", *[F.col(f"mh{bi * rows + r}").cast("string") for r in range(rows)]
        )
        band_rows.append(
            sigs.select("id", F.lit(bi).alias("band"), key.alias("band_key"))
        )
    banded = band_rows[0]
    for br in band_rows[1:]:
        banded = banded.unionByName(br)
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "band_key"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
        # AQE coalesces the post-distinct shuffle to few partitions (rows
        # are tiny) but the next stage does heavy per-row array work —
        # re-spread it or the intersect runs on 2-3 cores.  Cache: the
        # verify job's broadcast subtrees must not re-derive the candidate
        # pipeline (id-pair rows are 16 bytes — cheap to hold).
        .repartition(2 * par)
        .cache()
    )
    cand.count()  # eager: the verify job must read candidates from cache
    # verify candidates with exact jaccard over the shingle sets.  The
    # shingle-set side is doc-count-sized (not pair-sized) — broadcast it so
    # the pair stream never shuffles the big arrays.  At corpus sizes beyond
    # broadcast range, bucket both sides by id range instead.
    sh_sets = sigs.select("id", "shingles", "card")
    verified = (
        cand.join(
            F.broadcast(
                sh_sets.withColumnsRenamed({"id": "id_a", "shingles": "sh_a", "card": "card_a"})
            ),
            "id_a",
        )
        .join(
            F.broadcast(
                sh_sets.withColumnsRenamed({"id": "id_b", "shingles": "sh_b", "card": "card_b"})
            ),
            "id_b",
        )
        .withColumn("shared", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("card_a") + F.col("card_b") - F.col("shared")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash(df: DataFrame, id_col: str, text_col: str, *, bits: int = 32, n: int = 3) -> DataFrame:
    """SimHash signature over shingle hashes: bit k of the signature is the
    majority vote of bit k across all shingle hashes.  32 bits of the
    polynomial hash; deterministic."""
    sh = shingle_hash_df(df, id_col, text_col, n)
    bit_votes = [
        F.expr(
            f"aggregate(shingles, 0, (acc, x) -> acc + case when (x div {1 << k}) % 2 = 1 "
            f"then 1 else -1 end)"
        ).alias(f"v{k}")
        for k in range(bits)
    ]
    voted = sh.select("id", F.size("shingles").alias("card"), *bit_votes)
    sig = voted.select(
        "id",
        sum(
            (F.when(F.col(f"v{k}") > 0, F.lit(1 << k)).otherwise(F.lit(0)) for k in range(bits)),
            start=F.lit(0),
        ).cast("long").alias("simhash"),
    )
    return sig


def simhash_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, *, bits: int = 32, n: int = 3, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Blocked by splitting the signature into max_hamming+1 bit segments:
    a pair within distance d <= max_hamming differs in at most max_hamming
    segments, so by pigeonhole at least one segment matches exactly —
    candidate generation is an equi-join on (segment index, segment bits),
    never a cartesian product.  (Two halves only guarantee recall for
    d <= 1; four segments are required for the default max_hamming=3.)"""
    sig = simhash(df, id_col, text_col, bits=bits, n=n)
    nseg = max_hamming + 1
    width = (bits + nseg - 1) // nseg
    mask = (1 << width) - 1
    segs = [
        F.struct(
            F.lit(k).alias("blk"),
            F.expr(f"shiftright(simhash, {k * width}) & {mask}").alias("key"),
        )
        for k in range(nseg)
    ]
    blocks = sig.select(
        "id",
        "simhash",
        F.explode(F.array(*segs)).alias("b"),
    ).select("id", "simhash", F.col("b.blk").alias("blk"), F.col("b.key").alias("key"))
    cand = (
        blocks.alias("x")
        .join(blocks.alias("y"), ["blk", "key"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.simhash").alias("sig_a"),
            F.col("y.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
