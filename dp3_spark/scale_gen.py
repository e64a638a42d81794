"""Deterministic scale-up generator for the bench's empirical scaling runs.

Weak-scales the driver fixtures by an integer factor (default 10x: sf0.1
-> "sf1") while PRESERVING the per-copy statistical structure every
operator family's cost model depends on, so time-vs-rows curves are
interpretable:

- documents: copy k maps every text through a seeded PERMUTATION of the
  lowercase alphabet (translate()).  The dedup operators shingle on
  CHARACTER n-grams (functions/text.shingles), and a character bijection
  is a bijection on that shingle space: within-copy Jaccard — and
  therefore the planted near-dup pair structure MinHash/LSH banding sees
  — is preserved EXACTLY (lengths too), while cross-copy similarity
  collapses to the random-overlap floor (~150 distinct shingles/doc over
  a 26^3 space -> ~1 shared shingle per cross pair, Jaccard ~0.004, far
  below every dedup threshold).  Near-dup pairs per copy are identical
  to the source corpus: pairs scale exactly linearly with rows, the
  definition of clean weak scaling for dedup.  (A vocabulary-level
  permutation was tried first and REJECTED by measurement: char-level
  shingles are not invariant under word substitution — within-copy ratio
  drifted to 9.07x and 1754 cross-copy pairs appeared.)
- embeddings: copy k applies a seeded dimension permutation + sign-flip
  vector.  Both are isometries: within-copy cosines (and hence ANN
  neighbor structure, dup pairs, cluster geometry) are bit-preserved
  modulo float add order, cross-copy vectors decorrelate.
- events: copy k shifts user_id/event_id — same time window, 10x
  producers, per-producer session/gap structure identical.  This is how
  telemetry actually scales (more robots, not longer history), and it
  matches the repo's partition-by-producer plans.
- TPC-H tables: per-copy consistent key shifts (custkey/orderkey/
  partkey/suppkey); region/nation stay fixed as in real TPC-H scaling.

Copy 0 is the identity: the scaled directory is a superset of the
source.  Every table is written as a DIRECTORY of per-copy parquet part
files (spark.read.parquet handles directories transparently) so the
scan starts from `copies` input splits instead of one.

Everything is seeded (random.Random(f"{seed}:{k}")) — no wall-clock, no
global RNG: re-running produces byte-identical data.
"""

from __future__ import annotations

import os
import random

import duckdb

TABLES_FIXED = ("region", "nation")

# per-copy key shifts: column -> stride multiplier source (row count of
# the owning table at the source scale is computed at runtime)
_KEYED = {
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
    "events": {"event_id": "events", "user_id": "__max_user_id"},
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
}


_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def _translate_expr(k: int, seed: int) -> str:
    """translate() expression applying a seeded lowercase-alphabet
    permutation (k=0: identity).  A character bijection is a bijection on
    the character-n-gram shingle space the dedup operators use
    (functions/text.shingles), so within-copy Jaccard — and the planted
    near-dup pair structure — is preserved EXACTLY, lengths included,
    while cross-copy shingle overlap collapses to the random floor
    (~150^2/26^3 ≈ 1 shared shingle per doc pair).  It also commutes with
    dedup normalization (lowercase + strip non-alnum-space)."""
    if k == 0:
        return "text"
    perm = list(_ALPHABET)
    random.Random(f"{seed}:doc:{k}").shuffle(perm)
    return f"translate(text, '{_ALPHABET}', '{''.join(perm)}')"


def _embed_expr(dim: int, k: int, seed: int) -> str:
    """list_value expression applying dimension permutation + sign flips
    (k=0: identity)."""
    if k == 0:
        return "embedding"
    rng = random.Random(f"{seed}:emb:{k}")
    perm = list(range(1, dim + 1))
    rng.shuffle(perm)
    signs = [rng.choice((1, -1)) for _ in range(dim)]
    terms = ", ".join(
        f"embedding[{p}] * {s}" for p, s in zip(perm, signs)
    )
    return f"cast(list_value({terms}) as float[])"


def generate(src_dir: str, out_dir: str, *, copies: int = 10, seed: int = 42) -> None:
    """Write the scaled fixture set under out_dir.  Idempotent: skips if
    the completion marker exists."""
    marker = os.path.join(out_dir, f"_GENERATED_x{copies}_seed{seed}")
    if os.path.exists(marker):
        return
    con = duckdb.connect()
    counts = {
        t: con.execute(f"select count(*) from '{src_dir}/{t}.parquet'").fetchone()[0]
        for t in _KEYED
    }
    counts["__max_user_id"] = (
        con.execute(f"select max(user_id) + 1 from '{src_dir}/events.parquet'").fetchone()[0]
    )
    dim = con.execute(
        f"select len(embedding) from '{src_dir}/embeddings.parquet' limit 1"
    ).fetchone()[0]

    for t in TABLES_FIXED:
        os.makedirs(f"{out_dir}", exist_ok=True)
        con.execute(
            f"COPY (select * from '{src_dir}/{t}.parquet') TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )

    for t, keys in _KEYED.items():
        tdir = f"{out_dir}/{t}.parquet"
        os.makedirs(tdir, exist_ok=True)
        cols = [
            r[0]
            for r in con.execute(
                f"describe select * from '{src_dir}/{t}.parquet'"
            ).fetchall()
        ]
        for k in range(copies):
            sel = []
            for c in cols:
                if c in keys:
                    sel.append(f"{c} + {k * counts[keys[c]]} as {c}")
                elif t == "documents" and c == "text":
                    sel.append(f"{_translate_expr(k, seed)} as text")
                # n_chars unchanged: a character bijection preserves length
                elif t == "embeddings" and c == "embedding":
                    sel.append(f"{_embed_expr(dim, k, seed)} as embedding")
                else:
                    sel.append(c)
            con.execute(
                f"COPY (select {', '.join(sel)} from '{src_dir}/{t}.parquet') "
                f"TO '{tdir}/part-{k:02d}.parquet' (FORMAT PARQUET)"
            )
    with open(marker, "w") as f:
        f.write("ok\n")


if __name__ == "__main__":
    import sys

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "scale_sf1"
    )
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(src, out, copies=copies)
    print(out)
