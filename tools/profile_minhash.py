#!/usr/bin/env python3
"""Per-phase wall-clock breakdown of the minhash dedup pipeline at sf0.1.

Replays minhash_lsh_pairs' stages with explicit materialization barriers
(noop sink) so each phase's cost is visible: signature pass, cache
materialize + count, banding/candidate join, verify.  Guide §1: measure
first, isolate with the noop sink.

Usage: python tools/profile_minhash.py [all|capped]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dp3_spark.operators import dedup as DD  # noqa: E402
from dp3_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("dp3_profile_minhash")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    par = spark.sparkContext.defaultParallelism

    t = {}

    def mark(name, fn):
        t0 = time.perf_counter()
        out = fn()
        t[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {t[name]}s", file=sys.stderr)
        return out

    # session warm (codegen + python workers)
    noop(docs.select(F.count("*")))
    sigs0 = DD.minhash_signatures(docs.repartition(par), "doc_id", "text",
                                  n=3, num_hashes=128)
    mark("warm_sig_pass", lambda: noop(sigs0))

    # phase 1: signature pass alone (steady state)
    sigs1 = DD.minhash_signatures(docs.repartition(par), "doc_id", "text",
                                  n=3, num_hashes=128)
    mark("sig_pass_noop", lambda: noop(sigs1))

    # phase 2: cache + count (the operator's actual materialization)
    sigs = DD.minhash_signatures(docs.repartition(par), "doc_id", "text",
                                 n=3, num_hashes=128).cache()
    mark("cache_count", lambda: sigs.count())

    rows = 128 // 16
    # phase 3: banding + candidate join (+ window when capped)
    if mode == "capped":
        from pyspark.sql import Window

        bex = mark(
            "banded_checkpoint",
            lambda: DD._banded_frame(sigs, 16, rows, exact_vals=True)
            .localCheckpoint(eager=True),
        )
        banded = bex.drop("band_vals")
        wo = Window.partitionBy("band", "band_key", "band_vals").orderBy("id")
        lhs = (
            bex.withColumn("rn", F.row_number().over(wo))
            .filter(F.col("rn") <= 64)
            .drop("rn", "band_vals")
        )
    else:
        banded = DD._banded_frame(sigs, 16, rows)
        lhs = banded
    cand = (
        lhs.alias("x")
        .join(banded.alias("y"), ["band", "band_key"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
    )
    mark("cand_join_noop", lambda: noop(cand))
    n_cand = mark("cand_count", lambda: cand.count())
    print(f"  candidates: {n_cand}", file=sys.stderr)

    # phase 4: verify broadcast (collect + mapInPandas) incl. repartition
    cand2 = cand.repartition(2 * par)
    t0 = time.perf_counter()
    ver = DD._verify_broadcast(cand2, sigs, 0.7).dropDuplicates(["id_a", "id_b"])
    t["verify_build_incl_collect"] = round(time.perf_counter() - t0, 3)
    print(f"  verify_build_incl_collect: {t['verify_build_incl_collect']}s",
          file=sys.stderr)
    mark("verify_noop", lambda: noop(ver))

    # end-to-end steady state for reference
    e2e = DD.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=128, bands=16, threshold=0.7,
        candidates=mode if mode == "capped" else "all",
    )
    mark("e2e_noop", lambda: noop(e2e))
    e2e2 = DD.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=128, bands=16, threshold=0.7,
        candidates=mode if mode == "capped" else "all",
    )
    mark("e2e_noop_run2", lambda: noop(e2e2))
    print(t)


if __name__ == "__main__":
    main()
