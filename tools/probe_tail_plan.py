"""/tail poll-planning cost: manifest plan vs legacy scan (round 10).

The tail route's version-boundary plan used to be a
groupBy(version).count() over every row past the cursor — per poll.
With per-version manifests the same plan comes from small-object reads
alone (lifecycle.tail_version_counts).  This probe times both
derivations against tables with 1x / 10x / 100x versions-and-files, at
a cursor of 0 (worst case: the plan covers the whole history).

Expectation: the manifest plan is milliseconds and flat-ish (it reads
one small object per version — O(versions), no Spark job, no listing);
the legacy derivation pays a Spark aggregation whose input listing and
scan grow with the table.

Run: python tools/probe_tail_plan.py
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from dp3_spark.session import get_spark  # noqa: E402
from dp3_spark.streaming.lifecycle import VersionedLogTable  # noqa: E402

ROOT = "/root/repo/data/probe_tailplan"


def mkbatch(spark, seq0, n=200):
    rows = [
        ("p1", f"/t{k % 4}", 1000 + seq0 + k, seq0 + k, float(k))
        for k in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "producer string, topic string, log_time long, sequence long, v double",
    )


def legacy_plan(t, frm=0):
    tl = t.tail(frm)
    return tl.groupBy("version").count().orderBy("version").collect()


def main():
    spark = get_spark("tail-plan-probe")
    out = {}
    for label, n_appends in [("1x", 3), ("10x", 30), ("100x", 300)]:
        root = os.path.join(ROOT, label)
        shutil.rmtree(root, ignore_errors=True)
        t = VersionedLogTable(spark, root, gc_grace_sec=0.0)
        seq = 0
        for _ in range(n_appends):
            t.append(mkbatch(spark, seq))
            seq += 200
        nfiles = len(t._list_data_files())
        man = []
        for _ in range(3):
            t0 = time.perf_counter()
            plan = t.tail_version_counts(0)
            man.append(round(time.perf_counter() - t0, 4))
        leg = []
        for _ in range(3):
            t0 = time.perf_counter()
            lp = legacy_plan(t)
            leg.append(round(time.perf_counter() - t0, 4))
        assert len(plan) == len(lp) == n_appends
        assert sum(r for _, r in plan) == sum(r["count"] for r in lp)
        out[label] = {
            "versions": n_appends,
            "files": nfiles,
            "manifest_plan_sec": min(man),
            "legacy_scan_sec": min(leg),
        }
        print(f"{label}: {out[label]}", file=sys.stderr)
    print(json.dumps(out))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
