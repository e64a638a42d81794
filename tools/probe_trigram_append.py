"""Per-append trigram-index maintenance cost vs table file count (r9
verdict ask #1 done-criterion).

The r9 finding: `update_trigram_index` walked every file ever written
and re-read the sidecar's covered-file set on EVERY append — O(table)
driver cost per append, minutes at 100 TB / millions of files.  Round
10 routes the normal path through the append's own per-version manifest
slice plus a `_meta/trigram_wm.json` watermark: O(batch), no walk, no
sidecar read.  This probe measures the thing the claim is about: the
wall-clock of the SAME one-row append against tables holding 1x / 10x /
100x as many files.

Method: for each cell, build a table with N pre-existing files (N
appends of K topics each produce N*K files — topics vary per append so
file count, not row count, is what scales), then time `append()` of an
identical single-row batch 3 times (fresh rows each — dedup keys differ)
and report each.  A flat series across cells = per-append cost is
independent of table file count.  For contrast, `repair_sec` times one
forced full-diff repair (marker removed) per cell — THAT is expected to
grow with file count, which is exactly why it must not run per append.

Run: python tools/probe_trigram_append.py  (one Spark session; the
table ops are driver/metadata-dominated so session sharing is fair).
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from dp3_spark.session import get_spark  # noqa: E402
from dp3_spark.streaming.lifecycle import VersionedLogTable  # noqa: E402

ROOT = "/root/repo/data/probe_trigram"


def mkbatch(spark, seq0, n_topics, text="alpha"):
    rows = [
        ("p1", f"/t{k}", 1000 + seq0 + k, seq0 + k, f"{text}{seq0 + k}")
        for k in range(n_topics)
    ]
    return spark.createDataFrame(
        rows,
        "producer string, topic string, log_time long, sequence long, props string",
    )


def build_cell(spark, root, n_appends, topics_per_append=8):
    shutil.rmtree(root, ignore_errors=True)
    t = VersionedLogTable(
        spark, root, trigram_cols=("props",), gc_grace_sec=0.0
    )
    seq = 0
    for _ in range(n_appends):
        t.append(mkbatch(spark, seq, topics_per_append))
        seq += topics_per_append
    return t, seq


def main():
    spark = get_spark("trigram-append-probe")
    out = {}
    for label, n_appends in [("1x", 4), ("10x", 40), ("100x", 400)]:
        root = os.path.join(ROOT, label)
        t, seq = build_cell(spark, root, n_appends)
        nfiles = len(t._list_data_files())
        appends = []
        for i in range(3):
            b = mkbatch(spark, seq, 1, text="zeta")
            seq += 1
            t0 = time.perf_counter()
            t.append(b)
            appends.append(round(time.perf_counter() - t0, 3))
        # forced repair: what every append USED to pay (r9 and earlier)
        os.remove(t._trigram_marker_path)
        b = mkbatch(spark, seq, 1, text="eta")
        seq += 1
        t0 = time.perf_counter()
        t.append(b)
        repair = round(time.perf_counter() - t0, 3)
        out[label] = {
            "files": nfiles,
            "append_sec": appends,
            "append_min": min(appends),
            "repair_sec": repair,
        }
        print(f"{label}: {out[label]}", file=sys.stderr)
    print(json.dumps(out))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
