"""tail_stream trigger cost vs table file count (r9 verdict ask #5).

Spark's file stream source re-lists the watched directory on EVERY
trigger to discover new files, so tail_stream's per-trigger latency
grows with files-ever-written until compact() collapses them.  Nobody
had measured the slope.  This probe does: identical tables at 1x / 10x /
100x file counts, one tail_stream each, and the per-trigger listing
cost read from the engine's own progress telemetry (`latestOffset` +
`triggerExecution` durations) on IDLE triggers — no new data, so the
measured work is exactly the re-list + bookkeeping the 100 TB question
is about.

Method per cell: seed a real table (2 appends via the lifecycle, so
_meta + layout are authentic), then fan file count out by hard-copying
an existing data file under fresh names into the same partition dirs
(content is irrelevant to listing cost; names and dirs are what the
source walks).  Start tail_stream -> noop-ish foreachBatch with a 250 ms
processingTime trigger, let the initial backlog batch drain, then sample
the next 8 idle-trigger progress events and report median/max
latestOffset duration.  Flat-ish medians across cells = listing is not
yet the bottleneck at these counts; a linear slope quantifies when the
documented compact-cadence contract must kick in.

Run: python tools/probe_tail_stream.py
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from dp3_spark.session import get_spark  # noqa: E402
from dp3_spark.streaming.lifecycle import VersionedLogTable  # noqa: E402

ROOT = "/root/repo/data/probe_tail"


def mkbatch(spark, seq0, n=8):
    rows = [
        ("p1", f"/t{k % 4}", 1000 + seq0 + k, seq0 + k, float(k))
        for k in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "producer string, topic string, log_time long, sequence long, v double",
    )


def build_cell(spark, root, target_files):
    shutil.rmtree(root, ignore_errors=True)
    t = VersionedLogTable(spark, root, gc_grace_sec=0.0)
    t.append(mkbatch(spark, 0))
    t.append(mkbatch(spark, 100))
    files = t._list_data_files()
    i = 0
    while len(files) < target_files:
        src = files[i % len(files)]
        dst = os.path.join(os.path.dirname(src), f"copy-{i:06d}.parquet")
        shutil.copyfile(src, dst)
        i += 1
        files.append(dst)
    return t, len(t._list_data_files())


def measure(t, idle_samples=8):
    q = (
        t.tail_stream()
        .writeStream.foreachBatch(lambda df, _: df.count())
        .trigger(processingTime="250 milliseconds")
        .option(
            "checkpointLocation", os.path.join(t.root, "_probe_ckpt")
        )
        .start()
    )
    try:
        # wait for the backlog batch to drain
        deadline = time.time() + 300
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["numInputRows"] == 0 and p["batchId"] > 0:
                break
            time.sleep(0.25)
        seen, lat, trig = set(), [], []
        deadline = time.time() + 60
        while len(lat) < idle_samples and time.time() < deadline:
            p = q.lastProgress
            if p and p["numInputRows"] == 0 and p["batchId"] not in seen:
                seen.add(p["batchId"])
                d = p.get("durationMs", {})
                if "latestOffset" in d:
                    lat.append(d["latestOffset"])
                if "triggerExecution" in d:
                    trig.append(d["triggerExecution"])
            time.sleep(0.1)
    finally:
        q.stop()
    lat.sort()
    trig.sort()
    mid = len(lat) // 2
    return {
        "idle_latestOffset_ms": {
            "median": lat[mid] if lat else -1,
            "max": lat[-1] if lat else -1,
            "n": len(lat),
        },
        "idle_triggerExecution_ms": {
            "median": trig[len(trig) // 2] if trig else -1,
            "max": trig[-1] if trig else -1,
        },
    }


def main():
    spark = get_spark("tail-stream-probe")
    out = {}
    for label, target in [("1x", 12), ("10x", 120), ("100x", 1200)]:
        root = os.path.join(ROOT, label)
        t, nfiles = build_cell(spark, root, target)
        res = measure(t)
        res["files"] = nfiles
        out[label] = res
        print(f"{label}: {json.dumps(res)}", file=sys.stderr)
    print(json.dumps(out))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
