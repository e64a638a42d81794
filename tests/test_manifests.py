"""Per-version write manifests + grace-window GC (round 9).

The manifest (`_meta/manifest/<gen>/v{N}.list`) is the WAL-batch record
of wal/walmgr.go re-expressed as a commit manifest: rollback and the
offline inspector resolve file -> version from it with ZERO parquet
footer reads, which is what survives a real object store (a listing +
footer-read per file does not).  The grace-window GC (quarantine-rename
now, unlink after `gc_grace_sec`) closes the reader race the r8 verdict
flagged: a reader that listed a file the GC then rolls back completes
its scan instead of failing on FileNotFound.
"""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dp3_spark.streaming.lifecycle import VersionedLogTable


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="dp3_manifest_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def mkbatch(spark, topic, times, producer="dev1"):
    rows = [(producer, topic, t, i, float(i)) for i, t in enumerate(times)]
    return spark.createDataFrame(
        rows, "producer string, topic string, log_time long, sequence long, v double"
    )


def land_partial(spark, table, version, topic="/a", times=(100, 110)):
    """Simulate a writer that allocated `version`, landed files, and died
    before its manifest + flip."""
    (
        mkbatch(spark, topic, list(times), producer="dev2")
        .withColumn("version", F.lit(version))
        .withColumn("producer_bucket", table._bucket_expr())
        .write.mode("append")
        .partitionBy("topic", "producer_bucket")
        .parquet(table._resolve_data_path())
    )


def _no_footer_reads(monkeypatch):
    """Patch ParquetFile to explode: any footer open under the patch is a
    contract violation (manifest-bearing tables resolve without it)."""
    import pyarrow.parquet as pq

    def boom(*a, **k):
        raise AssertionError("parquet footer opened on a manifest-bearing path")

    monkeypatch.setattr(pq, "ParquetFile", boom)


def test_append_and_delete_write_manifests(spark, root):
    t = VersionedLogTable(spark, root)
    v1 = t.append(mkbatch(spark, "/a", [10, 20, 30]))
    v2 = t.delete_range("dev1", "/a", 0, 15)

    mdir = t.manifest_path
    names = sorted(os.listdir(mdir))
    assert f"v{v1:012d}.list" in names and f"v{v2:012d}.list" in names

    mans = t._manifests()
    # every live file is recorded, with its row count, under its version
    v1_entries = mans[f"v{v1:012d}.list"]
    assert sum(v1_entries.values()) == 3
    live = {
        os.path.relpath(p, root)
        for p in t._list_data_files() + t._list_tombstone_files()
    }
    recorded = {rel for entries in mans.values() for rel in entries}
    assert recorded == live


def test_gc_resolves_from_manifests_zero_footer_reads(spark, root, monkeypatch):
    """The verdict's done-criterion: rollback resolves file -> version on
    a manifest-bearing table with zero footer reads — partials AND torn
    files are 'not in any committed manifest', no parquet IO needed."""
    t = VersionedLogTable(spark, root, gc_grace_sec=0.0)
    t.append(mkbatch(spark, "/a", [10, 20]))

    vN = t._next_version()
    land_partial(spark, t, vN)
    part_dir = next(
        d for d, _, fns in os.walk(t._resolve_data_path())
        if any(f.endswith(".parquet") for f in fns)
    )
    torn = os.path.join(part_dir, "part-torn.c000.parquet")
    with open(torn, "wb") as f:
        f.write(b"PAR1not-a-footer")

    _no_footer_reads(monkeypatch)
    removed = t._gc_uncommitted()
    assert removed >= 2  # the partial file(s) + the torn file
    assert not os.path.exists(torn)
    raw_files = t._list_data_files()
    assert raw_files  # v1 survives
    live = {os.path.relpath(p, root) for p in raw_files}
    assert live <= set(t._committed_paths(t.committed_version()))


def test_crashed_manifest_without_flip_is_retired(spark, root):
    """Writer crashed AFTER its manifest write but BEFORE the flip: both
    the files and the above-watermark manifest are rolled back."""
    t = VersionedLogTable(spark, root, gc_grace_sec=0.0)
    t.append(mkbatch(spark, "/a", [10]))
    vN = t._next_version()
    land_partial(spark, t, vN)
    new = [
        p for p in t._list_data_files()
        if os.path.relpath(p, root) not in t._committed_paths(10**9)
    ]
    t._write_manifest(f"v{vN:012d}.list", new, t._file_rows(new))
    # no flip — crash here

    t2 = VersionedLogTable(spark, t.root, gc_grace_sec=0.0)
    t2.append(mkbatch(spark, "/a", [40]))
    assert f"v{vN:012d}.list" not in os.listdir(t2.manifest_path)
    got = sorted(r["log_time"] for r in t2.read().collect())
    assert got == [10, 40]


def test_legacy_table_grandfathered_into_baseline(spark, root):
    """A pre-manifest table's first manifest-bearing write adopts the
    existing committed files via a base manifest; footer fallback still
    rolls back the crash that preceded adoption."""
    t = VersionedLogTable(spark, root, gc_grace_sec=0.0)
    t.append(mkbatch(spark, "/a", [10, 20]))
    shutil.rmtree(os.path.join(t.meta_path, "manifest"))  # simulate legacy
    vN = t._next_version()
    land_partial(spark, t, vN)

    t2 = VersionedLogTable(spark, root, gc_grace_sec=0.0)
    t2.append(mkbatch(spark, "/a", [30]))
    assert sorted(r["log_time"] for r in t2.read().collect()) == [10, 20, 30]
    names = os.listdir(t2.manifest_path)
    assert any(n.startswith("base_") for n in names)
    # grandfathered files stay; the partial is gone even from a raw scan
    raw = spark.read.parquet(t2._resolve_data_path())
    assert raw.filter(F.col("version") == vN).count() == 0


def test_reader_survives_gc_of_listed_uncommitted_file(spark, root):
    """The r8 'What's wrong #2' race, closed: a reader lists the data
    files (including a crashed writer's partial), the next write's GC
    quarantines that partial, and the reader's job still completes with
    exactly the committed rows — ignoreMissingFiles skips the vanished
    file, whose rows were above the reader's watermark anyway."""
    t = VersionedLogTable(spark, root)  # default grace: quarantine, defer
    t.append(mkbatch(spark, "/a", [10, 20]))
    vN = t._next_version()
    land_partial(spark, t, vN)

    df = t.read()  # listing happens HERE, partial included in the index

    t2 = VersionedLogTable(spark, root)
    t2.append(mkbatch(spark, "/a", [30]))  # GC quarantines the partial

    got = sorted(r["log_time"] for r in df.collect())
    assert got == [10, 20]  # completes; pre-snapshot rows only


def test_quarantine_then_sweep_after_grace(spark, root):
    """Physical deletion is deferred: the quarantined file exists under
    _meta/quarantine until the grace window passes, then the sweep at
    the next write start unlinks it."""
    import json

    t = VersionedLogTable(spark, root, gc_grace_sec=3600.0)
    t.append(mkbatch(spark, "/a", [10]))
    vN = t._next_version()
    land_partial(spark, t, vN)
    t._gc_uncommitted()

    qdir = os.path.join(t.meta_path, "quarantine")
    quarantined = [
        os.path.join(d, f) for d, _, fs in os.walk(qdir) for f in fs
    ]
    assert quarantined  # logical removal done, bytes still on disk
    assert t._gc_sweep() == 0  # inside the grace window: nothing swept

    with open(t._gc_ledger_path) as f:
        ledger = json.load(f)
    with open(t._gc_ledger_path, "w") as f:
        json.dump({k: 0.0 for k in ledger}, f)  # grace expired
    assert t._gc_sweep() == len(ledger)
    assert not any(
        f for _, _, fs in os.walk(qdir) for f in fs
    )


def test_compact_defers_old_generation_within_grace(spark, root):
    """compact() must not delete the superseded generation under a
    running reader: the old dir + pre-compact tombstones survive the
    grace window (a pre-compact reader completes), then sweep."""
    import json

    t = VersionedLogTable(spark, root, gc_grace_sec=3600.0)
    t.append(mkbatch(spark, "/a", [10, 20, 30]))
    t.delete_range("dev1", "/a", 0, 15)

    df = t.read()  # pre-compact snapshot: old generation + tombstones
    old_gen = t._resolve_data_path()
    t.compact()
    assert t._resolve_data_path() != old_gen
    assert os.path.isdir(old_gen)  # still there for in-flight readers
    assert sorted(r["log_time"] for r in df.collect()) == [20, 30]
    assert sorted(r["log_time"] for r in t.read().collect()) == [20, 30]

    with open(t._gc_ledger_path) as f:
        ledger = json.load(f)
    with open(t._gc_ledger_path, "w") as f:
        json.dump({k: 0.0 for k in ledger}, f)
    t._gc_sweep()
    assert not os.path.isdir(old_gen)


def test_compact_writes_base_manifest_for_new_generation(spark, root, monkeypatch):
    """After compact the new generation carries a base manifest, so GC
    keeps resolving with zero footer reads across generations."""
    t = VersionedLogTable(spark, root, gc_grace_sec=0.0)
    t.append(mkbatch(spark, "/a", [10, 20]))
    t.delete_range("dev1", "/a", 0, 15)
    t.compact()

    names = os.listdir(t.manifest_path)
    assert any(n.startswith("base_") for n in names)

    vN = t._next_version()
    land_partial(spark, t, vN)
    _no_footer_reads(monkeypatch)
    assert t._gc_uncommitted() >= 1
    assert sorted(r["log_time"] for r in t.read().collect()) == [20]


def test_inspect_manifest_table_zero_footer_reads(spark, root, monkeypatch):
    """The verdict's second done-criterion: `dp3 inspect` resolves a
    clean manifest-bearing table with zero parquet-footer opens (the
    tiny tombstone files are full column reads, not footer-resolution)."""
    from dp3_spark.inspect_tool import inspect_table

    t = VersionedLogTable(spark, root)
    t.append(mkbatch(spark, "/a", [10, 20, 30]))
    t.append(mkbatch(spark, "/b", [40, 50]))
    t.delete_range("dev1", "/a", 0, 15)

    _no_footer_reads(monkeypatch)
    rep = inspect_table(root)
    assert rep["manifested"] is True
    assert rep["published_versions"] == [1, 2, 3]
    assert rep["versions"]["1"]["rows"] == 3
    assert rep["versions"]["2"]["rows"] == 2
    assert rep["tombstones"][0]["published"] is True


def test_inspect_flags_pending_tombstone(spark, root):
    """ADVICE r8: an unacked (crashed-delete) tombstone must be visibly
    NOT applied — readers filter it, and the report says so."""
    from dp3_spark.inspect_tool import inspect_table

    t = VersionedLogTable(spark, root, gc_grace_sec=0.0)
    t.append(mkbatch(spark, "/a", [10, 20]))
    vN = t._next_version()
    spark.createDataFrame(
        [("dev1", "/a", 0, 25, vN)],
        "producer string, topic string, start_ns long, end_ns long, version long",
    ).write.mode("append").parquet(t.tombstones_path)

    rep = inspect_table(root)
    pend = [x for x in rep["tombstones"] if x["version"] == vN]
    assert pend and pend[0]["published"] is False
    assert vN in rep["pending_versions"]


def test_inspect_distinguishes_foreign_from_torn(spark, root):
    """ADVICE r8: a readable parquet without a `version` column is a
    foreign file, not a 'crashed-writer partial'; a torn footer is."""
    from dp3_spark.inspect_tool import inspect_table

    t = VersionedLogTable(spark, root, gc_grace_sec=0.0)
    t.append(mkbatch(spark, "/a", [10]))
    # foreign: valid parquet, no version column — drop it in the tree,
    # UNMANIFESTED (so the inspector actually opens its footer)
    import pyarrow as pa
    import pyarrow.parquet as pq

    part_dir = next(
        d for d, _, fns in os.walk(t._resolve_data_path())
        if any(f.endswith(".parquet") for f in fns)
    )
    foreign = os.path.join(part_dir, "part-foreign.parquet")
    pq.write_table(pa.table({"x": [1, 2]}), foreign)
    torn = os.path.join(part_dir, "part-torn.parquet")
    with open(torn, "wb") as f:
        f.write(b"PAR1junk")

    rep = inspect_table(root)
    assert [os.path.basename(p) for p in rep["unversioned_files"]] == [
        "part-foreign.parquet"
    ]
    assert [os.path.basename(p) for p in rep["torn_files"]] == ["part-torn.parquet"]


def test_verify_files_detects_truncated_committed_file(spark, root):
    """Manifests record each committed file's byte size at write time;
    verify_files flags a present-but-resized file (truncation/overwrite
    — corruption the default read policy would sail through), alongside
    the existing missing-file audit.  The inspector reports it too."""
    from dp3_spark.inspect_tool import inspect_table

    t = VersionedLogTable(spark, root, gc_grace_sec=0.0)
    t.append(mkbatch(spark, "/a", [10, 20]))
    t.append(mkbatch(spark, "/b", [30]))
    rep = t.verify_files()
    assert rep["missing"] == [] and rep["size_mismatch"] == []

    victim = t._list_data_files()[0]
    keep = os.path.getsize(victim) // 2
    with open(victim, "r+b") as f:
        f.truncate(keep)

    rep = t.verify_files()
    rel = os.path.relpath(victim, t.root)
    assert rep["size_mismatch"] == [rel]
    assert rep["missing"] == []  # present, just wrong

    irep = inspect_table(root)
    assert rel in irep["size_mismatch_files"]


def test_pre_size_manifests_never_flagged(spark, root):
    """Two-field (pre-size-column) manifest lines parse as size-unknown:
    rows still resolve, and the truncation audit stays silent instead of
    false-positiving every old table."""
    t = VersionedLogTable(spark, root, gc_grace_sec=0.0)
    v = t.append(mkbatch(spark, "/a", [10, 20]))
    name = f"v{v:012d}.list"
    full = f"{t._manifest_prefix}/{name}"
    raw = t._backend.get(full).decode()
    stripped = "".join(
        "\t".join(line.split("\t")[:2]) + "\n"
        for line in raw.splitlines()
        if line
    )
    t._backend.put(full, stripped.encode())

    assert all(r >= 0 for r in t._manifests()[name].values())  # rows intact
    rep = t.verify_files()
    assert rep["size_mismatch"] == [] and rep["missing"] == []
    assert sorted(r["log_time"] for r in t.read().collect()) == [10, 20]
