"""Table lifecycle: versioned writes, range delete, truncate, export
versions, tail — the rootmap/tombstone subsystem rebuilt Spark-first
(SURVEY.md §2.5).

Reference mechanisms -> Spark-native equivalents:

- rootmap version per write (rootmap/sqlrootmap.go)    -> monotonically
  increasing `version` recorded per ingest batch in a versions table
- range delete tombstones applied lazily at read
  (tree/tree.go:118-207, tree/iterator.go:268-337)     -> tombstone table
  anti-applied at scan time (predicate, pushed down by Catalyst)
- truncate = min-version pinning (treemgr.go:998-1010) -> truncate tombstone
  with an open time range up to the cutoff
- export with per-topic versions + tail polling
  (routes/export.go, cli/cmd/tail.go)                  -> read-at-version:
  scans filter `ingest_version <= v`; tail = incremental read of versions
  (v_from, v_to]

With Delta/Iceberg the versions table and tombstones collapse into the
table format's transaction log; this implementation keeps plain parquet
(container has no Delta) but isolates every read behind `read()` so the
storage backend can change without touching operators.

Atomic publish (the rootmap-flip analog, treemgr/treemgr.go:866-876):
every write allocates a version, lands its parquet files durably, and
only then flips the `_meta/committed` watermark (tmp + fsync +
os.replace — one small-object conditional put on a real object store).
Every read path filters `version <= committed`, so a reader racing a
writer NEVER observes a partially-committed file set: in-flight files
carry an unpublished version and are invisible until the flip, which
exposes the whole batch at once.  A writer that crashes mid-land (or
between landing and the flip) leaves files with versions in
`(committed, counter]`; the next write GCs them at start, under the
writer lock, BEFORE allocating its own version (`_gc_uncommitted`) —
so a later writer's flip can never expose an earlier writer's partial
(or complete-but-unacknowledged) batch.  A write is durable iff its
flip happened; anything else rolls back.  This is the all-or-nothing
the reference gets from WAL replay (wal/walmgr.go) — with rollback
instead of replay, since the inbound batch is re-submittable upstream
(the ingest path dedups on (producer, topic, log_time, sequence)).

Per-version write manifests (round 9): every append/delete records the
file set it landed — `_meta/manifest/<generation>/v{N}.list`, one
"relpath\\trows" line per file, written tmp+fsync+replace BEFORE the
watermark flip — the WAL-batch record the reference gets from
wal/walmgr.go's replay log, re-expressed as a commit manifest.
Rollback (`_gc_uncommitted`) and the offline inspector resolve
file -> version from the manifests with ZERO parquet-footer reads: a
live file absent from every committed manifest is uncommitted by
construction (its writer died before recording it, or recorded it
under a version above the watermark).  Manifests are per-generation so
compact's pointer flip atomically switches the authoritative manifest
set with the data: the new generation's `base_*.list` manifest is
written right after the flip (a crash in between leaves the new
generation manifest-less, which degrades gracefully to the legacy
footer path until the next write grandfathers it), and the old
generation's manifest dir is retired with the old data files.  Legacy
tables (no manifests) fall back to the original footer-resolution
path; the first write on one grandfathers the existing committed
files into a `base_*.list`.

Reader-vs-GC race (round 9): physical deletion is decoupled from
logical rollback.  `_gc_uncommitted` QUARANTINE-renames uncommitted
files out of the data tree (so no later reader lists them, and the
next flip cannot expose them) and the quarantined bytes are unlinked
only after `gc_grace_sec` by the deferred sweep (`_gc_sweep`, ledger
`_meta/gc_pending.json`).  compact() likewise defers the superseded
generation + pre-compact tombstone files for the same grace window
instead of deleting them under a running reader.  Readers set
`ignoreMissingFiles` on the scan: a file that vanishes between a
reader's listing and its open can only be a quarantined uncommitted
file — above the reader's watermark, so skipping it is exactly what
the version filter would have done — or a superseded generation past
the grace window (out of the read contract, like reading a Delta
table across a VACUUM horizon).  Within the grace window the module
invariant is strict: a reader never observes a partially-committed
file set AND never fails on a listed-then-rolled-back file.

A `compact()` pass physically drops tombstoned rows and rewrites — the
reference's merge-time mask application.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LOG_SCHEMA_META = "producer string, topic string, log_time long, sequence long"
TOMBSTONE_SCHEMA = (
    "producer string, topic string, start_ns long, end_ns long, version long"
)


@dataclass
class VersionedLogTable:
    """A writable dp3-style table: parquet data dir + tombstones dir.

    Writes are append-only with an `ingest_version` column; deletes are
    tombstones; reads apply both lazily (zero rewrite cost, exactly the
    reference's lazy delete-mask application)."""

    spark: SparkSession
    root: str
    # payload string columns to write parquet bloom filters for on every
    # append/compact — the trigram-signature pruning analog (see
    # streaming/ingest.bloom_options): string-equality probes skip row
    # groups whose bloom filter excludes the value.
    bloom_cols: tuple[str, ...] = ()
    # payload string columns to maintain the trigram-signature sidecar
    # index for (operators/trigram.py — per-FILE pruning, the direct
    # statfilter.go:102-127 analog; bloom filters above prune at
    # row-group granularity, the sidecar prunes before any footer is
    # opened).  Maintained incrementally: append() indexes only the
    # files the batch just wrote, compact() rebuilds over the new
    # generation.
    trigram_cols: tuple[str, ...] = ()
    # Number of producer hash buckets in the at-rest layout.  The table
    # hive-partitions by (topic, producer_bucket) — NOT by raw producer:
    # producers are unbounded-cardinality (the sf1 sweep measured a
    # 10k-producer fixture exploding into ~100k partition dirs of tiny
    # files, minutes of filesystem overhead per append; at 100 TB that
    # layout is a small-files catastrophe and a listing-cost wall).
    # Bucketing bounds the partition count at topics x buckets while
    # producer-equality probes still prune: partition pruning via the
    # constant-folded bucket of the probe value, then parquet row-group
    # min/max (appends sort by producer within each bucket file) + the
    # producer bloom filter written on every append, then the trigram
    # sidecar at file granularity.
    producer_buckets: int = 64
    # Parquet codec for appends/compactions.  zstd: ~25-35% smaller files
    # than snappy on log-shaped data at comparable scan speed — at 100 TB
    # that is tens of TB of storage and proportional scan I/O; the
    # reference compresses its tree nodes with zstd too (nodestore).
    # Existing tables mix codecs per file harmlessly (parquet is
    # per-column-chunk codec'd; readers dispatch from metadata).
    compression: str = "zstd"
    # Grace window (seconds) between LOGICAL removal of a file (quarantine
    # out of the data tree / generation supersession) and its PHYSICAL
    # unlink by the deferred sweep.  Sized to outlive any in-flight
    # query's listing-to-open gap so a reader never fails on a file it
    # already listed; 0 = delete immediately (tests; single-process use
    # where no concurrent reader exists).  The Delta-VACUUM-retention
    # analog, hours-scale in a real deployment.
    gc_grace_sec: float = 900.0

    @property
    def data_path(self) -> str:
        return os.path.join(self.root, "data")

    @property
    def tombstones_path(self) -> str:
        return os.path.join(self.root, "tombstones")

    @property
    def meta_path(self) -> str:
        return os.path.join(self.root, "_meta")

    # ------------------------------------------------------------- write
    def current_version(self) -> int:
        """O(1) version lookup from a counter file — the rootmap's
        `SELECT max(version)` over a tiny metadata table
        (rootmap/sqlrootmap.go), NOT a scan of the data table.  At 100 TB
        a per-append max() over the data would pay a full file-listing +
        footer read per write; the counter is one small object.  (On a
        real object store this file becomes a conditional-put or a Delta
        transaction log entry; single-writer is assumed, as in the
        reference's treemgr.)  Falls back to a one-time scan for tables
        created before the counter existed."""
        vf = os.path.join(self.meta_path, "version")
        if os.path.exists(vf):
            with open(vf) as f:
                return int(f.read().strip() or "0")
        vs = [
            self._max_version(self._data(committed_only=False)),
            self._max_version(self._tombstones(committed_only=False)),
        ]
        v = max((x for x in vs if x is not None), default=0)
        self._write_version(v)
        return v

    def _write_version(self, v: int) -> None:
        os.makedirs(self.meta_path, exist_ok=True)
        tmp = os.path.join(self.meta_path, "version.tmp")
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, os.path.join(self.meta_path, "version"))

    def committed_version(self) -> int:
        """The atomic-publish watermark: the highest version whose write
        (data files or tombstone) has been durably published.  Readers
        filter `version <= committed`, so versions allocated by an
        in-flight writer are invisible until its flip — the rootmap-flip
        snapshot isolation (treemgr/treemgr.go:866-876).  Tables written
        before the watermark existed have no file; there every allocated
        version is complete by construction, so fall back to the
        counter."""
        cf = os.path.join(self.meta_path, "committed")
        if os.path.exists(cf):
            with open(cf) as f:
                return int(f.read().strip() or "0")
        return self.current_version()

    def _publish(self, v: int) -> None:
        """Atomically flip the committed watermark to v: tmp + fsync +
        os.replace (one conditional small-object put on an object store).
        Called only after the write's files are fully landed."""
        os.makedirs(self.meta_path, exist_ok=True)
        tmp = os.path.join(self.meta_path, "committed.tmp")
        with open(tmp, "w") as f:
            f.write(str(v))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.meta_path, "committed"))

    def _writer_lock(self):
        """Exclusive advisory lock serializing WRITERS (append / delete /
        compact) — readers never take it.  Without this, two concurrent
        appends can both read counter N and allocate the same version
        N+1 (colliding versions corrupt the history the watermark
        protects), and a compact racing an append can drop the appended
        files with the superseded generation.  The reference gets this
        for free by funneling all writes through one treemgr process;
        here any process can open the table, so the lock enforces the
        same single-writer-at-a-time discipline.  flock is held for the
        write's full duration (one open fd per call, so threads in one
        process serialize too); on an object store this becomes a
        conditional-put/lease on the version counter."""
        import fcntl
        from contextlib import contextmanager

        @contextmanager
        def held():
            os.makedirs(self.meta_path, exist_ok=True)
            with open(os.path.join(self.meta_path, "writer.lock"), "w") as f:
                fcntl.flock(f, fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(f, fcntl.LOCK_UN)

        return held()

    # ------------------------------------------------ manifests / GC
    @property
    def manifest_path(self) -> str:
        """Manifest dir for the CURRENT generation.  Per-generation so
        compact's data_ptr flip atomically switches the authoritative
        manifest set together with the data it describes — a shared dir
        would leave a window where the pointer and the manifests
        disagree about which paths are committed."""
        return os.path.join(
            self.meta_path, "manifest", os.path.basename(self._resolve_data_path())
        )

    def _write_manifest(
        self, name: str, files: list[str], rows: dict[str, int] | None = None
    ) -> None:
        """One "relpath\\trows" line per file; tmp + fsync + replace (the
        same small-object durability discipline as the watermark).  rows
        may be unknown (-1) for base manifests — GC never needs it, only
        the inspector's report does."""
        os.makedirs(self.manifest_path, exist_ok=True)
        tmp = os.path.join(self.manifest_path, name + ".tmp")
        with open(tmp, "w") as f:
            for p in sorted(files):
                rel = os.path.relpath(p, self.root)
                f.write(f"{rel}\t{(rows or {}).get(p, -1)}\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.manifest_path, name))

    def _manifests(self) -> dict[str, dict[str, int]] | None:
        """{manifest_name -> {root-relative path -> rows}} for the current
        generation, or None when the table predates manifests (legacy
        footer-resolution path applies)."""
        mp = self.manifest_path
        if not os.path.isdir(mp):
            return None
        out: dict[str, dict[str, int]] = {}
        for name in sorted(os.listdir(mp)):
            if name.endswith(".tmp") or not name.endswith(".list"):
                continue
            entries: dict[str, int] = {}
            with open(os.path.join(mp, name)) as f:
                for line in f:
                    line = line.rstrip("\n")
                    if not line:
                        continue
                    rel, _, r = line.partition("\t")
                    entries[rel] = int(r or -1)
            out[name] = entries
        return out or None

    @staticmethod
    def _manifest_version(name: str) -> int | None:
        """v{N}.list -> N; base_{W}.list -> None (committed at <= W by
        construction, per-file versions unresolved)."""
        if name.startswith("v"):
            return int(name[1:].split(".")[0])
        return None

    def _committed_paths(self, committed: int) -> set[str] | None:
        """Union of root-relative paths in committed manifests, or None
        on a legacy (manifest-less) table."""
        mans = self._manifests()
        if mans is None:
            return None
        out: set[str] = set()
        for name, entries in mans.items():
            v = self._manifest_version(name)
            if v is None or v <= committed:
                out.update(entries)
        return out

    def _ensure_manifest_baseline(self) -> None:
        """First manifest-bearing write on a legacy table: grandfather
        every existing file into a base manifest so the manifest-driven
        GC never mistakes pre-manifest committed data for a crashed
        write.  Called under the writer lock AFTER _gc_uncommitted, so
        everything still on disk is committed by construction."""
        if self._manifests() is not None:
            return
        existing = self._list_data_files() + self._list_tombstone_files()
        if existing:
            self._write_manifest(
                f"base_{self.committed_version():012d}.list",
                existing,
                self._file_rows(existing),  # one-time footer pass at adoption
            )

    def _file_rows(self, paths: list[str]) -> dict[str, int]:
        """num_rows per freshly-landed file — ONE footer read each, paid
        once at write time so that GC and the inspector never pay it
        again (the manifest carries the counts from then on)."""
        import pyarrow.parquet as pq

        out = {}
        for p in paths:
            try:
                out[p] = pq.ParquetFile(p).metadata.num_rows
            except Exception:
                out[p] = -1
        return out

    @property
    def _gc_ledger_path(self) -> str:
        return os.path.join(self.meta_path, "gc_pending.json")

    def _gc_defer(self, paths: list[str]) -> None:
        """Schedule physical deletion of paths (files or whole dirs) at
        now + gc_grace_sec.  Ledger updates happen under the writer
        lock, so read-modify-write is safe."""
        import json
        import time

        if self.gc_grace_sec <= 0:
            import shutil

            for p in paths:
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
                else:
                    try:
                        os.remove(p)
                    except OSError:
                        pass
            return
        ledger = {}
        if os.path.exists(self._gc_ledger_path):
            with open(self._gc_ledger_path) as f:
                ledger = json.load(f)
        deadline = time.time() + self.gc_grace_sec
        for p in paths:
            ledger[os.path.relpath(p, self.root)] = deadline
        tmp = self._gc_ledger_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ledger, f)
        os.replace(tmp, self._gc_ledger_path)

    def _gc_sweep(self) -> int:
        """Physically remove ledger entries whose grace window has
        passed.  Runs at every write/compact start under the writer
        lock; cheap no-op when the ledger is empty or young."""
        import json
        import shutil
        import time

        if not os.path.exists(self._gc_ledger_path):
            return 0
        with open(self._gc_ledger_path) as f:
            ledger = json.load(f)
        now = time.time()
        removed = 0
        for rel, deadline in list(ledger.items()):
            if deadline > now:
                continue
            p = os.path.join(self.root, rel)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            else:
                try:
                    os.remove(p)
                except OSError:
                    pass
            del ledger[rel]
            removed += 1
        if removed:
            tmp = self._gc_ledger_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(ledger, f)
            os.replace(tmp, self._gc_ledger_path)
        return removed

    def _quarantine(self, path: str) -> None:
        """Logical removal NOW (rename out of the data tree — no later
        reader lists it, and the next watermark flip cannot expose it),
        physical unlink after the grace window.  A reader that already
        listed the old path skips it via ignoreMissingFiles — correct,
        because a quarantined file's rows are above every reader's
        watermark (that is WHY it was quarantined)."""
        rel = os.path.relpath(path, self.root)
        dest = os.path.join(self.meta_path, "quarantine", rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        try:
            os.replace(path, dest)
        except OSError:
            try:
                os.remove(path)  # cross-device fallback: plain unlink
            except OSError:
                pass
            return
        self._gc_defer([dest])

    def _gc_uncommitted(self) -> int:
        """Roll back crashed writes: quarantine every data / tombstone
        file whose version lies in `(committed, counter]` — the
        leftovers of a writer that died mid-land or before its flip.
        Called at the start of every write, under the already-held
        writer lock, BEFORE the new version is allocated; without it a
        writer that crashed after landing SOME of version N's files
        would have those partials exposed by the NEXT writer's
        `committed = N+1` flip (version N <= N+1 passes every reader's
        watermark filter).

        Cost discipline: the normal path is `counter == committed` —
        one integer compare, zero IO.  Only when a crash left the
        counter ahead does the repair pass run.  On a manifest-bearing
        table the committed file set comes straight from the committed
        manifests — ZERO footer reads, object-store-shaped: a live file
        absent from every committed manifest is uncommitted by
        construction (its writer died before recording it or recorded
        it above the watermark).  Legacy tables resolve per-file
        versions from parquet footers as before (each file is written
        by exactly one append, so version is a per-file constant; an
        unreadable footer is a torn write, which can only belong to an
        uncommitted version since committed files land through Spark's
        task-commit rename).  The version counter stays at its
        high-water mark (version numbers may skip; they only need to
        be monotone).  Returns the number of files quarantined."""
        committed = self.committed_version()
        counter = self.current_version()
        if counter <= committed:
            return 0
        import shutil

        known = self._committed_paths(committed)
        removed = 0
        for path in self._list_data_files() + self._list_tombstone_files():
            if known is not None:
                drop = os.path.relpath(path, self.root) not in known
            else:
                drop = self._footer_uncommitted(path, committed)
            if drop:
                self._quarantine(path)
                removed += 1
        # retire manifests recorded above the watermark (writer crashed
        # between its manifest write and its flip)
        mp = self.manifest_path
        if os.path.isdir(mp):
            for name in os.listdir(mp):
                v = (
                    self._manifest_version(name)
                    if name.endswith(".list")
                    else None
                )
                if v is not None and v > committed:
                    os.remove(os.path.join(mp, name))
        # leftover task-attempt dirs from the crashed Spark job
        for base in (self._resolve_data_path(), self.tombstones_path):
            tmp = os.path.join(base, "_temporary")
            if os.path.isdir(tmp):
                shutil.rmtree(tmp, ignore_errors=True)
        return removed

    @staticmethod
    def _footer_uncommitted(path: str, committed: int) -> bool:
        """Legacy per-file resolution (pre-manifest tables): version from
        row-group stats, column read fallback, torn footer = uncommitted."""
        import pyarrow.parquet as pq

        try:
            md = pq.ParquetFile(path).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            v = None
            if "version" in idx:
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx["version"]).statistics
                    if st is None or st.max is None:
                        v = None
                        break
                    v = st.max if v is None else max(v, st.max)
            if v is None:  # stats missing: read the column itself
                col = pq.read_table(path, columns=["version"])["version"]
                v = max(col.to_pylist()) if len(col) else committed + 1
            return v > committed
        except Exception:
            return True  # torn footer = mid-crash partial

    def _list_tombstone_files(self) -> list[str]:
        out = []
        if not os.path.isdir(self.tombstones_path):
            return out
        for dirpath, _, files in os.walk(self.tombstones_path):
            out += [
                os.path.join(dirpath, fn)
                for fn in files
                if fn.endswith(".parquet") and not fn.startswith(("_", "."))
            ]
        return out

    def _next_version(self) -> int:
        cur = self.current_version()
        # initialize the watermark BEFORE allocating: on a legacy table
        # the committed fallback is the counter, which the allocation
        # below bumps — without this, the in-flight version would read
        # as committed
        if not os.path.exists(os.path.join(self.meta_path, "committed")):
            self._publish(cur)
        v = cur + 1
        self._write_version(v)
        return v

    def _max_version(self, df: DataFrame | None) -> int | None:
        if df is None:
            return None
        row = df.agg(F.max("version")).collect()[0]
        return row[0]

    def _bucket_expr(self, col="producer"):
        """Deterministic producer -> bucket.  Used both as the write-side
        partition column and (applied to a literal) as a read-side
        partition-pruning predicate — xxhash64 of a literal constant-folds
        in Catalyst, so `producer = 'x'` probes scan one bucket."""
        c = F.col(col) if isinstance(col, str) else col
        return F.pmod(F.xxhash64(c), F.lit(self.producer_buckets)).cast("int")

    def append(self, df: DataFrame) -> int:
        """Append a batch under the next version (the WAL-batch merge +
        rootmap flip, treemgr/treemgr.go:821-882).  Dedups
        (producer, topic, log_time, sequence) within the batch.

        Layout per batch: one shuffle keyed on the partition columns so
        each (topic, producer_bucket) lands in exactly one task = one
        file (the standard small-files discipline — file count per
        append is bounded by topics x buckets, not by tasks x dirs),
        sorted by (producer, log_time) inside the file so row-group
        min/max stats prune both producer probes and time ranges."""
        with self._writer_lock():
            self._check_layout()
            self._gc_sweep()  # physically drop entries past their grace
            # roll back any crashed predecessor FIRST: its partial files
            # must be out of the data tree before our flip raises the
            # watermark past them
            self._gc_uncommitted()
            self._ensure_manifest_baseline()
            before = set(self._list_data_files())
            version = self._next_version()
            out = (
                df.dropDuplicates(["producer", "topic", "log_time", "sequence"])
                .withColumn("version", F.lit(version))
                .withColumn("producer_bucket", self._bucket_expr())
                .repartition("topic", "producer_bucket")
                # partition cols lead the sort so FileFormatWriter's
                # required ordering is already satisfied — otherwise it
                # re-sorts by the partition cols alone and destroys the
                # fine-grained order
                .sortWithinPartitions(
                    "topic", "producer_bucket", "producer", "log_time", "sequence"
                )
            )
            w = out.write.mode("append").option("compression", self.compression)
            for k, v in self._bloom_opts().items():
                w = w.option(k, v)
            w.partitionBy("topic", "producer_bucket").parquet(
                self._resolve_data_path()
            )
            # record the landed file set BEFORE the flip: rollback and
            # inspect resolve file -> version from this manifest with no
            # footer reads (the diff against `before` is exact — the
            # writer lock excludes concurrent writers)
            new_files = [
                p for p in self._list_data_files() if p not in before
            ]
            self._write_manifest(
                f"v{version:012d}.list", new_files, self._file_rows(new_files)
            )
            # files are fully landed: flip the watermark — only now does
            # this version become visible to any reader (atomic publish)
            self._publish(version)
            self.update_trigram_index()
            return version

    def _check_layout(self) -> None:
        """Refuse to append the bucketed layout into a pre-bucketing data
        dir (producer=... top-level dirs): mixing partition schemes in
        one directory breaks Spark's partition discovery for EVERY
        reader.  Old tables stay readable; migrate by calling compact()
        once (it reads any layout and rewrites the bucketed one)."""
        path = self._resolve_data_path()
        if not os.path.isdir(path):
            return
        for name in os.listdir(path):
            if name.startswith("producer="):
                raise RuntimeError(
                    f"{path} uses the pre-bucketing (producer=, topic=) "
                    "layout; run compact() to migrate it before appending"
                )

    def _bloom_opts(self) -> dict[str, str]:
        from dp3_spark.streaming.ingest import bloom_options

        # producer is a data column (bucketed layout) — always bloom it so
        # producer-equality probes skip row groups within a bucket
        return bloom_options(tuple(dict.fromkeys(("producer",) + self.bloom_cols)))

    def delete_range(self, producer: str, topic: str, start_ns: int, end_ns: int) -> int:
        """Range delete [start, end) as a tombstone (routes/delete.go;
        tree/tree.go:118-207).  Applied lazily at read.

        The tombstone's version pins WHAT it masks: only rows ingested at
        version <= the tombstone's version (the reference's rootmap pins a
        version at delete time, sqlrootmap.go:372-402) — data ingested
        AFTER a delete/truncate stays visible."""
        with self._writer_lock():
            self._gc_sweep()
            self._gc_uncommitted()  # see append(): crashed-writer rollback
            self._ensure_manifest_baseline()
            before = set(self._list_tombstone_files())
            version = self._next_version()
            self.spark.createDataFrame(
                [(producer, topic, start_ns, end_ns, version)], TOMBSTONE_SCHEMA
            ).write.mode("append").parquet(self.tombstones_path)
            new_files = [
                p for p in self._list_tombstone_files() if p not in before
            ]
            self._write_manifest(
                f"v{version:012d}.list", new_files, self._file_rows(new_files)
            )
            self._publish(version)
            return version

    def truncate(self, producer: str, topic: str, end_ns: int | None = None) -> int:
        """`truncate producer topic (now|T);` (ql/grammar.go:45-50;
        treemgr.go:998-1010): delete everything before the cutoff
        (open-ended when `now`)."""
        end = end_ns if end_ns is not None else (1 << 62)
        return self.delete_range(producer, topic, 0, end)

    # -------------------------------------------------------------- read
    def _resolve_data_path(self) -> str:
        """Current data generation.  compact() never rewrites the live dir
        in place; it writes a fresh generation dir and swaps this pointer
        (object-store-safe: no rename of a live prefix)."""
        pf = os.path.join(self.meta_path, "data_ptr")
        if os.path.exists(pf):
            with open(pf) as f:
                name = f.read().strip()
            if name:
                return os.path.join(self.root, name)
        return self.data_path

    def _data(
        self, committed_only: bool = True, watermark: int | None = None
    ) -> DataFrame | None:
        """committed_only (the default for every query path) hides any
        version above the published watermark: a reader racing an
        in-flight append never sees its partial file set.  The predicate
        is a constant on a data column — parquet row-group min/max skips
        unpublished files without decoding them.  committed_only=False
        exists solely for the version-counter bootstrap scan.

        watermark: pass a pre-resolved committed version so a multi-part
        read (data + tombstones) sees ONE snapshot — resolving twice
        would let a concurrent publish land between the two reads and
        apply a newer tombstone against older data.

        ignoreMissingFiles: a file that vanishes between this read's
        listing and its open can only be one the GC quarantined — rows
        above this read's watermark, so skipping it equals what the
        version filter would have done — or a superseded generation
        past the grace window (out of contract; see module header)."""
        try:
            df = (
                self.spark.read.option("ignoreMissingFiles", "true")
                .parquet(self._resolve_data_path())
            )
        except Exception:
            return None
        if committed_only:
            w = self.committed_version() if watermark is None else watermark
            df = df.filter(F.col("version") <= F.lit(w))
        return df

    def _tombstones(
        self, committed_only: bool = True, watermark: int | None = None
    ) -> DataFrame | None:
        try:
            # ignoreMissingFiles: same contract as _data() — only a
            # quarantined (above-watermark) tombstone file or a
            # post-grace compact sweep can vanish mid-read
            df = (
                self.spark.read.option("ignoreMissingFiles", "true")
                .parquet(self.tombstones_path)
            )
        except Exception:
            return None
        if committed_only:
            w = self.committed_version() if watermark is None else watermark
            df = df.filter(F.col("version") <= F.lit(w))
        return df

    def _strip(self, df: DataFrame) -> DataFrame:
        """Drop the internal layout column from an outward-facing frame
        (no-op on tables written before the bucketed layout — drop
        ignores missing columns, so old-layout dirs stay readable)."""
        return df.drop("producer_bucket")

    def read(self, *, as_of_version: int | None = None) -> DataFrame:
        """Current table contents: appended rows minus tombstoned ranges.

        as_of_version: time travel — only writes/deletes with
        version <= as_of_version apply (rootmap versioned reads).

        The tombstone application is a broadcast anti-join on range overlap:
        tombstone counts are tiny relative to data (the reference stores
        them per-leaf), so the data side never shuffles."""
        # ONE watermark resolution for both the data and tombstone reads:
        # a concurrent publish between the two must not apply a newer
        # tombstone against an older data snapshot
        w = self.committed_version()
        df = self._data(watermark=w)
        if df is None:
            raise FileNotFoundError(f"no data at {self.data_path}")
        return self._strip(self._apply_tombstones(df, as_of_version, watermark=w))

    def _apply_tombstones(
        self,
        df: DataFrame,
        as_of_version: int | None = None,
        watermark: int | None = None,
    ) -> DataFrame:
        ts = self._tombstones(watermark=watermark)
        if as_of_version is not None:
            df = df.filter(F.col("version") <= as_of_version)
            if ts is not None:
                ts = ts.filter(F.col("version") <= as_of_version)
        if ts is None or ts.isEmpty():
            return df
        t = ts.select(
            F.col("producer").alias("__tp"),
            F.col("topic").alias("__tt"),
            F.col("version").alias("__tv"),
            "start_ns",
            "end_ns",
        )
        # A tombstone masks only rows ingested at or before it
        # (data.version <= tombstone.version): truncate-then-keep-ingesting
        # must not hide the new data (sqlrootmap.go:372-402,
        # treemgr.go:998-1010).
        cond = (
            (F.col("producer") == F.col("__tp"))
            & (F.col("topic") == F.col("__tt"))
            & (F.col("version") <= F.col("__tv"))
            & (F.col("log_time") >= F.col("start_ns"))
            & (F.col("log_time") < F.col("end_ns"))
        )
        return df.join(F.broadcast(t), cond, "left_anti")

    def tail(self, from_version: int) -> DataFrame:
        """Rows ingested after `from_version` — the export/tail polling
        loop (cli/cmd/tail.go:29-97).  `tail_stream` is the push-based
        upgrade."""
        df = self._data()
        if df is None:
            raise FileNotFoundError(f"no data at {self.data_path}")
        return self._strip(df.filter(F.col("version") > from_version))

    def tail_stream(self, from_version: int = 0) -> DataFrame:
        """Push-based tail: a Structured Streaming file source over the
        data dir.  Every `append()` lands new parquet files, which arrive
        as micro-batches — real streaming instead of the reference's
        client-side export-version polling (cli/cmd/tail.go:29-97; the
        SURVEY §2.5 mapping).  Attach any sink (`foreachBatch`, kafka,
        console); `from_version` skips rows already consumed, exactly like
        the polling loop's version cursor.

        At scale the file source checkpoints its processed-file log, so a
        restarted tail resumes where it left off without re-reading the
        table — pass `.option("checkpointLocation", ...)` on the writer.

        Delivery granularity: the push stream surfaces files as they
        land, AHEAD of the commit watermark — a batch may arrive split
        across micro-batches, and a crashed writer's unacknowledged rows
        can be delivered.  Each file is internally complete (task-commit
        atomicity).  Consumers needing committed-only snapshot semantics
        use the polling `tail()`, which reads through the watermark."""
        df = self._data()
        if df is None:
            raise FileNotFoundError(f"no data at {self.data_path}")
        stream = (
            self.spark.readStream.schema(df.schema)
            # a file the source listed but GC quarantined before the
            # micro-batch read can only be an uncommitted rollback —
            # skip it rather than fail the stream (same contract as the
            # batch readers)
            .option("ignoreMissingFiles", "true")
            .parquet(self._resolve_data_path())
        )
        return self._strip(stream.filter(F.col("version") > from_version))

    # ----------------------------------------------- trigram sidecar index
    @property
    def trigram_index_path(self) -> str:
        return os.path.join(self.root, "_trigram_idx")

    def _list_data_files(self) -> list[str]:
        out = []
        for dirpath, _, files in os.walk(self._resolve_data_path()):
            out += [
                os.path.join(dirpath, fn)
                for fn in files
                if fn.endswith(".parquet") and not fn.startswith(("_", "."))
            ]
        return out

    def update_trigram_index(self) -> int:
        """Index every data file not yet in the sidecar (idempotent diff
        against the index's own file set, so it doubles as repair after a
        crashed append).  Called from append(); each call re-reads only
        the new files — one map-combinable aggregation over the batch
        just written.  The full-listing diff is kept (rather than the
        append's manifest slice) because it is also the REPAIR path: a
        crash between a publish and its index update leaves files the
        next append's own manifest would never cover.  Returns the
        number of files indexed."""
        if not self.trigram_cols:
            return 0
        from dp3_spark.operators.trigram import build_trigram_index, indexed_files

        files = self._list_data_files()
        total = 0
        # diff PER COLUMN: adding a new name to trigram_cols on an
        # existing table back-fills that column's rows for every file the
        # index already covers for the others
        for col in self.trigram_cols:
            covered: set[str] = set()
            try:
                covered = indexed_files(self.spark, self.trigram_index_path, col)
            except Exception:
                pass
            new = [p for p in files if f"file://{p}" not in covered]
            if new:
                build_trigram_index(
                    self.spark,
                    new,
                    [col],
                    self.trigram_index_path,
                    write_mode="append",
                )
            total += len(new)
        return total

    def read_string_probe(
        self,
        column: str,
        needle: str,
        *,
        mode: str = "eq",
        as_of_version: int | None = None,
    ) -> DataFrame:
        """read() restricted to rows where `column` equals (or contains)
        `needle`, scanning ONLY files whose trigram signature can match —
        the reference's statfilter path (statfilter.go:102-127) applied
        at file granularity before any footer IO.  Identical results to
        `read().filter(...)` under EVERY index state (the contract the
        reference's ErrNoStatsFound pass-through sets,
        statfilter.go:118-122): a missing/unreadable sidecar falls back
        to the full scan, and data files the sidecar does not yet cover
        (crash between append's parquet commit and the index update,
        or a table written before trigram_cols was set) are always
        scanned — only provably-safe skips happen.  Tombstone/version
        semantics preserved; basePath keeps the partition columns on the
        file-list scan."""
        from dp3_spark.operators.trigram import probe_index

        w = self.committed_version()  # one snapshot for every sub-read
        full = self._data(watermark=w)
        if full is None:
            raise FileNotFoundError(f"no data at {self.data_path}")
        pred = (
            (F.col(column) == needle)
            if mode == "eq"
            else F.col(column).contains(needle)
        )
        if column == "producer" and mode == "eq" and "producer_bucket" in full.columns:
            # constant-folded bucket of the needle -> partition pruning:
            # the scan lists only one producer_bucket=K dir per topic
            pred = pred & (
                F.col("producer_bucket") == self._bucket_expr(F.lit(needle))
            )
        if not self.trigram_cols or column not in self.trigram_cols:
            return self._strip(
                self._apply_tombstones(full, as_of_version, watermark=w).filter(pred)
            )
        try:
            survivors, covered = probe_index(
                self.spark, self.trigram_index_path, column, needle, mode=mode
            )
        except Exception:
            # sidecar missing or unreadable: correctness first, no pruning
            return self._strip(
                self._apply_tombstones(full, as_of_version, watermark=w).filter(pred)
            )
        live = {f"file://{p}" for p in self._list_data_files()}
        # unindexed data files can never be skipped; index rows for files
        # a compact() crash already deleted must not be read
        files = sorted((survivors & live) | (live - covered))
        if not files:
            return self._strip(full.limit(0).filter(F.lit(False)))
        df = (
            self.spark.read.option("basePath", self._resolve_data_path())
            .option("ignoreMissingFiles", "true")  # same contract as _data()
            .schema(full.schema)
            .parquet(*files)
            # the explicit file list bypasses _data(): re-apply the same
            # snapshot watermark so an in-flight append stays invisible
            # on this path too
            .filter(F.col("version") <= F.lit(w))
        )
        return self._strip(
            self._apply_tombstones(df, as_of_version, watermark=w).filter(pred)
        )

    def log_store(self, *, payload_cols: tuple[str, ...] = ()):
        """This table as a queryable LogStore for the QL compiler, with
        the trigram sidecar wired in as the scan-time string probe — the
        reference's statfilter applied inside the scan
        (tree/iterator.go:177-187).  A QL `where t.col = 'x'` on an
        indexed column then reads only files whose signature can match;
        results are identical either way (tests pin parity + fewer
        input files)."""
        from dp3_spark.catalog import LogStore

        def probe(column: str, needle: str, mode: str):
            # raw (un-normalized) frame replacement: tombstones/version
            # masking are applied by the probe read itself
            return self.read_string_probe(column, needle, mode=mode)

        df = self.read()
        if not payload_cols:
            # default: every non-canonical column is payload (version is
            # bookkeeping) — derived from THIS frame, no second read
            payload_cols = tuple(
                c
                for c in df.columns
                if c not in ("producer", "topic", "log_time", "sequence",
                             "version", "producer_bucket")
            )
        return LogStore(
            df=df,
            producer_col="producer",
            topic_col="topic",
            time_col="log_time",
            sequence_col="sequence",
            payload_cols=payload_cols,
            string_probe=probe if self.trigram_cols else None,
            probe_columns=self.trigram_cols,
        )

    # ---------------------------------------------------------- maintain
    def compact(self) -> None:
        """Physically apply tombstones and rewrite (merge-time mask
        application, tree/merge.go:94-137).  Data-sized job; run it like
        OPTIMIZE, off the query path.

        Interaction with the commit watermark: compact rewrites COMMITTED
        rows only (read() filters version <= committed), so a crashed
        writer's unacknowledged files — and any unpublished tombstone —
        are physically dropped with the superseded generation.  The
        primary rollback path is `_gc_uncommitted` at the next write's
        start; compact is the belt-and-braces second pass, like the
        reference dropping unreferenced WAL/tree nodes at merge time.

        Write-new-then-swap-pointer: the resolved rows land in a fresh
        generation dir (`data_genN`), then `_meta/data_ptr` flips to it
        atomically.  The live prefix is never renamed or deleted in place,
        so this works on object stores (S3 has no atomic rename of a
        prefix); readers holding the old pointer keep a consistent view.
        The superseded generation (and the pre-compact tombstone files
        it already absorbed — leaving them during the window is
        harmless because tombstone application is idempotent: the rows
        they mask are gone from the new generation) is deleted only
        after `gc_grace_sec`, so a reader that resolved the old pointer
        finishes its scan before the files vanish; only a straggler
        running longer than the grace window can observe skipped files
        (the documented out-of-contract case, like reading Delta across
        a VACUUM horizon).

        Runs under the writer lock: a compact racing an append would
        otherwise snapshot before the append, then delete the appended
        files with the superseded generation — a lost write."""
        with self._writer_lock():
            return self._compact_locked()

    def _compact_locked(self) -> None:
        self._gc_sweep()
        self._gc_uncommitted()  # crashed leftovers out of the tree first
        resolved = self.read()
        old = self._resolve_data_path()
        gen = 0
        base = os.path.basename(old)
        if base.startswith("data_gen"):
            gen = int(base[len("data_gen"):])
        new_name = f"data_gen{gen + 1}"
        new_path = os.path.join(self.root, new_name)
        # time-cluster the rewrite: one task per (topic, producer_bucket),
        # sorted (producer, log_time, sequence) within it, so parquet
        # row-group min/max stats are tight for both producer probes and
        # time-bounded scans — the CoW merge's re-sorted leaves
        # (tree/merge.go) re-expressed as a layout property
        w = (
            resolved.withColumn("producer_bucket", self._bucket_expr())
            .repartition("topic", "producer_bucket")
            # partition cols lead the sort (see append) so the writer does
            # not re-sort and drop the (producer, log_time) clustering
            .sortWithinPartitions(
                "topic", "producer_bucket", "producer", "log_time", "sequence"
            )
            .write.mode("overwrite")
            .option("compression", self.compression)
        )
        for k, v in self._bloom_opts().items():
            w = w.option(k, v)
        w.partitionBy("topic", "producer_bucket").parquet(new_path)
        old_tombstones = self._list_tombstone_files()
        os.makedirs(self.meta_path, exist_ok=True)
        tmp = os.path.join(self.meta_path, "data_ptr.tmp")
        with open(tmp, "w") as f:
            f.write(new_name)
        os.replace(tmp, os.path.join(self.meta_path, "data_ptr"))
        # New generation's manifest set: one base manifest covering its
        # files plus the (idempotent, soon-swept) pre-compact tombstones.
        # Written AFTER the flip so manifest_path resolves the new
        # generation; a crash in between leaves the new generation
        # manifest-less, which degrades gracefully to the legacy footer
        # path until the next write grandfathers it.
        new_gen_files = self._list_data_files() + old_tombstones
        self._write_manifest(
            f"base_{self.committed_version():012d}.list",
            new_gen_files,
            self._file_rows(new_gen_files),
        )
        import shutil

        old_mandir = os.path.join(
            self.meta_path, "manifest", os.path.basename(old)
        )
        self._gc_defer([old, old_mandir] + old_tombstones)
        # the sidecar keyed old-generation files; rebuild over the new one
        shutil.rmtree(self.trigram_index_path, ignore_errors=True)
        self.update_trigram_index()
