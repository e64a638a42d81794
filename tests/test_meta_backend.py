"""Pluggable version-pointer/lease backend (round 10, r9 verdict ask #6).

The table's correctness rests on two primitives — exclusive writer
lease, atomic pointer CAS — and they were hard-wired to local POSIX.
meta_backend.LocalMetaBackend is now the single place that knows about
flock/os.replace; VersionedLogTable touches `_meta` only through the
backend interface (get/put/conditional_put/list_names/delete/
writer_lease).  Pinned here:

  * the local backend's object semantics (atomic put, CAS, listing);
  * the fault injection the verdict asked for: a backend whose
    conditional_put rejects a stale expected-value makes the writer
    abort cleanly — watermark unflipped, nothing partially published,
    and the landed files rolled back by the next writer.
"""

import os
import shutil
import tempfile

import pytest

from dp3_spark.streaming.lifecycle import StaleWriterError, VersionedLogTable
from dp3_spark.streaming.meta_backend import LocalMetaBackend


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="dp3_backend_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def mkbatch(spark, times, topic="/a"):
    rows = [("p1", topic, t, i, float(i)) for i, t in enumerate(times)]
    return spark.createDataFrame(
        rows, "producer string, topic string, log_time long, sequence long, v double"
    )


# ---------------------------------------------------------- local backend
def test_local_backend_object_ops(root):
    b = LocalMetaBackend(os.path.join(root, "_meta"))
    assert b.get("version") is None
    b.put("version", b"7")
    assert b.get("version") == b"7"
    b.put("manifest/gen0/v1.list", b"a\t1\n")
    b.put("manifest/gen0/v2.list", b"b\t2\n")
    assert b.list_names("manifest/gen0") == [
        "manifest/gen0/v1.list",
        "manifest/gen0/v2.list",
    ]
    assert b.list_names("manifest/nope") == []
    b.delete("manifest/gen0/v1.list")
    assert b.list_names("manifest/gen0") == ["manifest/gen0/v2.list"]
    b.delete("manifest/gen0/v1.list")  # idempotent


def test_local_backend_cas(root):
    b = LocalMetaBackend(os.path.join(root, "_meta"))
    # create-if-absent
    assert b.conditional_put("committed", b"1", None)
    assert not b.conditional_put("committed", b"9", None)  # exists now
    assert b.conditional_put("committed", b"2", b"1")
    assert not b.conditional_put("committed", b"3", b"1")  # stale expected
    assert b.get("committed") == b"2"


# ----------------------------------------------------- fault injection
class ZombieLeaseBackend(LocalMetaBackend):
    """Simulates an expired-lease zombie: every committed-pointer CAS
    fails as if another writer advanced the pointer concurrently."""

    def conditional_put(self, name, data, expected):
        if name == "committed":
            return False
        return super().conditional_put(name, data, expected)


def test_stale_cas_aborts_write_without_partial_publish(spark, root):
    t = VersionedLogTable(spark, root, gc_grace_sec=0.0)
    t.append(mkbatch(spark, [100, 110]))
    committed_before = t.committed_version()

    zombie = VersionedLogTable(
        spark,
        root,
        gc_grace_sec=0.0,
        pointer_backend=ZombieLeaseBackend(t.meta_path),
    )
    with pytest.raises(StaleWriterError):
        zombie.append(mkbatch(spark, [200, 210], topic="/b"))

    # the watermark never flipped: nothing of the aborted write is
    # visible to any reader
    assert t.committed_version() == committed_before
    assert sorted(r["log_time"] for r in t.read().collect()) == [100, 110]

    # the aborted write's landed files are rolled back by the next
    # healthy writer's _gc_uncommitted pass, and the table moves on
    t.append(mkbatch(spark, [300], topic="/c"))
    assert sorted(r["log_time"] for r in t.read().collect()) == [100, 110, 300]


def test_default_backend_is_local_and_layout_unchanged(spark, root):
    t = VersionedLogTable(spark, root, gc_grace_sec=0.0)
    t.append(mkbatch(spark, [100]))
    # same on-disk small-object layout as every prior round: offline
    # tools (inspect) and old tables keep working
    assert os.path.exists(os.path.join(t.meta_path, "version"))
    assert os.path.exists(os.path.join(t.meta_path, "committed"))
    assert isinstance(t._backend, LocalMetaBackend)


# ------------------------------------------- in-memory (object-store-shaped)
class InMemoryBackend:
    """Dict-backed implementation of the meta_backend contract — nothing
    under `_meta` touches disk.  Driving the FULL table lifecycle through
    it proves VersionedLogTable reaches its pointers/manifests/ledger/
    marker ONLY via the interface: any leftover direct `_meta` file IO
    would read a missing file and fail the assertions below."""

    def __init__(self):
        import threading

        self.objects: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def get(self, name):
        return self.objects.get(name)

    def put(self, name, data):
        self.objects[name] = bytes(data)

    def conditional_put(self, name, data, expected):
        if self.objects.get(name) != expected:
            return False
        self.objects[name] = bytes(data)
        return True

    def list_names(self, prefix=""):
        p = prefix.rstrip("/") + "/" if prefix else ""
        return sorted(n for n in self.objects if n.startswith(p))

    def writer_lease(self):
        from contextlib import contextmanager

        @contextmanager
        def held():
            with self._lock:
                yield

        return held()

    def delete(self, name):
        self.objects.pop(name, None)


def test_full_lifecycle_through_in_memory_backend(spark, root):
    """append -> delete_range -> time travel -> trigram probe -> compact
    -> read, with every _meta small object living in a dict.  This is
    the object-store deployment shape: swap ONE class, nothing else."""
    b = InMemoryBackend()
    t = VersionedLogTable(
        spark, root, gc_grace_sec=0.0, trigram_cols=("props",),
        pointer_backend=b,
    )

    def batch(times, topic="/a", text="alpha"):
        rows = [("p1", topic, x, i, f"{text}{i}") for i, x in enumerate(times)]
        return spark.createDataFrame(
            rows,
            "producer string, topic string, log_time long, sequence long, props string",
        )

    v1 = t.append(batch([100, 110]))
    v2 = t.delete_range("p1", "/a", 0, 105)
    v3 = t.append(batch([300, 310], topic="/b", text="beta"))
    assert (v1, v2, v3) == (1, 2, 3)

    # no _meta small objects on disk; all in the dict
    assert not os.path.exists(os.path.join(t.meta_path, "version"))
    assert not os.path.exists(os.path.join(t.meta_path, "committed"))
    assert {"version", "committed", "trigram_wm.json"} <= set(b.objects)
    assert any(n.startswith("manifest/") for n in b.objects)

    # reads, time travel, tombstones, manifest tail, trigram probe
    assert sorted(r["log_time"] for r in t.read().collect()) == [110, 300, 310]
    assert sorted(
        r["log_time"] for r in t.read(as_of_version=v1).collect()
    ) == [100, 110]
    assert [v for v, _ in t.tail_versions(0)] == [v1, v3]
    assert t.tail_version_counts(0) == [(v1, 2), (v3, 2)]
    got = [r["sequence"] for r in t.read_string_probe("props", "beta1").collect()]
    assert got == [1]

    # compact flips the generation pointer through the backend
    t.compact()
    assert b.objects.get("data_ptr") == b"data_gen1"
    assert sorted(r["log_time"] for r in t.read().collect()) == [110, 300, 310]


def test_publish_cas_pins_write_start_watermark(spark, root):
    """The zombie-writer scenario the CAS exists for: a writer whose
    lease expired mid-write must FAIL its flip against a successor's
    newer watermark — never regress it.  (A CAS whose expected value is
    re-read at publish time would 'succeed' here and roll 7 back to 6.)"""
    t = VersionedLogTable(spark, root, gc_grace_sec=0.0)
    t.append(mkbatch(spark, [100]))  # committed = 1
    t._backend.put("committed", b"7")  # a successor advanced the pointer
    with pytest.raises(StaleWriterError):
        t._publish(6, expected_version=5)  # zombie pinned 5 at write start
    assert t._backend.get("committed") == b"7"  # never regressed
    # the tooling/read-current default still swaps under a held lease
    t._publish(8)
    assert t.committed_version() == 8
