"""Pluggable version-pointer / writer-lease backend for the `_meta` dir.

The r9 verdict's last deployment gap: the table's correctness hinges on
two primitives — an exclusive writer lease and an atomic small-object
pointer flip — and both were hard-wired to local POSIX (`fcntl.flock`,
`os.replace`).  The reference hides the same need inside its rootmap
SQLite + single treemgr process (rootmap/sqlrootmap.go;
treemgr/treemgr.go:905-933).  This module makes the contract explicit
so a 100 TB deployment swaps ONE class, not the lifecycle:

  * ``writer_lease()`` — exclusive among writers for the duration of a
    write.  Local: flock on ``writer.lock``.  Object store: a lease
    object with a TTL (DynamoDB/etcd lock, GCS generation-pinned lease
    file), renewed by the holder.
  * ``conditional_put(name, data, expected)`` — compare-and-swap on a
    small object; THE publish primitive.  Local: read-compare-replace
    (safe under the held lease; os.replace is atomic).  Object store:
    HTTP ``If-Match`` / ``x-goog-if-generation-match`` / S3
    conditional-write.  A *stale* CAS (expected no longer current) means
    the caller's lease expired and another writer advanced the pointer —
    the write MUST abort, never retry blindly: its files are rolled back
    by the next writer's `_gc_uncommitted` pass.
  * ``get / put / list_names / delete`` — the remaining small-object IO
    under `_meta` (version counter, manifests, GC ledger, index
    watermark, generation pointer).  ``put`` is atomic-replace but
    unconditional: every call site is already serialized by the lease
    and writes keyed-by-version names that two writers can never share.

Deliberately NOT behind the interface: the quarantine dir.  It holds
*data-file bytes* awaiting their grace deadline, not pointers — on an
object store there is no rename, the file simply keeps its key until
the deferred delete (the GC ledger entry that schedules that delete IS
interface-routed).
"""

from __future__ import annotations

import os
from contextlib import contextmanager


class LocalMetaBackend:
    """POSIX-directory implementation: names are paths relative to the
    table's `_meta` dir, puts are tmp + fsync + os.replace (atomic on one
    filesystem), the lease is an flock held for the write's duration."""

    def __init__(self, meta_path: str):
        self.meta_path = meta_path

    # ------------------------------------------------------------ paths
    def _p(self, name: str) -> str:
        return os.path.join(self.meta_path, name)

    # ---------------------------------------------------------- objects
    def get(self, name: str) -> bytes | None:
        try:
            with open(self._p(name), "rb") as f:
                return f.read()
        except OSError:
            return None

    def put(self, name: str, data: bytes) -> None:
        path = self._p(name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def conditional_put(
        self, name: str, data: bytes, expected: bytes | None
    ) -> bool:
        """CAS: write only if the object's current content is `expected`
        (None = must not exist).  Local reads are consistent and the
        caller holds the lease, so read-then-replace is race-free here;
        an object-store implementation maps this to one conditional
        write and the read goes away."""
        if self.get(name) != expected:
            return False
        self.put(name, data)
        return True

    def list_names(self, prefix: str = "") -> list[str]:
        """Names (relative to _meta) under `prefix` — one level, like an
        object-store delimiter listing.  Missing prefix = empty."""
        d = self._p(prefix) if prefix else self.meta_path
        try:
            entries = os.listdir(d)
        except OSError:
            return []
        rel = prefix.rstrip("/") + "/" if prefix else ""
        return sorted(rel + e for e in entries)

    def delete(self, name: str) -> None:
        try:
            os.remove(self._p(name))
        except OSError:
            pass

    # ------------------------------------------------------------ lease
    @contextmanager
    def writer_lease(self):
        """Exclusive writer lease for one write's duration.  flock gives
        both cross-process and (one fd per call) in-process exclusion.
        An object-store lease has a TTL instead of a kernel guarantee —
        which is WHY _publish goes through conditional_put: a zombie
        holder whose lease expired fails its CAS instead of clobbering
        a successor's flip."""
        import fcntl

        os.makedirs(self.meta_path, exist_ok=True)
        with open(self._p("writer.lock"), "w") as f:
            fcntl.flock(f, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(f, fcntl.LOCK_UN)
