"""Offline inspector for a VersionedLogTable root — the architecture-
appropriate analog of the reference's `treeinspect` / `walinspect` CLI
verbs (cli/cmd/treeinspect.go walks the node tree of a local store;
walinspect.go dumps WAL records).  The tree and WAL were replaced
wholesale by hive-partitioned parquet + a commit watermark (SURVEY
§1.4), so what an operator debugging THIS layout needs is the same
information re-expressed: which versions exist, which are published vs
pending (crashed-writer leftovers the next write will GC), how the
files/rows/bytes distribute across versions and partitions, what the
tombstones mask, and which metadata/sidecar objects are present.

Deliberately Spark-free: one parquet-FOOTER read per data file (the
same per-file-version resolution _gc_uncommitted uses — each file is
written by exactly one append, so `version` is a per-file constant) and
full reads only of the tiny tombstone files.  An inspector that needs a
cluster session to answer "what state is this table in?" is useless in
the situation that makes you reach for it.
"""

from __future__ import annotations

import os
from typing import Any


def _footer_version(path: str) -> int | None:
    """The file's (constant) `version` from parquet row-group stats,
    falling back to reading just that column; None = torn footer (can
    only be a crashed writer's partial — committed files land via
    task-commit rename)."""
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
        if v is None:
            col = pq.read_table(path, columns=["version"])["version"]
            v = max(col.to_pylist()) if len(col) else None
        return v
    except Exception:
        return None


def _walk_parquet(base: str) -> list[str]:
    out = []
    if not os.path.isdir(base):
        return out
    for dirpath, _, files in os.walk(base):
        out += [
            os.path.join(dirpath, fn)
            for fn in files
            if fn.endswith(".parquet") and not fn.startswith(("_", "."))
        ]
    return sorted(out)


def _read_meta_int(meta: str, name: str) -> int | None:
    p = os.path.join(meta, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        txt = f.read().strip()
    return int(txt) if txt else None


def inspect_table(root: str) -> dict[str, Any]:
    """Structured state report for a VersionedLogTable directory."""
    import pyarrow.parquet as pq

    meta = os.path.join(root, "_meta")
    committed = _read_meta_int(meta, "committed")
    counter = _read_meta_int(meta, "version")

    gen = "data"
    ptr = os.path.join(meta, "data_ptr")
    if os.path.exists(ptr):
        with open(ptr) as f:
            gen = f.read().strip() or "data"
    data_dir = os.path.join(root, gen)

    versions: dict[int, dict[str, int]] = {}
    partitions: dict[str, dict[str, int]] = {}
    torn: list[str] = []
    for path in _walk_parquet(data_dir):
        v = _footer_version(path)
        size = os.path.getsize(path)
        try:
            rows = pq.ParquetFile(path).metadata.num_rows
        except Exception:
            rows = 0
        if v is None:
            torn.append(os.path.relpath(path, root))
            continue
        agg = versions.setdefault(int(v), {"files": 0, "rows": 0, "bytes": 0})
        agg["files"] += 1
        agg["rows"] += rows
        agg["bytes"] += size
        part = os.path.relpath(os.path.dirname(path), data_dir)
        p = partitions.setdefault(part, {"files": 0, "rows": 0, "bytes": 0})
        p["files"] += 1
        p["rows"] += rows
        p["bytes"] += size

    tombstones: list[dict[str, Any]] = []
    for path in _walk_parquet(os.path.join(root, "tombstones")):
        try:
            for row in pq.read_table(path).to_pylist():
                tombstones.append(row)
        except Exception:
            torn.append(os.path.relpath(path, root))
    tombstones.sort(key=lambda r: (r.get("version", 0), r.get("producer", "")))

    # pending = allocated above the watermark: complete-but-unacked or a
    # crashed writer's partials; either way the next write GCs them and
    # no reader can see them (version <= committed filter)
    known = sorted(versions)
    wm = committed if committed is not None else (counter or 0)
    pending = [v for v in known if v > wm]
    if counter is not None and committed is not None and counter > committed:
        pending = sorted(set(pending) | set(range(committed + 1, counter + 1)))

    sidecars = sorted(
        n for n in (os.listdir(meta) if os.path.isdir(meta) else [])
        if not n.endswith(".tmp")
    )
    generations = sorted(
        n for n in os.listdir(root)
        if os.path.isdir(os.path.join(root, n)) and n.startswith("data")
    )

    return {
        "root": os.path.abspath(root),
        "committed": committed,
        "version_counter": counter,
        "generation": gen,
        "generations": generations,
        "versions": {str(v): versions[v] for v in known},
        "published_versions": [v for v in known if v <= wm],
        "pending_versions": pending,
        "torn_files": torn,
        "partitions": {
            "count": len(partitions),
            "files": sum(p["files"] for p in partitions.values()),
            "rows": sum(p["rows"] for p in partitions.values()),
            "bytes": sum(p["bytes"] for p in partitions.values()),
        },
        "tombstones": tombstones,
        "meta_objects": sidecars,
    }


def format_report(rep: dict[str, Any]) -> str:
    """Human-oriented rendering of inspect_table (the CLI's default;
    --json emits the dict verbatim)."""
    lines = [
        f"table        {rep['root']}",
        f"generation   {rep['generation']}"
        + (f" (all: {', '.join(rep['generations'])})"
           if len(rep["generations"]) > 1 else ""),
        f"committed    {rep['committed']}",
        f"counter      {rep['version_counter']}",
        f"partitions   {rep['partitions']['count']} dirs, "
        f"{rep['partitions']['files']} files, "
        f"{rep['partitions']['rows']} rows, "
        f"{rep['partitions']['bytes']} bytes",
    ]
    for v in rep["published_versions"]:
        a = rep["versions"][str(v)]
        lines.append(
            f"  v{v:<6} {a['files']} files  {a['rows']} rows  {a['bytes']} bytes"
        )
    for v in rep["pending_versions"]:
        a = rep["versions"].get(str(v))
        detail = (
            f"{a['files']} files  {a['rows']} rows  {a['bytes']} bytes"
            if a else "no files landed"
        )
        lines.append(f"  v{v:<6} {detail}  [PENDING: above watermark, next write GCs]")
    for path in rep["torn_files"]:
        lines.append(f"  torn     {path}  [unreadable footer: crashed-writer partial]")
    if rep["tombstones"]:
        lines.append(f"tombstones   {len(rep['tombstones'])}")
        for t in rep["tombstones"]:
            lines.append(
                f"  v{t.get('version')} {t.get('producer')}/{t.get('topic')} "
                f"[{t.get('start_ns', t.get('start'))}, {t.get('end_ns', t.get('end'))})"
            )
    else:
        lines.append("tombstones   none")
    lines.append("meta         " + (", ".join(rep["meta_objects"]) or "none"))
    return "\n".join(lines)
