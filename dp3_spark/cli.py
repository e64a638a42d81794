"""dp3 command line — the reference's CLI surface
(cli/cmd/{query,import,export,tail,statrange,server}.go plus the catalog
verbs): a thin stdlib HTTP client over the DP3Service routes, plus the
`serve` verb that starts the service itself.

    python -m dp3_spark.cli --server http://host:port --database events \\
        query "from * click limit 10;"
    python -m dp3_spark.cli export --producer dev1 --topic /a -o out.mcap
    python -m dp3_spark.cli statrange --topic click --start S --end E \\
        --granularity 3600000000000
    python -m dp3_spark.cli tail --follow --interval 2
    python -m dp3_spark.cli --token KEY import --producer robot file.mcap
    python -m dp3_spark.cli serve --data events=/data/sf0.1 --port 8089

Responses stream: query/tail/export bodies are copied to stdout (or the
-o file) chunk-by-chunk, never buffered whole — the same discipline as
the service side.  Exit code 0 on success, 1 with the server's error
JSON on stderr otherwise.
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import shutil
import sys
import threading
import time
import urllib.error
import urllib.request


def _request(url: str, body=None, *, token: str = "", method: str | None = None):
    headers = {}
    data = None
    if body is not None:
        if isinstance(body, bytes):
            data = body
        elif hasattr(body, "read"):
            # open file object: urllib streams it chunk-by-chunk, so a
            # large upload never lives in client memory whole; the server
            # needs Content-Length since we don't send chunked requests
            data = body
            headers["Content-Length"] = str(os.fstat(body.fileno()).st_size)
        else:
            data = json.dumps(body).encode()
            headers["Content-Type"] = "application/json"
    if token:
        headers["Authorization"] = f"Bearer {token}"
    req = urllib.request.Request(url, data=data, headers=headers, method=method)
    return urllib.request.urlopen(req)


def _copy(resp, out) -> None:
    """Stream the response body without buffering it whole."""
    shutil.copyfileobj(resp, out, length=64 * 1024)


def _print_json_lines(resp) -> None:
    _copy(resp, sys.stdout.buffer)
    sys.stdout.buffer.flush()


def cmd_query(args) -> int:
    body = {"query": args.statement}
    if args.limit:
        body["limit"] = args.limit
    if args.offset:
        body["offset"] = args.offset
    if args.skeleton:
        body["skeleton"] = True
    if args.explain:
        body["explain"] = True
    with _request(f"{args.server}/databases/{args.database}/query", body) as r:
        if args.explain:
            print(json.load(r)["explain"])
        else:
            _print_json_lines(r)
    return 0


def cmd_statrange(args) -> int:
    body = {
        "database": args.database,
        "topic": args.topic,
        "start": args.start,
        "end": args.end,
        "granularity": args.granularity,
    }
    if args.fields:
        body["fields"] = args.fields.split(",")
    if args.producer:
        body["producer"] = args.producer
    if args.quantiles:
        # quantile stats (served from the summary store's persisted
        # sketches when the server has one attached)
        body["quantiles"] = [float(x) for x in args.quantiles.split(",") if x]
    with _request(f"{args.server}/statrange", body) as r:
        for row in json.load(r):
            print(json.dumps(row))
    return 0


def cmd_export(args) -> int:
    body = {
        "database": args.database,
        "producer": args.producer,
        "topics": {t: 0 for t in args.topic},
    }
    if (args.start is None) != (args.end is None):
        raise SystemExit("export: --start and --end must be given together")
    if args.start is not None:
        body["start"], body["end"] = args.start, args.end
    with _request(f"{args.server}/export", body) as r:
        if args.output == "-":
            _copy(r, sys.stdout.buffer)
        else:
            with open(args.output, "wb") as f:
                _copy(r, f)
    return 0


def cmd_import(args) -> int:
    url = f"{args.server}/databases/{args.database}"
    if args.stream:
        # hand the open file straight to urllib (streamed with a
        # Content-Length from fstat) — the upload is never buffered whole
        with open(args.file, "rb") as f, _request(
            f"{url}/producers/{args.producer}/import", f, token=args.token
        ) as r:
            print(json.dumps(json.load(r)))
    else:
        with _request(
            f"{url}/import", {"producer": args.producer, "path": args.file},
            token=args.token,
        ) as r:
            print(json.dumps(json.load(r)))
    return 0


def cmd_tail(args) -> int:
    """Poll /tail: print new rows as JSON lines, advancing the version
    cursor; --follow loops forever (the reference's push tail is the
    tail_stream engine surface; polling is the wire-level equivalent)."""
    cursor = args.frm
    while True:
        url = f"{args.server}/databases/{args.database}/tail?from={cursor}&limit={args.limit}"
        with _request(url) as r:
            first = r.readline()
            cursor = max(cursor, json.loads(first)["version"])
            for line in r:
                sys.stdout.buffer.write(line)
        sys.stdout.buffer.flush()
        if not args.follow:
            return 0
        time.sleep(args.interval)


def cmd_topics(args) -> int:
    with _request(f"{args.server}/databases/{args.database}/topics") as r:
        print("\n".join(json.load(r)))
    return 0


def cmd_producers(args) -> int:
    with _request(f"{args.server}/databases/{args.database}/producers") as r:
        print("\n".join(json.load(r)))
    return 0


def cmd_tables(args) -> int:
    q = []
    if args.producer:
        q.append(f"producer={args.producer}")
    if args.topic:
        q.append(f"topic={args.topic}")
    qs = ("?" + "&".join(q)) if q else ""
    with _request(f"{args.server}/databases/{args.database}/tables{qs}") as r:
        for row in json.load(r):
            print(json.dumps(row))
    return 0


def cmd_serve(args) -> int:
    """Start the DP3 HTTP service from the command line — the reference's
    `dp3 server` verb (cli/cmd/server.go builds the service from flags
    and blocks; this is its Spark-engine analog).  Each --data mapping is
    name=PATH where PATH is either a read-only parquet fixture directory
    (an `events.parquet` inside -> events_log_store) or a writable
    VersionedLogTable root (anything else; created empty if missing).
    Imports are local so the client verbs never pay Spark startup."""
    from dp3_spark.catalog import events_log_store
    from dp3_spark.engine import DP3Engine
    from dp3_spark.service import DP3Service
    from dp3_spark.session import get_spark
    from dp3_spark.streaming.lifecycle import VersionedLogTable

    spark = get_spark("dp3-serve")
    engines = {}
    for mapping in args.data:
        name, sep, path = mapping.partition("=")
        if not sep or not name or not path:
            raise SystemExit(f"serve: --data expects name=PATH, got {mapping!r}")
        if os.path.exists(os.path.join(path, "events.parquet")):
            engines[name] = DP3Engine(
                spark, store=events_log_store(spark, path, us_truncate=True)
            )
        else:
            engines[name] = DP3Engine(spark, table=VersionedLogTable(spark, path))
    svc = DP3Service(engines, shared_key=args.key)
    host, port = svc.start(args.host, args.port)
    # line-oriented ready signal so wrappers (and the socket test) can
    # wait for the bound address instead of polling
    print(f"dp3 serving {sorted(engines)} on http://{host}:{port}", flush=True)
    try:
        threading.Event().wait()  # serve until interrupted
    except KeyboardInterrupt:
        pass
    finally:
        svc.stop()
    return 0


def cmd_inspect(args) -> int:
    """`dp3 inspect <table-root>` — offline state report for a
    VersionedLogTable directory: watermark vs counter, per-version
    file/row/byte distribution, pending (crashed-writer) versions, torn
    files, tombstones, metadata objects.  The architecture-appropriate
    analog of the reference's treeinspect/walinspect local debugging
    verbs (cli/cmd/treeinspect.go, walinspect.go) — Spark-free, footer
    reads only."""
    from dp3_spark.inspect_tool import format_report, inspect_table

    rep = inspect_table(args.root)
    print(json.dumps(rep) if args.json else format_report(rep))
    return 0


def config_dir() -> str:
    """~/.dp3 (cli/cmd/root.go configDir), overridable via DP3_CONFIG_DIR
    so tests and multi-user hosts can relocate it."""
    return os.environ.get("DP3_CONFIG_DIR") or os.path.expanduser("~/.dp3")


def cmd_plugin_install(args) -> int:
    """`dp3 plugin install <name> <filepath>` — copy a plugin file into
    <configdir>/plugins/<name>/ (cli/cmd/install.go:12-24 verbatim
    semantics: ensure the directory, copy by basename)."""
    plugin_dir = os.path.join(config_dir(), "plugins", args.name)
    os.makedirs(plugin_dir, exist_ok=True)
    shutil.copy2(args.filepath, os.path.join(plugin_dir, os.path.basename(args.filepath)))
    print(f"installed {args.name} from {args.filepath}")
    return 0


class _GuardedSubparsers:
    """Passed to register_plugin instead of the raw subparsers action:
    rejects a verb name that already exists (built-in or earlier
    plugin) EXPLICITLY.  argparse only started raising on conflicting
    subparser names in Python 3.11; on older runtimes add_parser
    silently REPLACES the existing parser, which would let a plugin
    shadow a built-in — inverting the load-last guarantee."""

    def __init__(self, sub, origin: str):
        self._sub, self._origin = sub, origin

    def add_parser(self, name: str, **kwargs):
        if name in self._sub.choices:
            raise SystemExit(
                f"plugin {self._origin} tries to register verb {name!r}, "
                "which already exists (built-in or earlier plugin)"
            )
        return self._sub.add_parser(name, **kwargs)

    def __getattr__(self, attr):
        return getattr(self._sub, attr)


def load_plugins(sub) -> None:
    """Add installed plugins' subcommands to the parser — the reference
    loads Go .so plugins exporting a cobra command at startup
    (cli/cmd/root.go:50-79 loadPlugins); the Python-idiomatic analog is a
    .py file in <configdir>/plugins/*/ exporting
    `register_plugin(subparsers)`.  Same trust model as the reference:
    the plugins directory is user-writable config, so installing a
    plugin is installing code.  A broken plugin aborts with its error
    (checkErr semantics), it is never silently skipped."""
    import importlib.util

    plugin_root = os.path.join(config_dir(), "plugins")
    if not os.path.isdir(plugin_root):
        return
    for dirpath, _, files in sorted(os.walk(plugin_root)):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            spec = importlib.util.spec_from_file_location(
                f"dp3_plugin_{os.path.basename(dirpath)}_{fn[:-3]}", path
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            reg = getattr(mod, "register_plugin", None)
            if not callable(reg):
                raise SystemExit(
                    f"plugin {path} does not export register_plugin(subparsers)"
                )
            reg(_GuardedSubparsers(sub, path))


def cmd_delete(args) -> int:
    body = {
        "database": args.database,
        "producer": args.producer,
        "topic": args.topic,
        "start": args.start,
        "end": args.end,
    }
    with _request(f"{args.server}/delete", body, token=args.token) as r:
        print(json.dumps(json.load(r)))
    return 0


def build_parser(plugins: bool = True) -> argparse.ArgumentParser:
    # allow_abbrev=False: prefix spellings like `--serv` would otherwise
    # be accepted by argparse but invisible to _invoked_verb's literal
    # flag match, letting an abbreviated global flag shift which token
    # looks like the verb — and with it the plugin-load decision
    p = argparse.ArgumentParser(
        prog="dp3", description=__doc__.splitlines()[0], allow_abbrev=False
    )
    p.add_argument("--server", default="http://127.0.0.1:8089")
    p.add_argument("--database", default="default")
    p.add_argument("--token", default="", help="bearer token for authed routes")
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="run a QL statement, JSON lines to stdout")
    q.add_argument("statement")
    q.add_argument("--limit", type=int, default=0)
    q.add_argument("--offset", type=int, default=0)
    q.add_argument("--skeleton", action="store_true")
    q.add_argument("--explain", action="store_true")
    q.set_defaults(fn=cmd_query)

    s = sub.add_parser("statrange", help="binned statistics for one topic")
    s.add_argument("--topic", required=True)
    s.add_argument("--start", type=int, required=True)
    s.add_argument("--end", type=int, required=True)
    s.add_argument("--granularity", type=int, required=True)
    s.add_argument("--fields", default="")
    s.add_argument("--producer", default="")
    s.add_argument("--quantiles", default="", help="e.g. 0.5,0.9,0.99")
    s.set_defaults(fn=cmd_statrange)

    e = sub.add_parser("export", help="export topics as one MCAP stream")
    e.add_argument("--producer", required=True)
    e.add_argument("--topic", action="append", required=True)
    e.add_argument("--start", type=int)
    e.add_argument("--end", type=int)
    e.add_argument("-o", "--output", default="-")
    e.set_defaults(fn=cmd_export)

    i = sub.add_parser("import", help="import an MCAP file")
    i.add_argument("file")
    i.add_argument("--producer", required=True)
    i.add_argument(
        "--stream", action="store_true",
        help="ship the file bytes in the request body instead of by path",
    )
    i.set_defaults(fn=cmd_import)

    t = sub.add_parser("tail", help="poll rows appended after a version")
    t.add_argument("--from", dest="frm", type=int, default=0)
    t.add_argument("--limit", type=int, default=10000)
    t.add_argument("--follow", action="store_true")
    t.add_argument("--interval", type=float, default=2.0)
    t.set_defaults(fn=cmd_tail)

    for name, fn in (("topics", cmd_topics), ("producers", cmd_producers)):
        c = sub.add_parser(name, help=f"list {name}")
        c.set_defaults(fn=fn)

    tb = sub.add_parser("tables", help="catalog table summary")
    tb.add_argument("--producer", default="")
    tb.add_argument("--topic", default="")
    tb.set_defaults(fn=cmd_tables)

    d = sub.add_parser("delete", help="tombstone a time range (authed)")
    d.add_argument("--producer", required=True)
    d.add_argument("--topic", required=True)
    d.add_argument("--start", type=int, required=True)
    d.add_argument("--end", type=int, required=True)
    d.set_defaults(fn=cmd_delete)

    pl = sub.add_parser("plugin", help="manage CLI plugins")
    plsub = pl.add_subparsers(dest="plugin_cmd", required=True)
    pli = plsub.add_parser("install", help="install a plugin file from disk")
    pli.add_argument("name")
    pli.add_argument("filepath")
    pli.set_defaults(fn=cmd_plugin_install)

    sv = sub.add_parser("serve", help="start the HTTP service (blocks)")
    sv.add_argument(
        "--data", action="append", required=True, metavar="NAME=PATH",
        help="database mapping; parquet fixture dir or VersionedLogTable root",
    )
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8089)
    sv.add_argument("--key", default="", help="shared bearer token for authed routes")
    sv.set_defaults(fn=cmd_serve)

    ins = sub.add_parser(
        "inspect", help="offline state report for a VersionedLogTable root"
    )
    ins.add_argument("root")
    ins.add_argument("--json", action="store_true")
    ins.set_defaults(fn=cmd_inspect)

    # Plugins load LAST so every built-in verb is already registered —
    # load_plugins wraps the subparsers in an explicit shadow guard (the
    # pre-3.11 argparse silently REPLACES a conflicting subparser, so
    # relying on its conflict error would invert the guarantee there).
    if plugins:
        load_plugins(sub)
    return p


_GLOBAL_VALUE_FLAGS = ("--server", "--database", "--token")

# _invoked_verb sentinel: an unknown pre-verb flag makes the verb
# position ambiguous — treat like `plugin` (skip plugin loading) so a
# broken installed plugin can never hijack what is already an invalid
# command line; argparse then reports the flag error itself.
_AMBIGUOUS_VERB = "?ambiguous"


def _invoked_verb(argv: list[str]) -> str | None:
    """First positional token of argv — the subcommand about to run.

    Only the three global value-taking flags can precede the verb; both
    `--flag value` and `--flag=value` spellings are skipped.  Used to keep
    the `plugin` verb loadable even when an installed plugin is broken
    (import-time error or missing register_plugin): the CLI must always be
    able to repair its own plugin directory, so plugin code never runs on
    the path to `plugin install`/`plugin uninstall`.

    Any OTHER pre-verb flag returns _AMBIGUOUS_VERB: with
    allow_abbrev=False the command line is already invalid, and guessing
    a verb out of it could route through plugin code on the repair
    path.  `--help`/`-h` pass through so bare help still lists plugin
    verbs."""
    it = iter(argv)
    for tok in it:
        if tok in ("-h", "--help"):
            continue
        if tok == "--":
            # argparse's end-of-options separator: the next token IS the
            # verb ("dp3 -- verb" is valid), not an unknown flag
            return next(it, None)
        if tok.startswith("-") and len(tok) > 1:
            if "=" in tok:
                continue  # --flag=value spelling, self-contained
            if tok in _GLOBAL_VALUE_FLAGS:
                next(it, None)  # consume the flag's value
                continue
            return _AMBIGUOUS_VERB
        return tok
    return None


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else list(argv)
    verb = _invoked_verb(argv)
    args = build_parser(
        plugins=verb not in ("plugin", _AMBIGUOUS_VERB)
    ).parse_args(argv)
    try:
        return args.fn(args)
    except urllib.error.HTTPError as e:
        sys.stderr.write(e.read().decode(errors="replace") + "\n")
        return 1
    except urllib.error.URLError as e:  # unreachable server
        sys.stderr.write(f"connection failed: {e.reason}\n")
        return 1
    except http.client.HTTPException as e:  # mid-stream disconnect
        sys.stderr.write(f"connection lost mid-response: {e!r}\n")
        return 1


if __name__ == "__main__":
    sys.exit(main())
