"""CLI client (dp3_spark/cli.py) — the reference's cli/cmd surface
(query/import/export/tail/statrange + catalog verbs) driven end-to-end
against a live DP3Service socket."""

import json

import pytest

from dp3_spark import cli
from dp3_spark.catalog import events_log_store
from dp3_spark.engine import DP3Engine
from dp3_spark.service import DP3Service
from dp3_spark.streaming.lifecycle import VersionedLogTable

SF = "/root/testdata/sf0.001"
KEY = "cli-sekrit"


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    store = events_log_store(spark, SF, us_truncate=True)
    d = tmp_path_factory.mktemp("cli_table")
    table = VersionedLogTable(spark, str(d))
    rows = [("dev1", "/a", 10 + i * 10, i, float(i)) for i in range(4)]
    table.append(
        spark.createDataFrame(
            rows,
            "producer string, topic string, log_time long, sequence long, v double",
        )
    )
    s = DP3Service(
        {
            "events": DP3Engine(spark, store=store),
            "scratch": DP3Engine(spark, table=table),
        },
        shared_key=KEY,
    )
    host, port = s.start()
    yield f"http://{host}:{port}"
    s.stop()


def run(env, *argv):
    return cli.main(["--server", env, *argv])


def test_cli_query_json_lines(env, capfd):
    assert run(env, "--database", "events", "query", "from * click;", "--limit", "3") == 0
    lines = capfd.readouterr().out.strip().split("\n")
    assert len(lines) == 3
    assert all(json.loads(l)["topic"] == "click" for l in lines)


def test_cli_query_explain(env, capfd):
    assert run(env, "--database", "events", "query", "from * click;", "--explain") == 0
    out = capfd.readouterr().out
    assert "Physical Plan" in out or "Scan" in out


def test_cli_statrange(env, capfd):
    assert (
        run(
            env, "--database", "events", "statrange", "--topic", "click",
            "--start", "1704067200000000000", "--end", "1706745600000000000",
            "--granularity", str(86400 * 10**9),
        )
        == 0
    )
    rows = [json.loads(l) for l in capfd.readouterr().out.strip().split("\n")]
    assert rows and all(r["message_count"] > 0 for r in rows)
    # quantile stats via the same verb
    assert (
        run(
            env, "--database", "events", "statrange", "--topic", "click",
            "--start", "1704067200000000000", "--end", "1706745600000000000",
            "--granularity", str(86400 * 10**9), "--quantiles", "0.5,0.9",
        )
        == 0
    )
    rows = [json.loads(l) for l in capfd.readouterr().out.strip().split("\n")]
    assert rows and all({"p50", "p90"} <= set(r) for r in rows)


def test_cli_catalog_verbs(env, capfd):
    assert run(env, "--database", "events", "topics") == 0
    assert "click" in capfd.readouterr().out.split("\n")
    assert run(env, "--database", "events", "producers") == 0
    assert capfd.readouterr().out.strip()
    assert run(env, "--database", "events", "tables", "--topic", "click") == 0
    rows = [json.loads(l) for l in capfd.readouterr().out.strip().split("\n")]
    assert all(r["topic"] == "click" for r in rows)


def test_cli_import_tail_export_delete(env, tmp_path, capfd):
    from test_mcap_codec import fix_mcap_bytes

    p = tmp_path / "fix.mcap"
    p.write_bytes(fix_mcap_bytes(n=5))

    # import by path (authed)
    assert (
        run(
            env, "--database", "scratch", "--token", KEY, "import", str(p),
            "--producer", "robot",
        )
        == 0
    )
    v_imp = json.loads(capfd.readouterr().out)["version"]
    assert v_imp >= 2

    # tail from before the import sees the imported rows
    assert run(env, "--database", "scratch", "tail", "--from", str(v_imp - 1)) == 0
    lines = [json.loads(l) for l in capfd.readouterr().out.strip().split("\n")]
    assert len(lines) == 5 and all(r["topic"] == "/fix" for r in lines)

    # export the original topic to a file: valid MCAP magic
    out = tmp_path / "out.mcap"
    assert (
        run(
            env, "--database", "scratch", "export", "--producer", "dev1",
            "--topic", "/a", "-o", str(out),
        )
        == 0
    )
    capfd.readouterr()
    assert out.read_bytes().startswith(b"\x89MCAP")

    # authed delete tombstones a range
    assert (
        run(
            env, "--database", "scratch", "--token", KEY, "delete",
            "--producer", "dev1", "--topic", "/a", "--start", "15", "--end", "35",
        )
        == 0
    )
    assert json.loads(capfd.readouterr().out)["version"] > v_imp
    assert run(env, "--database", "scratch", "query", "from dev1 /a;") == 0
    times = [
        json.loads(l)["log_time"]
        for l in capfd.readouterr().out.strip().split("\n")
    ]
    assert times == ["0.000000010", "0.000000040"]


def test_cli_import_stream_uploads_file_object(env, tmp_path, capfd, monkeypatch):
    """--stream hands the OPEN FILE to urllib (Content-Length from fstat)
    so the upload is streamed, never read() whole into client memory."""
    from test_mcap_codec import fix_mcap_bytes

    import dp3_spark.cli as cli_mod

    p = tmp_path / "streamed.mcap"
    p.write_bytes(fix_mcap_bytes(n=3))

    seen = {}
    real_request = cli_mod._request

    def spy(url, body=None, **kw):
        if "producers" in url:
            seen["has_read"] = hasattr(body, "read")
        return real_request(url, body, **kw)

    monkeypatch.setattr(cli_mod, "_request", spy)
    assert (
        run(
            env, "--database", "scratch", "--token", KEY, "import", str(p),
            "--producer", "streambot", "--stream",
        )
        == 0
    )
    assert seen["has_read"] is True  # file object, not bytes
    assert json.loads(capfd.readouterr().out)["version"] >= 1
    # the rows actually landed
    assert run(env, "--database", "scratch", "query", "from streambot /fix;") == 0
    assert len(capfd.readouterr().out.strip().split("\n")) == 3


def test_cli_error_paths(env, capfd):
    # unknown database -> exit 1, server error JSON on stderr
    assert run(env, "--database", "nope", "query", "from * click;") == 1
    assert "unknown database" in capfd.readouterr().err
    # unauthed import -> exit 1
    assert (
        run(env, "--database", "scratch", "import", "/no/file", "--producer", "x")
        == 1
    )
    assert "invalid token" in capfd.readouterr().err


def test_cli_serve_verb_spawns_working_server(tmp_path, capfd):
    """`dp3 serve` (the reference's cli/cmd/server.go verb) builds engines
    from --data name=PATH mappings and serves them: spawn it as a real
    subprocess, read the ready line for the bound port, then drive it
    with the existing client verbs (import -> query -> authed delete)."""
    import subprocess
    import sys as _sys

    from test_mcap_codec import fix_mcap_bytes

    table_dir = tmp_path / "served_table"
    mcap = tmp_path / "fix.mcap"
    mcap.write_bytes(fix_mcap_bytes(n=4))

    proc = subprocess.Popen(
        [
            _sys.executable, "-m", "dp3_spark.cli", "serve",
            "--data", f"scratch={table_dir}",
            "--port", "0", "--key", KEY,
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd="/root/repo",
    )
    try:
        ready = proc.stdout.readline()  # blocks until the server is bound
        assert "dp3 serving ['scratch'] on http://" in ready
        server = ready.strip().rsplit(" ", 1)[-1]

        def srun(*argv):
            return cli.main(["--server", server, *argv])

        assert (
            srun(
                "--database", "scratch", "--token", KEY, "import", str(mcap),
                "--producer", "robot",
            )
            == 0
        )
        assert json.loads(capfd.readouterr().out)["version"] >= 1

        assert srun("--database", "scratch", "query", "from robot /fix;") == 0
        lines = capfd.readouterr().out.strip().split("\n")
        assert len(lines) == 4

        # authed route works through the spawned server too
        assert (
            srun(
                "--database", "scratch", "--token", KEY, "delete",
                "--producer", "robot", "--topic", "/fix",
                "--start", "0", "--end", "2000000000000000000",
            )
            == 0
        )
        capfd.readouterr()
        assert srun("--database", "scratch", "query", "from robot /fix;") == 0
        assert capfd.readouterr().out.strip() == ""  # all tombstoned
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_cli_plugin_install_and_dispatch(tmp_path, capfd, monkeypatch):
    """`dp3 plugin install <name> <file>` copies into
    <configdir>/plugins/<name>/ (cli/cmd/install.go semantics) and the
    next parser build loads the plugin's subcommand
    (cli/cmd/root.go loadPlugins analog: register_plugin(subparsers))."""
    monkeypatch.setenv("DP3_CONFIG_DIR", str(tmp_path / "conf"))

    src = tmp_path / "hello_plugin.py"
    src.write_text(
        "def register_plugin(sub):\n"
        "    p = sub.add_parser('hello', help='plugin-provided verb')\n"
        "    p.add_argument('--who', default='world')\n"
        "    p.set_defaults(fn=lambda a: print(f'hello {a.who}') or 0)\n"
    )
    assert cli.main(["plugin", "install", "greeter", str(src)]) == 0
    import os as _os

    assert _os.path.exists(
        str(tmp_path / "conf" / "plugins" / "greeter" / "hello_plugin.py")
    )
    capfd.readouterr()

    # the installed verb is now dispatchable
    assert cli.main(["hello", "--who", "dp3"]) == 0
    assert capfd.readouterr().out.strip().endswith("hello dp3")

    # a plugin without the export aborts loudly, never silently skipped
    bad = tmp_path / "bad.py"
    bad.write_text("x = 1\n")
    assert cli.main(["plugin", "install", "broken", str(bad)]) == 0
    capfd.readouterr()
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="register_plugin"):
        cli.main(["topics"])

    # ... but the `plugin` verb itself never runs plugin code, so the CLI
    # can always repair its own plugins directory: re-installing over the
    # broken plugin works, and afterwards every verb loads again
    fixed = tmp_path / "bad.py"
    fixed.write_text(
        "def register_plugin(sub):\n"
        "    p = sub.add_parser('fixedverb')\n"
        "    p.set_defaults(fn=lambda a: 0)\n"
    )
    assert cli.main(["plugin", "install", "broken", str(fixed)]) == 0
    capfd.readouterr()
    assert cli.main(["fixedverb"]) == 0
    # global flags before the verb don't confuse the verb sniff
    assert cli.main(["--database", "x", "plugin", "install", "broken", str(fixed)]) == 0


def test_cli_plugin_cannot_preempt_builtin(tmp_path, monkeypatch):
    """A plugin that registers `serve` is rejected by the CLI's OWN
    shadow guard (not argparse's conflict check, which only exists on
    Python >= 3.11 — older runtimes silently REPLACE the built-in)."""
    monkeypatch.setenv("DP3_CONFIG_DIR", str(tmp_path / "conf"))
    src = tmp_path / "shadow.py"
    src.write_text(
        "def register_plugin(sub):\n"
        "    sub.add_parser('serve')\n"
    )
    assert cli.main(["plugin", "install", "shadow", str(src)]) == 0
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="already exists"):
        cli.build_parser()


def test_cli_unknown_preverb_flag_never_loads_plugins(tmp_path, monkeypatch):
    """ADVICE r8: `dp3 --serv x plugin install ...` used to misdetect the
    verb and run (possibly broken) plugin code on the repair path.  Now
    an unknown pre-verb flag makes the verb ambiguous: plugins are
    skipped and argparse reports the flag error (allow_abbrev=False, so
    prefix spellings are flag errors, not silent matches)."""
    monkeypatch.setenv("DP3_CONFIG_DIR", str(tmp_path / "conf"))
    broken = tmp_path / "broken.py"
    broken.write_text("raise RuntimeError('must never import')\n")
    assert cli.main(["plugin", "install", "broken", str(broken)]) == 0

    import pytest as _pytest

    # abbreviated global flag before `plugin`: the broken plugin must
    # not execute; argparse exits with its own usage error instead
    with _pytest.raises(SystemExit) as exc:
        cli.main(["--serv", "x", "plugin", "install", "broken", str(broken)])
    assert exc.value.code == 2  # argparse usage error, not the plugin's

    assert cli._invoked_verb(["--serv", "x", "plugin"]) == cli._AMBIGUOUS_VERB
    assert cli._invoked_verb(["--server", "x", "query", "s;"]) == "query"
    assert cli._invoked_verb(["--database=d", "tables"]) == "tables"
    assert cli._invoked_verb(["--help"]) is None
    # ADVICE r9: '--' is argparse's end-of-options separator, not an
    # unknown flag — the next token IS the verb, so a plugin verb spelled
    # `dp3 -- <verb>` still loads plugins
    assert cli._invoked_verb(["--", "tables"]) == "tables"
    assert cli._invoked_verb(["--server", "x", "--", "query", "s;"]) == "query"
    assert cli._invoked_verb(["--"]) is None
