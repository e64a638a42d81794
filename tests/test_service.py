"""HTTP service façade (dp3_spark/service.py): the reference's route
table (routes/routes.go:32-68) served over DP3Engine — banner, query
(JSON lines / explain / skeleton / limit), catalog listings, statrange,
statistics, schemas, export (MCAP bytes), and the authed delete/import
mutations, end-to-end over a real socket."""

import io
import json
import urllib.error
import urllib.request

import pytest

from dp3_spark.catalog import events_log_store
from dp3_spark.engine import DP3Engine
from dp3_spark.service import DP3Service
from dp3_spark.streaming.lifecycle import VersionedLogTable

SF = "/root/testdata/sf0.001"
KEY = "sekrit"


@pytest.fixture(scope="module")
def svc(spark, tmp_path_factory):
    store = events_log_store(spark, SF, us_truncate=True)
    ro = DP3Engine(spark, store=store)
    d = tmp_path_factory.mktemp("svc_table")
    table = VersionedLogTable(spark, str(d))
    rows = [("dev1", "/a", 10 + i * 10, i, float(i)) for i in range(4)]
    table.append(
        spark.createDataFrame(
            rows,
            "producer string, topic string, log_time long, sequence long, v double",
        )
    )
    s = DP3Service(
        {"events": ro, "scratch": DP3Engine(spark, table=table)}, shared_key=KEY
    )
    host, port = s.start()
    yield f"http://{host}:{port}"
    s.stop()


def _req(url, body=None, *, auth=None, raw=False, method=None):
    data = None
    headers = {}
    if body is not None:
        data = body if isinstance(body, bytes) else json.dumps(body).encode()
        headers["Content-Type"] = "application/json"
    if auth:
        headers["Authorization"] = f"Bearer {auth}"
    r = urllib.request.Request(url, data=data, headers=headers, method=method)
    with urllib.request.urlopen(r) as resp:
        out = resp.read()
    return out if raw else json.loads(out)


def test_banner_and_databases(svc):
    assert _req(f"{svc}/", raw=True) == b"dp3"
    assert _req(f"{svc}/databases") == ["events", "scratch"]


def test_query_json_lines_limit(svc):
    body = {"query": "from * click;", "limit": 3}
    out = _req(f"{svc}/databases/events/query", body, raw=True)
    lines = [json.loads(l) for l in out.decode().strip().split("\n")]
    assert len(lines) == 3
    assert all(l["topic"] == "click" for l in lines)
    assert "data" in lines[0] and "log_time" in lines[0]
    # skeleton strips payloads
    body["skeleton"] = True
    out = _req(f"{svc}/databases/events/query", body, raw=True)
    assert "data" not in json.loads(out.decode().splitlines()[0])


def test_query_explain(svc):
    out = _req(
        f"{svc}/databases/events/query",
        {"query": "from * click;", "explain": True},
    )
    assert "Physical Plan" in out["explain"] or "Scan" in out["explain"]


def test_catalog_routes(svc):
    topics = _req(f"{svc}/databases/events/topics")
    assert "click" in topics
    producers = _req(f"{svc}/databases/events/producers")
    assert len(producers) > 0
    tables = _req(f"{svc}/databases/events/tables?topic=click")
    assert tables and all(t["topic"] == "click" for t in tables)


def test_statrange_and_statistics(svc):
    bins = _req(
        f"{svc}/statrange",
        {
            "database": "events",
            "topic": "click",
            "start": 1704067200000000000,
            "end": 1706745600000000000,
            "granularity": 86400 * 10**9,
        },
    )
    assert bins and all(b["message_count"] > 0 for b in bins)
    avail = _req(f"{svc}/databases/events/statistics/available")
    assert avail
    stats = _req(f"{svc}/databases/events/statistics?topic=click")
    assert stats and all(s["topic"] == "click" for s in stats)


def test_statrange_too_granular_is_400(svc):
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(
            f"{svc}/statrange",
            {
                "database": "events",
                "topic": "click",
                "start": 0,
                "end": 10**18,
                "granularity": 1,
            },
        )
    assert e.value.code == 400


def test_delete_requires_auth_then_tombstones(svc):
    body = {
        "database": "scratch",
        "producer": "dev1",
        "topic": "/a",
        "start": 15,
        "end": 35,
    }
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(f"{svc}/delete", body)
    assert e.value.code == 401
    out = _req(f"{svc}/delete", body, auth=KEY)
    assert out["version"] >= 2
    lines = _req(
        f"{svc}/databases/scratch/query", {"query": "from dev1 /a;"}, raw=True
    )
    times = [json.loads(l)["log_time"] for l in lines.decode().strip().split("\n")]
    assert times == ["0.000000010", "0.000000040"]  # 20 and 30 tombstoned


def test_import_by_path_and_stream(svc, tmp_path):
    from test_mcap_codec import fix_mcap_bytes

    p = tmp_path / "fix.mcap"
    p.write_bytes(fix_mcap_bytes(n=5))
    out = _req(
        f"{svc}/databases/scratch/import",
        {"producer": "robot", "path": str(p)},
        auth=KEY,
    )
    assert out["version"] >= 3
    lines = _req(
        f"{svc}/databases/scratch/query", {"query": "from robot /fix;"}, raw=True
    )
    assert len(lines.decode().strip().split("\n")) == 5
    # raw-body stream import under a different producer
    out2 = _req(
        f"{svc}/databases/scratch/producers/robot2/import",
        fix_mcap_bytes(n=3),
        auth=KEY,
    )
    assert out2["version"] > out["version"]
    lines = _req(
        f"{svc}/databases/scratch/query", {"query": "from robot2 /fix;"}, raw=True
    )
    assert len(lines.decode().strip().split("\n")) == 3


def test_export_returns_mcap_stream(svc):
    from dp3_spark.sources.mcap_codec import iter_mcap

    out = _req(
        f"{svc}/export",
        {"database": "scratch", "producer": "dev1", "topics": {"/a": 0}},
        raw=True,
    )
    assert out.startswith(b"\x89MCAP")
    layout = iter_mcap(io.BytesIO(out))
    assert sum(1 for _ in layout) >= 1


def test_query_streams_unlimited_without_collect(svc, monkeypatch):
    """An UNLIMITED query must be served with chunked transfer encoding off
    toLocalIterator — never a full-result collect on the service process
    (the r5 scale finding: an unlimited query of a big topic would OOM the
    service JVM-side)."""
    import pyspark.rdd
    import pyspark.sql

    def boom(self, *a, **k):
        raise AssertionError("service collected a full query result")

    monkeypatch.setattr(pyspark.sql.DataFrame, "collect", boom)
    monkeypatch.setattr(pyspark.rdd.RDD, "collect", boom)
    r = urllib.request.Request(
        f"{svc}/databases/events/query",
        data=json.dumps({"query": "from * click;"}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(r) as resp:
        assert resp.headers.get("Transfer-Encoding") == "chunked"
        assert resp.headers.get("Content-Length") is None
        lines = resp.read().decode().strip().split("\n")
    assert len(lines) > 100  # the whole topic, not a bounded head
    assert all(json.loads(l)["topic"] == "click" for l in lines[:5])


def test_export_streams_chunked_and_validates_names(svc):
    # chunked response, no full-body buffering
    r = urllib.request.Request(
        f"{svc}/export",
        data=json.dumps(
            {"database": "scratch", "producer": "dev1", "topics": {"/a": 0}}
        ).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(r) as resp:
        assert resp.headers.get("Transfer-Encoding") == "chunked"
        assert resp.read().startswith(b"\x89MCAP")
    # a crafted producer/topic can never reach the QL parser
    for body in (
        {"database": "scratch", "producer": "dev1; truncate x /y now", "topics": {"/a": 0}},
        {"database": "scratch", "producer": "dev1", "topics": {"/a between 0 and 1": 0}},
        # charset-legal but QL-reserved names also change the statement
        # shape ('from between ...') — rejected as 400, not a parse 500
        {"database": "scratch", "producer": "between", "topics": {"/a": 0}},
        {"database": "scratch", "producer": "dev1", "topics": {"desc": 0}},
        {"database": "scratch", "producer": "TRUNCATE", "topics": {"/a": 0}},
    ):
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(f"{svc}/export", body)
        assert e.value.code == 400


def test_unknown_routes(svc):
    for url, code in [
        (f"{svc}/nope", 404),
        (f"{svc}/databases/nodb/topics", 404),  # unknown resource, not bad request
        (f"{svc}/databases/events/schemas/deadbeef", 404),
    ]:
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(url)
        assert e.value.code == code, url


def test_responses_are_http11(svc):
    with urllib.request.urlopen(f"{svc}/databases") as resp:
        assert resp.version == 11  # chunked framing is an HTTP/1.1 construct


def test_tail_cap_cuts_at_version_boundary(spark, tmp_path):
    """A capped /tail must never strand rows: the follow client advances
    its cursor to the served version, so the cap cuts at a version
    boundary (and a single over-cap version still ships whole)."""
    from dp3_spark.engine import DP3Engine as _E
    from dp3_spark.service import DP3Service as _S
    from dp3_spark.streaming.lifecycle import VersionedLogTable as _T

    table = _T(spark, str(tmp_path / "tailtbl"))
    schema = "producer string, topic string, log_time long, sequence long, v double"
    for k in range(3):  # three appends -> three versions, 2 rows each
        table.append(
            spark.createDataFrame(
                [("d", "/t", 100 * k + i, 2 * k + i, float(k)) for i in range(2)],
                schema,
            )
        )
    s = _S({"tt": _E(spark, table=table)})
    host, port = s.start()
    base = f"http://{host}:{port}/databases/tt/tail"
    try:
        def poll(frm, limit):
            with urllib.request.urlopen(f"{base}?from={frm}&limit={limit}") as r:
                lines = [json.loads(x) for x in r.read().splitlines() if x]
            return lines[0]["version"], lines[1:]

        seen, cursor = [], 0
        for _ in range(10):
            cursor2, rows = poll(cursor, 3)  # cap below two versions' 4 rows
            if cursor2 == cursor:
                break
            assert len(rows) == 2  # exactly one whole version per poll
            seen += rows
            cursor = cursor2
        assert sorted(r["sequence"] for r in seen) == list(range(6))  # no loss
        # a single version larger than the cap still ships whole (progress)
        v2, rows2 = poll(0, 1)
        assert len(rows2) == 2 and v2 == 1
    finally:
        s.stop()


def test_statrange_quantiles_param(svc):
    out = _req(
        f"{svc}/statrange",
        {
            "database": "events",
            "topic": "view",
            "start": 1704067200000000000,
            "end": 1706745600000000000,
            "granularity": 86400 * 10**9,
            "quantiles": [0.5, 0.9],
        },
    )
    assert out  # daily buckets over the fixture span
    assert {"bucket_start", "p50", "p90"} <= set(out[0])
