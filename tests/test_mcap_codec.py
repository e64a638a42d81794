"""Pure-python MCAP codec round trip + the full dp3 import path: write an
MCAP file -> distributed decode (read_mcap) -> versioned table -> QL query
through the engine.  This is the reference's `POST /import` then `POST
/query` lifecycle (SURVEY.md §3.1-3.2) with no external mcap dependency."""

import io
import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dp3_spark.engine import DP3Engine
from dp3_spark.sources import mcap as MCAP
from dp3_spark.sources.mcap_codec import (
    McapChannel,
    McapFormatError,
    McapMessage,
    McapSchema,
    iter_mcap,
    write_mcap,
)
from dp3_spark.streaming.lifecycle import VersionedLogTable


def fix_mcap_bytes(n=20, topic="/fix", **write_opts):
    schema = McapSchema(1, "sensor_msgs/NavSatFix", "jsonschema", b'{"type":"object"}')
    channel = McapChannel(1, 1, topic, "json")
    base = 1479512770309617340
    msgs = [
        McapMessage(
            channel_id=1,
            sequence=i,
            log_time=base + i * 100_000_000,
            publish_time=base + i * 100_000_000,
            data=json.dumps({"latitude": 37.4 + i * 1e-4, "longitude": -122.1}).encode(),
        )
        for i in range(n)
    ]
    buf = io.BytesIO()
    write_mcap(buf, [schema], [channel], msgs, **write_opts)
    return buf.getvalue()


def test_round_trip():
    raw = fix_mcap_bytes(5)
    out = list(iter_mcap(io.BytesIO(raw)))
    assert len(out) == 5
    schema, channel, msg = out[0]
    assert schema.name == "sensor_msgs/NavSatFix"
    assert channel.topic == "/fix"
    assert msg.log_time == 1479512770309617340
    assert json.loads(out[4][2].data)["latitude"] == pytest.approx(37.4004)


@pytest.mark.parametrize("compression", ["zstd", "lz4", ""])
def test_chunked_round_trip(compression):
    """Chunked+compressed files — the real-world MCAP profile
    (mcap/lazy_indexed_iterator.go:10-48) — decode identically to the
    unchunked stream."""
    raw = fix_mcap_bytes(
        50, chunked=True, compression=compression, chunk_size=256
    )
    plain = fix_mcap_bytes(50)
    if compression:
        assert len(raw) != len(plain)
    got = [
        (m.sequence, m.log_time, m.data) for _, _, m in iter_mcap(io.BytesIO(raw))
    ]
    want = [
        (m.sequence, m.log_time, m.data) for _, _, m in iter_mcap(io.BytesIO(plain))
    ]
    assert got == want and len(got) == 50


def test_chunked_multi_chunk_boundaries():
    raw = fix_mcap_bytes(200, chunked=True, compression="zstd", chunk_size=512)
    out = list(iter_mcap(io.BytesIO(raw)))
    assert [m.sequence for _, _, m in out] == list(range(200))


def test_chunk_crc_validated():
    raw = bytearray(fix_mcap_bytes(30, chunked=True, compression=""))
    # flip a byte inside the chunk body (a message payload char)
    idx = raw.find(b"latitude")
    assert idx > 0
    raw[idx] ^= 0xFF
    with pytest.raises(McapFormatError, match="crc"):
        list(iter_mcap(io.BytesIO(bytes(raw))))


def test_unsupported_compression_rejected():
    with pytest.raises(McapFormatError, match="compression"):
        fix_mcap_bytes(5, chunked=True, compression="snappy-unknown")


def test_scan_schemas_on_chunked_file():
    from dp3_spark.sources.mcap_codec import scan_schemas

    raw = fix_mcap_bytes(50, chunked=True, compression="lz4", chunk_size=256)
    scs = scan_schemas(io.BytesIO(raw))
    assert [s.name for s in scs] == ["sensor_msgs/NavSatFix"]


def test_chunked_ros1_decode_tables(spark, tmp_path):
    """Chunked+zstd MCAP through the full import+decode path."""
    from tests.test_rosdecode import NAVSATFIX, _write_navsat_mcap  # noqa: F401
    from dp3_spark.sources.mcap_codec import scan_schemas as _  # keep import local
    from dp3_spark.sources.msgdef import parse_ros1msg
    from dp3_spark.sources.rosdecode import ros1_encode

    s = parse_ros1msg("sensor_msgs", "NavSatFix", NAVSATFIX)
    msgs = []
    for i in range(40):
        payload = ros1_encode(
            s,
            {
                "header": {"seq": i, "stamp": 10**18 + i, "frame_id": "gps"},
                "status": 0,
                "lat": 40.0 + i,
                "lon": -120.0,
                "position_covariance": [0.0] * 9,
                "position_covariance_type": 1,
            },
        )
        msgs.append(McapMessage(1, i, 1000 + i, 1000 + i, payload))
    p = str(tmp_path / "fix_chunked.mcap")
    with open(p, "wb") as f:
        write_mcap(
            f,
            [McapSchema(1, "sensor_msgs/NavSatFix", "ros1msg", NAVSATFIX.encode())],
            [McapChannel(1, 1, "/fix", "ros1")],
            msgs,
            chunked=True,
            compression="zstd",
            chunk_size=1024,
        )
    df = MCAP.decode_tables(spark, [(p, "bot")])["sensor_msgs/NavSatFix"]
    rows = df.orderBy("sequence").collect()
    assert len(rows) == 40
    assert rows[7]["lat"] == 47.0 and rows[7]["header"]["seq"] == 7


def test_decode_tables_mixed_schema_unions_generations(spark, tmp_path):
    """A schema name with TWO generations in one file must not silently
    keep only the last: decode_tables routes it through decode_evolving —
    union-by-name, nulls for absent fields, schema_hash per row."""
    from dp3_spark.sources.mcap import schema_hash
    from dp3_spark.sources.msgdef import parse_ros1msg
    from dp3_spark.sources.rosdecode import ros1_encode

    v1 = "int64 n\nfloat64 x\n"
    v2 = "int64 n\nfloat64 x\nstring tag\n"
    s1 = parse_ros1msg("dp3", "Evolving", v1)
    s2 = parse_ros1msg("dp3", "Evolving", v2)
    msgs = []
    for i in range(10):
        if i % 2 == 0:
            msgs.append(
                McapMessage(1, i, 1000 + i, 1000 + i, ros1_encode(s1, {"n": i, "x": i * 0.5}))
            )
        else:
            msgs.append(
                McapMessage(
                    2, i, 1000 + i, 1000 + i,
                    ros1_encode(s2, {"n": i, "x": i * 0.5, "tag": f"t{i}"}),
                )
            )
    p = str(tmp_path / "evolving.mcap")
    with open(p, "wb") as f:
        write_mcap(
            f,
            [
                McapSchema(1, "dp3/Evolving", "ros1msg", v1.encode()),
                McapSchema(2, "dp3/Evolving", "ros1msg", v2.encode()),
            ],
            [McapChannel(1, 1, "/e", "ros1"), McapChannel(2, 2, "/e", "ros1")],
            msgs,
        )
    out = MCAP.decode_tables(spark, [(p, "bot")])
    df = out["dp3/Evolving"]
    rows = {r["sequence"]: r for r in df.collect()}
    assert len(rows) == 10
    assert rows[3]["tag"] == "t3" and rows[2]["tag"] is None
    assert rows[2]["schema_hash"] == schema_hash(v1.encode())
    assert rows[3]["schema_hash"] == schema_hash(v2.encode())
    assert rows[4]["x"] == 2.0


def test_bad_magic_rejected():
    with pytest.raises(McapFormatError, match="magic"):
        list(iter_mcap(io.BytesIO(b"not an mcap file....")))


def test_truncated_rejected():
    raw = fix_mcap_bytes(3)
    with pytest.raises(McapFormatError):
        list(iter_mcap(io.BytesIO(raw[: len(raw) // 2 + 3])))


def test_import_then_query_end_to_end(spark):
    """MCAP file on disk -> read_mcap (default decoder, pure-python path)
    -> VersionedLogTable -> QL query via DP3Engine."""
    d = tempfile.mkdtemp(prefix="dp3_mcap_")
    try:
        for robot in ("robot1", "robot2"):
            with open(f"{d}/{robot}.mcap", "wb") as f:
                f.write(fix_mcap_bytes(10))
        rows = MCAP.read_mcap(
            spark, [(f"{d}/robot1.mcap", "robot1"), (f"{d}/robot2.mcap", "robot2")]
        )
        assert rows.count() == 20
        assert set(r["schema_name"] for r in rows.select("schema_name").distinct().collect()) == {
            "sensor_msgs/NavSatFix"
        }

        # land it in a versioned table with a decoded latitude column
        table = VersionedLogTable(spark, f"{d}/table")
        decoded = rows.withColumn(
            "latitude", F.get_json_object(F.col("data").cast("string"), "$.latitude")
            .cast("double")
        ).drop("data")
        table.append(decoded)

        engine = DP3Engine(spark, table=table)
        out = engine.execute(
            "from robot1 /fix where /fix.latitude >= 37.4005 limit 3;"
        )
        got = [r["sequence"] for r in out.collect()]
        assert got == [5, 6, 7]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_python_datasource_format_mcap(spark, tmp_path):
    """spark.read.format('mcap') — the DataSource V2 path must return the
    identical frame to the programmatic read_mcap() reader, with one
    input partition per chunk (the reference's chunk-indexed scan)."""
    from dp3_spark.sources.mcap import read_mcap
    from dp3_spark.sources.mcap_datasource import McapUnit, McapReader, register

    raw = fix_mcap_bytes(40, chunked=True, chunk_size=400, compression="zstd")
    p = tmp_path / "cap.mcap"
    p.write_bytes(raw)

    register(spark)
    df = (
        spark.read.format("mcap")
        .option("producer", "bot7")
        .load(str(p))
    )
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(tuple(r) for r in read_mcap(spark, [(str(p), "bot7")]).collect())
    assert got == want
    assert len(got) == 40
    assert got[0][0] == "bot7"
    # chunk-granular parallelism: several partitions for one file
    reader = McapReader({"path": str(p), "producer": "bot7"})
    parts = reader.partitions()
    assert len(parts) > 1
    assert all(isinstance(u, McapUnit) for u in parts)


def test_python_datasource_user_schema_subset_reorder(spark, tmp_path):
    """A user-supplied .schema() must map by NAME (subset + reorder), not
    positionally."""
    from dp3_spark.sources.mcap_datasource import register

    p = tmp_path / "s.mcap"
    p.write_bytes(fix_mcap_bytes(5))
    register(spark)
    df = (
        spark.read.format("mcap")
        .schema("topic string, sequence long, producer string")
        .option("producer", "r2")
        .load(str(p))
    )
    rows = sorted(tuple(r) for r in df.collect())
    assert rows[0] == ("/fix", 0, "r2")
    assert len(rows) == 5


def test_python_datasource_rejects_wrong_type(spark, tmp_path):
    from dp3_spark.sources.mcap_datasource import register

    p = tmp_path / "t.mcap"
    p.write_bytes(fix_mcap_bytes(3))
    register(spark)
    import pytest as _pt

    with _pt.raises(Exception, match="type mismatch"):
        spark.read.format("mcap").schema("log_time string").load(str(p)).collect()
