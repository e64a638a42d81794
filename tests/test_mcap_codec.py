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


def fix_mcap_bytes(n=20, topic="/fix"):
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
    write_mcap(buf, [schema], [channel], msgs)
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
