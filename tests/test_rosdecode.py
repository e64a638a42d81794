"""ROS1/ROS2 schema parsing + payload decode tests, mirroring the
reference's matrices (util/ros1msg/parser_test.go, transform_test.go,
util/schema/parser_test.go AnalyzeSchema cases, executor_test.go:149-241
field-filter semantics)."""

import io
import os
import tempfile

import pytest

from dp3_spark.sources import mcap as MCAP
from dp3_spark.sources.mcap_codec import (
    McapChannel,
    McapMessage,
    McapSchema,
    write_mcap,
)
from dp3_spark.sources.msgdef import (
    MsgDefError,
    analyze_schema,
    parse_ros1msg,
    parse_ros2msg,
    spark_struct,
)
from dp3_spark.sources.rosdecode import (
    RosDecodeError,
    compile_row_decoder,
    decode_ros1,
    ros1_encode,
    schema_np_dtype,
)

NAVSATFIX = """\
# GPS fix message
uint8 COVARIANCE_TYPE_UNKNOWN=0
Header header
int8 status
float64 lat
float64 lon
float64[9] position_covariance
uint8 position_covariance_type
================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
"""

ALLPRIMS = """\
uint8 u8
uint16 u16
uint32 u32
uint64 u64
int8 i8
int16 i16
int32 i32
int64 i64
float32 f32
float64 f64
string s
bool b
time t
duration d
char c
byte y
"""


# ------------------------------------------------------------- schema parse


def test_parse_ros1_navsatfix():
    s = parse_ros1msg("sensor_msgs", "NavSatFix", NAVSATFIX)
    assert s.name == "sensor_msgs/NavSatFix"
    names = [f.name for f in s.fields]
    # constant skipped (transform.go:117)
    assert names == [
        "header",
        "status",
        "lat",
        "lon",
        "position_covariance",
        "position_covariance_type",
    ]
    header = s.fields[0].type
    assert header.record
    assert [f.name for f in header.fields] == ["seq", "stamp", "frame_id"]
    cov = s.fields[4].type
    assert cov.array and cov.fixed_size == 9 and cov.items.primitive == "float64"


def test_analyze_schema_flattening():
    """Reference AnalyzeSchema (util/schema/parser.go:548-589): records ->
    name.sub, fixed arrays < 10 -> name[i], varlen arrays skipped."""
    s = parse_ros1msg("sensor_msgs", "NavSatFix", NAVSATFIX)
    fields = analyze_schema(s)
    names = [n for n, _ in fields]
    assert "header.seq" in names
    assert "header.stamp" in names  # time is ONE leaf (ns), parser.go:164-172
    assert "header.frame_id" in names
    assert "position_covariance[0]" in names and "position_covariance[8]" in names
    assert dict(fields)["position_covariance[3]"] == "float64"
    assert dict(fields)["header.stamp"] == "time"


def test_analyze_schema_skips_varlen_and_large_fixed():
    s = parse_ros1msg(
        "test", "M", "float64[] varr\nfloat64[12] big\nint32 x\n"
    )
    names = [n for n, _ in analyze_schema(s)]
    assert names == ["x"]


def test_parse_ros2_with_defaults_and_bounds():
    s = parse_ros2msg(
        "test",
        "M",
        "int32 X=5\nint32 Y = 7\nuint8[<=10] blob\nstring<=20 name\nint8 val -3\n",
    )
    names = [f.name for f in s.fields]
    assert names == ["blob", "name", "val"]  # constants X, Y skipped
    assert s.fields[0].type.array and s.fields[0].type.bounded
    assert s.fields[1].type.bounded and s.fields[1].type.size_bound == 20
    assert s.fields[2].default == "-3"


def test_parse_unresolved_subdep_errors():
    with pytest.raises(MsgDefError, match="subdep"):
        parse_ros1msg("test", "M", "Missing sub\n")


# ------------------------------------------------------------ decode matrix


def roundtrip(msgdef: str, msg: dict, pkg="test", name="M"):
    s = parse_ros1msg(pkg, name, msgdef)
    buf = ros1_encode(s, msg)
    return compile_row_decoder(s)(buf)


def test_decode_all_primitives():
    msg = {
        "u8": 255,
        "u16": 65535,
        "u32": 4_000_000_000,
        "u64": (1 << 63) - 1,
        "i8": -128,
        "i16": -32768,
        "i32": -(1 << 31),
        "i64": -(1 << 63),
        "f32": 1.5,
        "f64": 3.25,
        "s": "héllo wörld",
        "b": True,
        "t": 1_700_000_000_123_456_789,
        "d": 5_000_000_001,
        "c": 200,
        "y": 7,
    }
    assert roundtrip(ALLPRIMS, msg) == msg


def test_decode_uint64_overflow_raises():
    s = parse_ros1msg("test", "M", "uint64 u\n")
    buf = (1 << 63).to_bytes(8, "little")
    with pytest.raises(RosDecodeError, match="uint64"):
        compile_row_decoder(s)(buf)


def test_decode_nested_record_and_fixed_array():
    s = parse_ros1msg("sensor_msgs", "NavSatFix", NAVSATFIX)
    msg = {
        "header": {"seq": 42, "stamp": 1_600_000_000_000_000_500, "frame_id": "gps"},
        "status": -1,
        "lat": 47.5,
        "lon": -122.3,
        "position_covariance": [float(i) for i in range(9)],
        "position_covariance_type": 2,
    }
    assert compile_row_decoder(s)(ros1_encode(s, msg)) == msg


def test_decode_varlen_arrays():
    mdef = (
        "float64[] xs\nuint8[] blob\nstring[] names\nbool[] flags\n"
        "time[] stamps\nPoint[] pts\n"
        "===\nMSG: test/Point\nfloat32 x\nfloat32 y\n"
    )
    msg = {
        "xs": [1.0, 2.5, -3.0],
        "blob": b"\x00\x01\xff",
        "names": ["a", "", "ccc"],
        "flags": [True, False, True],
        "stamps": [1_000_000_007, 2_000_000_009],
        "pts": [{"x": 1.0, "y": 2.0}, {"x": -1.0, "y": 0.5}],
    }
    assert roundtrip(mdef, msg) == msg


def test_decode_empty_varlen():
    mdef = "float64[] xs\nstring[] names\nuint8[] blob\nint32 tail\n"
    msg = {"xs": [], "names": [], "blob": b"", "tail": 9}
    assert roundtrip(mdef, msg) == msg


def test_decode_fixed_record_array_and_large_byte_array():
    mdef = (
        "Point[3] pts\nuint8[16] uuid\nuint8[4] quad\n"
        "===\nMSG: test/Point\nint32 x\n"
    )
    msg = {
        "pts": [{"x": 1}, {"x": 2}, {"x": 3}],
        "uuid": bytes(range(16)),  # >= 10: binary blob
        "quad": [1, 2, 3, 4],  # < 10: addressable quad[i]
    }
    assert roundtrip(mdef, msg) == msg


# ------------------------------------------------------- vectorized decoder


FIXED_DEF = (
    "Header header\nfloat64 lat\nfloat64 lon\nfloat64[9] cov\nbool ok\n"
    "uint64 big\nint8 s8\nuint32 seq2\nPoint[2] pts\n"
    "===\nMSG: std_msgs/Header\nuint32 seq\ntime stamp\n"
    "===\nMSG: test/Point\nfloat32 x\nfloat32 y\n"
)


def _fixed_msgs(n=7):
    return [
        {
            "header": {"seq": i, "stamp": 1_600_000_000_000_000_000 + i * 1000 + i},
            "lat": 40.0 + i,
            "lon": -120.0 - i,
            "cov": [float(i * 9 + k) for k in range(9)],
            "ok": i % 2 == 0,
            "big": (1 << 62) + i,
            "s8": -i,
            "seq2": 10 * i,
            "pts": [{"x": float(i), "y": float(-i)}, {"x": 0.5, "y": float(i)}],
        }
        for i in range(n)
    ]


def test_vector_dtype_detection():
    s = parse_ros1msg("test", "M", FIXED_DEF)
    assert schema_np_dtype(s) is not None
    s2 = parse_ros1msg("test", "M", "float64 x\nstring s\n")
    assert schema_np_dtype(s2) is None  # strings are varlen


def test_vector_decode_equals_row_decode(spark):
    s = parse_ros1msg("test", "M", FIXED_DEF)
    msgs = _fixed_msgs()
    rows = [
        ("dev", "/fixed", 100 + i, i, "test/M", "h", ros1_encode(s, m))
        for i, m in enumerate(msgs)
    ]
    df = spark.createDataFrame(rows, MCAP.ROW_SCHEMA)
    out = decode_ros1(df, s).orderBy("sequence").collect()
    assert len(out) == len(msgs)
    for r, m in zip(out, msgs):
        assert r["header"]["seq"] == m["header"]["seq"]
        assert r["header"]["stamp"] == m["header"]["stamp"]
        assert r["lat"] == m["lat"] and r["ok"] == m["ok"]
        assert r["cov"] == m["cov"]
        assert r["big"] == m["big"] and r["s8"] == m["s8"]
        assert [dict(p.asDict()) for p in r["pts"]] == m["pts"]
    # row decoder agrees with the vectorized path bit-for-bit
    rd = compile_row_decoder(s)
    for m in msgs:
        assert rd(ros1_encode(s, m)) == m


def test_vector_decode_rejects_wrong_length(spark):
    s = parse_ros1msg("test", "M", "float64 x\n")
    rows = [("dev", "/t", 1, 0, "test/M", "h", b"\x00" * 7)]  # 7 != 8
    df = spark.createDataFrame(rows, MCAP.ROW_SCHEMA)
    with pytest.raises(Exception, match="payload bytes"):
        decode_ros1(df, s).collect()


# --------------------------------------------------------------- spark e2e


def _write_navsat_mcap(path: str, n=20):
    s = parse_ros1msg("sensor_msgs", "NavSatFix", NAVSATFIX)
    msgs = []
    for i in range(n):
        payload = ros1_encode(
            s,
            {
                "header": {
                    "seq": i,
                    "stamp": 1_600_000_000_000_000_000 + i * 1_000_000,
                    "frame_id": "gps" if i % 2 else "base",
                },
                "status": (-1) ** i,
                "lat": 40.0 + i,
                "lon": -120.0 - i,
                "position_covariance": [float(i + k) for k in range(9)],
                "position_covariance_type": i % 3,
            },
        )
        msgs.append(McapMessage(1, i, 1000 + i, 1000 + i, payload))
    with open(path, "wb") as f:
        write_mcap(
            f,
            [McapSchema(1, "sensor_msgs/NavSatFix", "ros1msg", NAVSATFIX.encode())],
            [McapChannel(1, 1, "/fix", "ros1")],
            msgs,
        )


def test_mcap_import_decode_tables(spark, tmp_path):
    p = str(tmp_path / "fix.mcap")
    _write_navsat_mcap(p)
    tables = MCAP.decode_tables(spark, [(p, "my-robot")])
    assert set(tables) == {"sensor_msgs/NavSatFix"}
    df = tables["sensor_msgs/NavSatFix"]
    rows = df.orderBy("sequence").collect()
    assert len(rows) == 20
    assert rows[3]["lat"] == 43.0
    assert rows[3]["header"]["frame_id"] == "gps"
    assert rows[3]["header"]["stamp"] == 1_600_000_000_003_000_000
    assert rows[3]["position_covariance"][3] == 6.0
    assert rows[0]["producer"] == "my-robot" and rows[0]["topic"] == "/fix"


def test_ql_field_query_on_imported_mcap(spark, tmp_path):
    """dp3's flagship query class on imported robot data:
    `from my-robot /fix where fix.lat > 47` plus nested/indexed access
    (executor_test.go:149-241 analog)."""
    from dp3_spark.catalog import LogStore
    from dp3_spark.plans import Compiler

    p = str(tmp_path / "fix.mcap")
    _write_navsat_mcap(p)
    df = MCAP.decode_tables(spark, [(p, "my-robot")])["sensor_msgs/NavSatFix"]
    store = LogStore(
        df=df,
        producer_col="producer",
        topic_col="topic",
        time_col="log_time",
        sequence_col="sequence",
        payload_cols=tuple(
            c
            for c in df.columns
            if c not in ("producer", "topic", "log_time", "sequence")
        ),
    )
    c = Compiler(store)

    out = c.compile("from my-robot /fix as fix where fix.lat > 47;").collect()
    assert [r["lat"] for r in out] == [40.0 + k for k in range(8, 20)]

    out = c.compile(
        "from my-robot /fix as fix where fix.header.frame_id = 'gps';"
    ).collect()
    assert len(out) == 10 and all(r["header"]["frame_id"] == "gps" for r in out)

    out = c.compile(
        "from my-robot /fix as fix where fix.position_covariance[3] < 10;"
    ).collect()
    assert [r["position_covariance"][3] for r in out] == [float(k + 3) for k in range(7)]

    out = c.compile(
        "from my-robot /fix as fix where fix.header.stamp > 1600000000010000000;"
    ).collect()
    assert len(out) == 9

    # unknown field errors with the available list (executor/expression.go:120)
    from dp3_spark.plans.compiler import FieldNotFoundError

    with pytest.raises(FieldNotFoundError):
        c.compile("from my-robot /fix as fix where fix.nope = 1;")


def test_schema_registry_rows(spark, tmp_path):
    p = str(tmp_path / "fix.mcap")
    _write_navsat_mcap(p)
    reg = MCAP.read_mcap_schemas(spark, [(p, "r")]).collect()
    assert len(reg) == 1
    assert reg[0]["schema_name"] == "sensor_msgs/NavSatFix"
    assert reg[0]["encoding"] == "ros1msg"
    assert bytes(reg[0]["schema_data"]) == NAVSATFIX.encode()
    assert reg[0]["schema_hash"] == MCAP.schema_hash(NAVSATFIX.encode())


def test_schema_lookup_by_hash(spark, tmp_path):
    """GET /schemas/{hash} parity (routes/routes.go:57): known hash returns
    the schema row; unknown hash is an error, not an empty result."""
    p = str(tmp_path / "fix.mcap")
    _write_navsat_mcap(p)
    reg = MCAP.read_mcap_schemas(spark, [(p, "r")])
    h = MCAP.schema_hash(NAVSATFIX.encode())
    row = MCAP.schema_by_hash(reg, h)
    assert row["schema_name"] == "sensor_msgs/NavSatFix"
    assert bytes(row["schema_data"]) == NAVSATFIX.encode()
    with pytest.raises(MCAP.SchemaNotFoundError):
        MCAP.schema_by_hash(reg, "0" * 64)


# ------------------------------------------------------------- ros2 / CDR

from dp3_spark.sources.rosdecode import (  # noqa: E402
    cdr_encode,
    cdr_np_dtype,
    compile_cdr_row_decoder,
    decode_ros2,
)

CDR_VARLEN_DEF = """\
uint8 tiny
float64 big
float32[3] cov
string name
float64[] samples
Inner inner
bool ok
string[] tags
int16 end
================================================================================
MSG: test/Inner
uint8 a
int64 b
uint16[] c
"""

CDR_FIXED_DEF = """\
uint8 tiny
float64 big
int16 half
Inner2 pose
float32[3] cov
bool ok
================================================================================
MSG: test/Inner2
int32 sec
uint32 nanosec
float64 x
"""


def _cdr_varlen_msg(i=0):
    return {
        "tiny": 7 + i,
        "big": 3.5 + i,
        "cov": [1.0 + i, 2.0, 3.0],
        "name": f"héllo{i}",
        "samples": [1.5, -2.5, 9.25][: i % 4],
        "inner": {"a": 200, "b": -(1 << 40) - i, "c": [1, 2, 65535]},
        "ok": i % 2 == 0,
        "tags": ["a", "", "xyz"][: (i + 1) % 4],
        "end": -5 * i,
    }


def _cdr_fixed_msg(i=0):
    return {
        "tiny": 9 + i,
        "big": -1.25 * i,
        "half": -7 + i,
        "pose": {"sec": 123 + i, "nanosec": 456, "x": 2.5 + i},
        "cov": [0.5 + i, 1.5, 2.5],
        "ok": i % 2 == 1,
    }


def test_cdr_roundtrip_varlen():
    """Alignment stress: u8→f64 (7 pad), 8-byte realign after a varlen
    count, NUL-counted strings, nested record with trailing varlen."""
    s = parse_ros2msg("test", "M", CDR_VARLEN_DEF)
    dec = compile_cdr_row_decoder(s)
    for i in range(5):
        m = _cdr_varlen_msg(i)
        assert dec(cdr_encode(s, m)) == m
    assert cdr_np_dtype(s) is None  # strings are varlen


def test_cdr_vector_dtype_matches_wire():
    s = parse_ros2msg("test", "M2", CDR_FIXED_DEF)
    dt = cdr_np_dtype(s)
    m = _cdr_fixed_msg(3)
    buf = cdr_encode(s, m)
    assert dt is not None and dt.itemsize == len(buf)
    import numpy as np

    rec = np.frombuffer(buf, dtype=dt)
    assert rec["big"][0] == m["big"]
    assert rec["pose"]["x"][0] == m["pose"]["x"]
    assert list(rec["cov"][0]) == m["cov"]
    assert compile_cdr_row_decoder(s)(buf) == m


def test_cdr_bad_encapsulation():
    s = parse_ros2msg("test", "M2", CDR_FIXED_DEF)
    dec = compile_cdr_row_decoder(s)
    good = cdr_encode(s, _cdr_fixed_msg())
    with pytest.raises(RosDecodeError, match="encapsulation"):
        dec(b"\x00\x00" + good[2:])  # big-endian flag


def _ros2_rows(s, msgs, pad=0):
    return [
        (
            "dev",
            "/imu",
            100 + i,
            i,
            "test/M",
            "h",
            cdr_encode(s, m) + b"\x00" * pad,
        )
        for i, m in enumerate(msgs)
    ]


def test_decode_ros2_vectorized_e2e(spark):
    s = parse_ros2msg("test", "M2", CDR_FIXED_DEF)
    msgs = [_cdr_fixed_msg(i) for i in range(7)]
    df = spark.createDataFrame(_ros2_rows(s, msgs), MCAP.ROW_SCHEMA)
    out = decode_ros2(df, s).orderBy("sequence").collect()
    for r, m in zip(out, msgs):
        assert r["big"] == m["big"] and r["tiny"] == m["tiny"]
        assert r["pose"]["sec"] == m["pose"]["sec"]
        assert r["pose"]["x"] == m["pose"]["x"]
        assert r["cov"] == m["cov"] and r["ok"] == m["ok"]


def test_decode_ros2_uniform_trailing_pad(spark):
    """CDR serializers may pad the tail to 4 bytes — uniform pad still
    takes the vectorized path (widened record)."""
    s = parse_ros2msg("test", "M2", CDR_FIXED_DEF)
    msgs = [_cdr_fixed_msg(i) for i in range(4)]
    df = spark.createDataFrame(_ros2_rows(s, msgs, pad=3), MCAP.ROW_SCHEMA)
    out = decode_ros2(df, s).orderBy("sequence").collect()
    assert [r["half"] for r in out] == [m["half"] for m in msgs]


def test_decode_ros2_varlen_e2e(spark):
    s = parse_ros2msg("test", "M", CDR_VARLEN_DEF)
    msgs = [_cdr_varlen_msg(i) for i in range(6)]
    df = spark.createDataFrame(_ros2_rows(s, msgs), MCAP.ROW_SCHEMA)
    out = decode_ros2(df, s).orderBy("sequence").collect()
    for r, m in zip(out, msgs):
        assert r["name"] == m["name"]
        assert r["samples"] == m["samples"]
        assert r["inner"]["b"] == m["inner"]["b"]
        assert r["inner"]["c"] == m["inner"]["c"]
        assert r["tags"] == m["tags"]
        assert r["end"] == m["end"]


IMU_ROS2 = """\
std_msgs/Header header
float64[4] orientation
float64[3] angular_velocity
================================================================================
MSG: std_msgs/Header
builtin_interfaces/Time stamp
string frame_id
================================================================================
MSG: builtin_interfaces/Time
int32 sec
uint32 nanosec
"""


def test_mcap_ros2_decode_tables(spark, tmp_path):
    """End-to-end: chunked MCAP with a ros2msg schema + CDR payloads →
    decode_tables → typed nested columns, QL-addressable."""
    s = parse_ros2msg("sensor_msgs", "Imu", IMU_ROS2)
    msgs = []
    for i in range(15):
        payload = cdr_encode(
            s,
            {
                "header": {
                    "stamp": {"sec": 1_600_000_000 + i, "nanosec": 17 * i},
                    "frame_id": "imu",
                },
                "orientation": [0.0, 0.0, 0.0, 1.0 + i],
                "angular_velocity": [0.1 * i, -0.1 * i, 0.0],
            },
        )
        msgs.append(McapMessage(1, i, 2000 + i, 2000 + i, payload))
    p = str(tmp_path / "imu.mcap")
    with open(p, "wb") as f:
        write_mcap(
            f,
            [McapSchema(1, "sensor_msgs/Imu", "ros2msg", IMU_ROS2.encode())],
            [McapChannel(1, 1, "/imu", "cdr")],
            msgs,
        )
    tables = MCAP.decode_tables(spark, [(p, "bot2")])
    assert set(tables) == {"sensor_msgs/Imu"}
    rows = tables["sensor_msgs/Imu"].orderBy("sequence").collect()
    assert len(rows) == 15
    assert rows[4]["header"]["stamp"]["sec"] == 1_600_000_004
    assert rows[4]["header"]["frame_id"] == "imu"
    assert rows[4]["orientation"][3] == 5.0
    assert rows[4]["angular_velocity"][0] == pytest.approx(0.4)


def test_cdr_wstring_refused():
    """XCDR wstring wire format varies by implementation — refuse cleanly
    rather than mis-decode as utf-8 (ROS1 wstring still decodes)."""
    s = parse_ros2msg("test", "W", "wstring name\n")
    with pytest.raises(RosDecodeError, match="wstring"):
        compile_cdr_row_decoder(s)
    with pytest.raises(RosDecodeError, match="wstring"):
        cdr_encode(s, {"name": "x"})
