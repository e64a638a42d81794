"""ROS message-definition schema parsing and flattening.

The reference parses ros1msg / ros2msg text schemas into a generic Schema
model (util/ros1msg/transform.go; util/ros2msg/transform.go:24-45;
util/schema/schema.go) and flattens them into addressable leaf fields with
`AnalyzeSchema` (util/schema/parser.go:548-589): records expand to
`name.sub`, fixed arrays of size < 10 expand to `name[i]`, variable-length
arrays are not addressable.  QL filters resolve field names against that
flattened list (executor/expression.go:100-122).

This module is a from-scratch implementation of the same schema model for
Spark: `parse_ros1msg` / `parse_ros2msg` produce a `MsgSchema`,
`analyze_schema` reproduces the reference's flattened field list, and
`spark_struct` maps the schema onto a nested Spark StructType so dotted /
indexed QL access (`t.header.stamp`, `t.position_covariance[3]`) compiles
to native Catalyst struct/array expressions — no flattened column
explosion needed on the Spark side.

Type mapping (ROS -> Spark), chosen so every reference-addressable leaf is
filterable with built-in expressions:

    int8/byte      -> tinyint        uint8/char -> smallint
    int16          -> smallint       uint16     -> int
    int32          -> int            uint32     -> bigint
    int64          -> bigint         uint64     -> bigint (decode errors
                                                  on values >= 2^63)
    float32        -> float          float64    -> double
    string/wstring -> string         bool       -> boolean
    time/duration  -> bigint nanoseconds (1e9*sec + nsec, exactly the
                      reference decode, util/ros1msg/parser.go:164-176)

Variable-length uint8 arrays map to `binary` (the reference's byte-array
fast path, util/schema/parser.go:505-507); other arrays map to
`array<...>` — a documented superset: the reference skips them entirely,
here the data is preserved and addressable with Spark functions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

PRIMITIVES = {
    "int8",
    "int16",
    "int32",
    "int64",
    "uint8",
    "uint16",
    "uint32",
    "uint64",
    "float32",
    "float64",
    "string",
    "wstring",
    "bool",
    "time",
    "duration",
    "char",
    "byte",
}


@dataclass(frozen=True)
class MsgType:
    primitive: str | None = None
    array: bool = False
    fixed_size: int = 0
    items: "MsgType | None" = None
    record: bool = False
    fields: tuple["MsgField", ...] = ()
    bounded: bool = False
    size_bound: int = 0

    @property
    def is_primitive(self) -> bool:
        return self.primitive is not None


@dataclass(frozen=True)
class MsgField:
    name: str
    type: MsgType
    default: object = None


@dataclass(frozen=True)
class MsgSchema:
    name: str
    fields: tuple[MsgField, ...]


class MsgDefError(ValueError):
    pass


# ---------------------------------------------------------------- parsing


def _split_sections(text: str) -> list[tuple[str, list[str]]]:
    """Split a concatenated message definition on '=' separator lines into
    (header_type, lines) sections; the first section has header ''."""
    sections: list[tuple[str, list[str]]] = [("", [])]
    for raw in text.splitlines():
        stripped = raw.strip()
        if stripped and set(stripped) == {"="} and len(stripped) >= 3:
            sections.append(("", []))
            continue
        sections[-1][1].append(raw)
    out = []
    for i, (_, lines) in enumerate(sections):
        header = ""
        body = lines
        if i > 0:
            # subsequent sections begin with 'MSG: pkg/Name'
            for j, ln in enumerate(lines):
                s = ln.strip()
                if not s or s.startswith("#"):
                    continue
                if s.upper().startswith("MSG:"):
                    header = s[4:].strip()
                    body = lines[j + 1 :]
                else:
                    raise MsgDefError(f"subdefinition missing MSG: header: {s!r}")
                break
        out.append((header, body))
    return out


def _strip_comment(line: str) -> str:
    """Drop '#' comments, respecting quoted strings (ros2 defaults)."""
    in_q: str | None = None
    for i, ch in enumerate(line):
        if in_q:
            if ch == in_q and line[i - 1] != "\\":
                in_q = None
        elif ch in ("'", '"'):
            in_q = ch
        elif ch == "#":
            return line[:i]
    return line


def _parse_type_token(tok: str, *, ros2: bool) -> tuple[str, bool, int, bool, int, int]:
    """-> (base_name, is_array, fixed_size, bounded_array, array_bound,
    string_bound)."""
    string_bound = 0
    arr = False
    fixed = 0
    bounded = False
    bound = 0
    if "[" in tok:
        base, _, rest = tok.partition("[")
        inner = rest.rstrip("]")
        arr = True
        if inner.startswith("<="):
            if not ros2:
                raise MsgDefError(f"bounded array in ros1msg: {tok!r}")
            bounded = True
            bound = int(inner[2:])
        elif inner:
            fixed = int(inner)
    else:
        base = tok
    if ros2 and "<=" in base:
        base, _, b = base.partition("<=")
        string_bound = int(b)
    return base, arr, fixed, bounded, bound, string_bound


def _parse_section(
    lines: list[str], *, ros2: bool
) -> list[tuple[str, bool, int, bool, int, int, str, str | None]]:
    """Each entry: (base_type, array, fixed, bounded, bound, str_bound,
    field_name, default_literal).  Constants are skipped (transform.go:117)."""
    fields = []
    for raw in lines:
        line = _strip_comment(raw).strip()
        if not line:
            continue
        parts = line.split(None, 1)
        if len(parts) != 2:
            raise MsgDefError(f"cannot parse field line: {raw!r}")
        type_tok, rest = parts
        rest = rest.strip()
        # constants: 'type NAME=value' / 'type NAME = value'.  ros1 string
        # constants run to end of line, so any '=' in the name-part means
        # constant.  ros2 default values are space-separated (no '=').
        name_part = rest.split(None, 1)[0]
        if "=" in name_part or (
            not ros2 and "=" in rest
        ):  # ros1: `string FOO=anything at all`
            continue
        name = name_part
        default = rest[len(name) :].strip() or None
        if ros2 and default is not None and default.startswith("="):
            continue  # ros2 constant written with spaces: `int32 X = 5`
        if default is not None and not ros2:
            raise MsgDefError(f"unexpected trailing tokens in ros1msg field: {raw!r}")
        base, arr, fixed, bounded, bound, sbound = _parse_type_token(type_tok, ros2=ros2)
        fields.append((base, arr, fixed, bounded, bound, sbound, name, default))
    return fields


def _resolve(
    pkg: str,
    base: str,
    subdeps: dict[str, tuple[str, list]],
    *,
    ros2: bool,
    _stack: tuple = (),
) -> MsgType:
    if base in PRIMITIVES:
        return MsgType(primitive=base)
    # record: subdep lookup with package inheritance (transform.go:123-136)
    key = base if base in subdeps else f"{pkg}/{base}"
    if key not in subdeps:
        raise MsgDefError(f"failed to resolve subdep {pkg}/{base}")
    if key in _stack:
        # recursive definitions cannot exist on the wire; a malformed
        # schema must error cleanly, not blow the stack
        raise MsgDefError(f"recursive message definition: {key}")
    _stack = _stack + (key,)
    sub_pkg_name, sub_fields = subdeps[key]
    sub_pkg = sub_pkg_name.split("/")[0]
    fields = []
    for b, arr, fixed, bounded, bound, sbound, name, default in sub_fields:
        t = _make_type(
            sub_pkg, b, arr, fixed, bounded, bound, sbound, subdeps,
            ros2=ros2, _stack=_stack,
        )
        fields.append(MsgField(name, t, default))
    return MsgType(record=True, fields=tuple(fields))


def _make_type(
    pkg: str,
    base: str,
    arr: bool,
    fixed: int,
    bounded: bool,
    bound: int,
    sbound: int,
    subdeps: dict,
    *,
    ros2: bool,
    _stack: tuple = (),
) -> MsgType:
    inner = _resolve(pkg, base, subdeps, ros2=ros2, _stack=_stack)
    if sbound:
        inner = MsgType(primitive=inner.primitive, bounded=True, size_bound=sbound)
    if arr:
        return MsgType(
            array=True, fixed_size=fixed, items=inner, bounded=bounded, size_bound=bound
        )
    return inner


def _parse_msgdef(pkg: str, name: str, text: str, *, ros2: bool) -> MsgSchema:
    sections = _split_sections(text)
    subdeps: dict[str, tuple[str, list]] = {}
    for header, lines in sections[1:]:
        parsed = _parse_section(lines, ros2=ros2)
        if header == "std_msgs/Header":
            # unqualified 'Header' aliases std_msgs/Header (transform.go:141-145)
            subdeps["Header"] = (header, parsed)
        subdeps[header] = (header, parsed)
    top = _parse_section(sections[0][1], ros2=ros2)
    fields = []
    for base, arr, fixed, bounded, bound, sbound, fname, default in top:
        t = _make_type(pkg, base, arr, fixed, bounded, bound, sbound, subdeps, ros2=ros2)
        fields.append(MsgField(fname, t, default))
    return MsgSchema(name=f"{pkg}/{name}", fields=tuple(fields))


def parse_ros1msg(pkg: str, name: str, text: str | bytes) -> MsgSchema:
    """Parse a concatenated ROS1 message definition (the MCAP `ros1msg`
    schema encoding) into a MsgSchema (util/ros1msg/transform.go:44-52)."""
    if isinstance(text, bytes):
        text = text.decode("utf-8")
    return _parse_msgdef(pkg, name, text, ros2=False)


def parse_ros2msg(pkg: str, name: str, text: str | bytes) -> MsgSchema:
    """Parse a concatenated ROS2 .msg definition (the MCAP `ros2msg` schema
    encoding) into a MsgSchema (util/ros2msg/transform.go:46-53).  Bounded
    strings/arrays and default values are parsed and retained."""
    if isinstance(text, bytes):
        text = text.decode("utf-8")
    return _parse_msgdef(pkg, name, text, ros2=True)


def parse_schema(name: str, encoding: str, data: bytes | str) -> MsgSchema:
    """Dispatch on the MCAP schema encoding ('ros1msg' | 'ros2msg')."""
    pkg, _, msg = name.rpartition("/")
    pkg = pkg or name
    if encoding == "ros1msg":
        return parse_ros1msg(pkg, msg, data)
    if encoding == "ros2msg":
        return parse_ros2msg(pkg, msg, data)
    raise MsgDefError(f"unsupported schema encoding: {encoding!r}")


# ------------------------------------------------------------- flattening


def analyze_schema(s: MsgSchema) -> list[tuple[str, str]]:
    """Flattened addressable leaf fields, exactly the reference's
    AnalyzeSchema (util/schema/parser.go:548-589): per top-level field a
    queue expands records to `name.sub` (appended at the back) and fixed
    arrays of size < 10 to `name[i]` (prepended at the front); varlen and
    large fixed arrays produce no addressable fields."""
    out: list[tuple[str, str]] = []
    for f in s.fields:
        types: list[MsgType] = [f.type]
        names: list[str] = [f.name]
        while types:
            t = types.pop(0)
            name = names.pop(0)
            if t.is_primitive:
                out.append((name, t.primitive))
                continue
            if t.array:
                if 0 < t.fixed_size < 10:
                    types = [t.items] * t.fixed_size + types
                    names = [f"{name}[{i}]" for i in range(t.fixed_size)] + names
                continue
            if t.record:
                for sub in t.fields:
                    types.append(sub.type)
                    names.append(f"{name}.{sub.name}")
    return out


# ----------------------------------------------------------- spark schema

_PRIM_SPARK = {
    "int8": T.ByteType(),
    # char/byte both decode as uint8 in the reference (parser.go:209-215)
    "byte": T.ShortType(),
    "uint8": T.ShortType(),
    "char": T.ShortType(),
    "int16": T.ShortType(),
    "uint16": T.IntegerType(),
    "int32": T.IntegerType(),
    "uint32": T.LongType(),
    "int64": T.LongType(),
    "uint64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "string": T.StringType(),
    "wstring": T.StringType(),
    "bool": T.BooleanType(),
    "time": T.LongType(),
    "duration": T.LongType(),
}


def _spark_type(t: MsgType) -> T.DataType:
    if t.is_primitive:
        return _PRIM_SPARK[t.primitive]
    if t.array:
        if (
            t.items.is_primitive
            and t.items.primitive in ("uint8", "byte", "char")
            and not (0 < t.fixed_size < 10)
        ):
            # byte-array fast path (util/schema/parser.go:505-507)
            return T.BinaryType()
        return T.ArrayType(_spark_type(t.items))
    if t.record:
        return T.StructType(
            [T.StructField(f.name, _spark_type(f.type)) for f in t.fields]
        )
    raise MsgDefError(f"cannot map type {t!r}")


def spark_struct(s: MsgSchema) -> T.StructType:
    """Nested StructType for the message payload: one field per top-level
    schema field."""
    return T.StructType([T.StructField(f.name, _spark_type(f.type)) for f in s.fields])
