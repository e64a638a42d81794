"""ROS1 binary payload decoding into typed nested Spark columns.

The reference compiles each message schema to a bytecode program executed
by a stack VM per message (util/schema/parser.go:114-249), decoding only
requested fields.  Spark-first equivalent: compile the schema ONCE on the
driver into

  1. a generated-Python row decoder (struct.unpack_from runs coalesced
     across adjacent fixed-width fields), used inside `mapInArrow` — the
     decode is Arrow-batched and runs fully parallel across executors; and
  2. a numpy structured-dtype VECTORIZED decoder for schemas with no
     variable-length content (no strings / varlen arrays): the whole Arrow
     batch decodes with one `np.frombuffer` and column-at-a-time casts —
     no per-row Python at all.  This is the 100 TB path for fixed-width
     messages (IMU, odometry, most high-rate topics).

Column pruning: Catalyst prunes unaccessed struct fields from the scan
AFTER decode; the decode itself materializes all leaves (unlike the
reference's skip-codes).  For wide schemas where only a field subset is
queried, pass `fields=` to restrict decoding to the reference's semantics
(everything else skipped, exactly like compileSchemaByteCode's skip ops).

Decoded values match util/ros1msg/parser.go exactly: little-endian,
time/duration -> one int64 of nanoseconds (1e9*sec + nsec, parser.go:
164-176), bool -> uint8 != 0, string -> uint32-length-prefixed utf-8,
varlen arrays -> uint32 count + elements, uint8[] -> binary blob
(util/schema/parser.go:505-507).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

from dp3_spark.sources.msgdef import (
    MsgSchema,
    MsgType,
    spark_struct,
)

_I64_MAX = (1 << 63) - 1

_FMT = {
    "int8": "b",
    "uint8": "B",
    "char": "B",
    "byte": "B",
    "int16": "h",
    "uint16": "H",
    "int32": "i",
    "uint32": "I",
    "int64": "q",
    "uint64": "Q",
    "float32": "f",
    "float64": "d",
    "bool": "B",
}
_SIZE = {c: struct.calcsize("<" + c) for c in "bBhHiIqQfd"}

_BYTEISH = ("uint8", "char", "byte")

_PRIM_BYTES = {
    "int8": 1, "uint8": 1, "char": 1, "byte": 1, "bool": 1,
    "int16": 2, "uint16": 2,
    "int32": 4, "uint32": 4, "float32": 4,
    "int64": 8, "uint64": 8, "float64": 8,
}


class RosDecodeError(ValueError):
    pass


# ======================================================= row decoder (codegen)


class _RowGen:
    """Generates the body of `def _decode(buf):` for one schema.  Adjacent
    fixed-width leaves coalesce into a single precompiled struct.Struct
    unpack; variable-length content flushes the pending run first.

    cdr=True switches to ROS2 XCDR1 little-endian wire rules: a 4-byte
    encapsulation header, each primitive aligned to its size (relative to
    the post-header payload start), strings NUL-terminated with the NUL
    counted in the length prefix.  Alignment padding is folded into the
    coalesced unpack runs ('x' pad codes) while the offset is statically
    known, and becomes a runtime `off += (-off) % n` once a
    variable-length field has made it dynamic."""

    def __init__(self, *, cdr: bool = False) -> None:
        self.cdr = cdr
        self.lines: list[str] = ["def _decode(buf):"]
        if cdr:
            self.lines += [
                "    if len(buf) < 4 or buf[1] != 1:",
                "        raise RosDecodeError('unsupported CDR encapsulation "
                "(only XCDR1 little-endian)')",
                "    buf = memoryview(buf)[4:]",
            ]
        self.lines.append("    off = 0")
        self.indent = 1
        self.ns: dict[str, object] = {
            "_struct": struct,
            "_U32": struct.Struct("<I"),
            "RosDecodeError": RosDecodeError,
        }
        self.n = 0
        # pending: (fmt, nvals, kind, var)
        self.pending: list[tuple[str, int, str, str]] = []
        # offset mod 8, when statically known (cdr alignment tracking)
        self.rel: int | None = 0

    # --------------------------------------------------- cdr alignment
    def align(self, n: int) -> None:
        if not self.cdr or n <= 1:
            return
        if self.rel is not None:
            pad = (-self.rel) % n
            if pad:
                self.pending.append((f"{pad}x", 0, "pad", ""))
            self.rel = (self.rel + pad) % 8
        else:
            self.flush()
            self.w(f"off += (-off) % {n}")
            if n == 8:
                self.rel = 0

    def advance(self, nbytes: int) -> None:
        if self.cdr and self.rel is not None:
            self.rel = (self.rel + nbytes) % 8

    def var(self) -> str:
        self.n += 1
        return f"v{self.n}"

    def w(self, line: str) -> None:
        self.lines.append("    " * self.indent + line)

    def _const(self, fmt: str) -> str:
        name = "_S_" + fmt
        if name not in self.ns:
            self.ns[name] = struct.Struct("<" + fmt)
        return name

    def flush(self) -> None:
        if not self.pending:
            return
        fmt = "".join(p[0] for p in self.pending)
        sname = self._const(fmt)
        size = struct.calcsize("<" + fmt)
        self.n += 1
        t = f"_t{self.n}"
        self.w(f"{t} = {sname}.unpack_from(buf, off); off += {size}")
        i = 0
        for _, nvals, kind, var in self.pending:
            if kind == "pad":
                pass
            elif kind == "scalar":
                self.w(f"{var} = {t}[{i}]")
            elif kind == "bool":
                self.w(f"{var} = {t}[{i}] != 0")
            elif kind == "u64":
                self.w(f"{var} = {t}[{i}]")
                self.w(
                    f"if {var} > {_I64_MAX}: "
                    f"raise RosDecodeError('uint64 value overflows bigint')"
                )
            elif kind == "time":
                self.w(f"{var} = {t}[{i}] * 1000000000 + {t}[{i + 1}]")
            elif kind == "list":
                self.w(f"{var} = list({t}[{i}:{i + nvals}])")
            elif kind == "boollist":
                self.w(f"{var} = [x != 0 for x in {t}[{i}:{i + nvals}]]")
            elif kind == "u64list":
                self.w(f"{var} = list({t}[{i}:{i + nvals}])")
                self.w(
                    f"if any(x > {_I64_MAX} for x in {var}): "
                    f"raise RosDecodeError('uint64 value overflows bigint')"
                )
            elif kind == "timelist":
                self.w(
                    f"{var} = [{t}[k] * 1000000000 + {t}[k + 1] "
                    f"for k in range({i}, {i + nvals}, 2)]"
                )
            i += nvals
        self.pending = []

    # ------------------------------------------------------------ emitters
    def emit_string(self, var: str) -> None:
        self.align(4)
        self.flush()
        self.n += 1
        ln = f"_n{self.n}"
        self.w(f"({ln},) = _U32.unpack_from(buf, off); off += 4")
        if self.cdr:
            # length prefix counts the trailing NUL; the value excludes it
            self.w(
                f"{var} = bytes(buf[off:off + {ln} - 1]).decode('utf-8', 'replace') "
                f"if {ln} else ''; off += {ln}"
            )
        else:
            self.w(
                f"{var} = bytes(buf[off:off + {ln}]).decode('utf-8', 'replace'); "
                f"off += {ln}"
            )
        self.rel = None

    def emit_primitive(self, prim: str, var: str) -> None:
        if prim == "wstring" and self.cdr:
            # XCDR wstring is UTF-16 code units with implementation-varying
            # length semantics; decoding it as utf-8 would be silently
            # wrong, so refuse cleanly until a real fixture pins the wire
            # format
            raise RosDecodeError("wstring is not supported in CDR payloads")
        if prim in ("string", "wstring"):
            self.emit_string(var)
        elif prim in ("time", "duration"):
            self.align(4)
            self.pending.append(("II", 2, "time", var))
            self.advance(8)
        elif prim == "bool":
            self.pending.append(("B", 1, "bool", var))
            self.advance(1)
        elif prim == "uint64":
            self.align(8)
            self.pending.append(("Q", 1, "u64", var))
            self.advance(8)
        else:
            self.align(_PRIM_BYTES[prim])
            self.pending.append((_FMT[prim], 1, "scalar", var))
            self.advance(_PRIM_BYTES[prim])

    def emit_record(self, t: MsgType, var: str) -> None:
        subvars = []
        for f in t.fields:
            sv = self.var()
            self.emit_type(f.type, sv)
            subvars.append((f.name, sv))
        self.flush()  # subvars must be materialized before dict assembly
        body = ", ".join(f"{name!r}: {sv}" for name, sv in subvars)
        self.w(f"{var} = {{{body}}}")

    def _emit_count(self) -> str:
        """u32 element count (aligned in cdr mode)."""
        self.align(4)
        self.flush()
        self.n += 1
        ln = f"_n{self.n}"
        self.w(f"({ln},) = _U32.unpack_from(buf, off); off += 4")
        self.advance(4)
        return ln

    def emit_array(self, t: MsgType, var: str) -> None:
        items = t.items
        n = t.fixed_size
        if items.is_primitive and items.primitive in _BYTEISH and not (0 < n < 10):
            # byte-array blob (parser.go:505-507)
            if n:
                self.flush()
                self.w(f"{var} = bytes(buf[off:off + {n}]); off += {n}")
                self.advance(n)
            else:
                ln = self._emit_count()
                self.w(f"{var} = bytes(buf[off:off + {ln}]); off += {ln}")
                self.rel = None
            return
        if items.is_primitive and items.primitive not in ("string", "wstring"):
            prim = items.primitive
            ch = _FMT.get(prim)  # None for time/duration (handled below)
            if n:  # fixed: joins the pending fixed run
                if prim in ("time", "duration"):
                    self.align(4)
                    self.pending.append((f"{2 * n}I", 2 * n, "timelist", var))
                    self.advance(8 * n)
                elif prim == "bool":
                    self.pending.append((f"{n}{ch}", n, "boollist", var))
                    self.advance(n)
                elif prim == "uint64":
                    self.align(8)
                    self.pending.append((f"{n}{ch}", n, "u64list", var))
                    self.advance(8 * n)
                else:
                    self.align(_PRIM_BYTES[prim])
                    self.pending.append((f"{n}{ch}", n, "list", var))
                    self.advance(n * _PRIM_BYTES[prim])
                return
            # varlen primitive array
            ln = self._emit_count()
            if self.cdr and prim in ("int64", "uint64", "float64"):
                # elements re-align to 8 after the 4-byte count
                self.w(f"if {ln}: off += (-off) % 8")
            if prim in ("time", "duration"):
                self.n += 1
                tmp = f"_t{self.n}"
                self.w(
                    f"{tmp} = _struct.unpack_from('<%dI' % (2 * {ln}), buf, off); "
                    f"off += 8 * {ln}"
                )
                self.w(
                    f"{var} = [{tmp}[k] * 1000000000 + {tmp}[k + 1] "
                    f"for k in range(0, 2 * {ln}, 2)]"
                )
            else:
                sz = _SIZE[ch]
                self.w(
                    f"{var} = list(_struct.unpack_from('<%d{ch}' % {ln}, buf, off)); "
                    f"off += {sz} * {ln}"
                )
                if prim == "bool":
                    self.w(f"{var} = [x != 0 for x in {var}]")
                elif prim == "uint64":
                    self.w(
                        f"if any(x > {_I64_MAX} for x in {var}): "
                        f"raise RosDecodeError('uint64 value overflows bigint')"
                    )
            self.rel = None
            return
        # loop path: arrays of strings or records
        if n:
            self.flush()
            count = str(n)
        else:
            count = self._emit_count()
        self.w(f"{var} = []")
        self.n += 1
        self.w(f"for _i{self.n} in range({count}):")
        self.indent += 1
        # the body executes repeatedly: offsets inside it are never static
        self.rel = None
        sv = self.var()
        self.emit_type(items, sv)
        self.flush()
        self.w(f"{var}.append({sv})")
        self.indent -= 1
        self.rel = None

    def emit_type(self, t: MsgType, var: str) -> None:
        if t.is_primitive:
            self.emit_primitive(t.primitive, var)
        elif t.array:
            self.emit_array(t, var)
        elif t.record:
            self.emit_record(t, var)
        else:  # pragma: no cover
            raise RosDecodeError(f"cannot decode type {t!r}")


def _compile(schema: MsgSchema, *, cdr: bool):
    g = _RowGen(cdr=cdr)
    tops = []
    for f in schema.fields:
        v = g.var()
        g.emit_type(f.type, v)
        tops.append((f.name, v))
    g.flush()
    body = ", ".join(f"{name!r}: {v}" for name, v in tops)
    g.w(f"return {{{body}}}")
    src = "\n".join(g.lines)
    exec(compile(src, f"<rosdecode:{schema.name}>", "exec"), g.ns)  # noqa: S102
    fn = g.ns["_decode"]
    fn.__source__ = src  # aid debugging
    return fn


def compile_row_decoder(schema: MsgSchema):
    """-> callable(bytes) -> dict keyed by top-level field name (ROS1)."""
    return _compile(schema, cdr=False)


def compile_cdr_row_decoder(schema: MsgSchema):
    """ROS2 variant: XCDR1 little-endian CDR, the wire format of ros2msg
    payloads in MCAP.  Beyond-reference: the reference parses ros2msg
    schema TEXT (util/ros2msg/transform.go) but implements a payload
    Decoder only for ros1 (util/ros1msg/parser.go) — here both wire
    formats decode through the same compiled-decoder machinery."""
    return _compile(schema, cdr=True)


# ==================================================== vectorized decoder

_NP_FMT = {
    "int8": "<i1",
    "uint8": "<u1",
    "char": "<u1",
    "byte": "<u1",
    "int16": "<i2",
    "uint16": "<u2",
    "int32": "<i4",
    "uint32": "<u4",
    "int64": "<i8",
    "uint64": "<u8",
    "float32": "<f4",
    "float64": "<f8",
    "bool": "<u1",
    "time": [("sec", "<u4"), ("nsec", "<u4")],
    "duration": [("sec", "<u4"), ("nsec", "<u4")],
}


def _np_dtype(t: MsgType):
    """numpy structured-dtype spec mirroring the wire layout, or None if the
    type has variable-length content (string / varlen array)."""
    if t.is_primitive:
        if t.primitive in ("string", "wstring"):
            return None
        return _NP_FMT[t.primitive]
    if t.array:
        if t.fixed_size == 0:
            return None
        if t.items.is_primitive and t.items.primitive in _BYTEISH and not (
            0 < t.fixed_size < 10
        ):
            return None  # binary blob: rare; row decoder handles it
        inner = _np_dtype(t.items)
        if inner is None:
            return None
        return (inner, (t.fixed_size,))
    if t.record:
        fields = []
        for f in t.fields:
            sub = _np_dtype(f.type)
            if sub is None:
                return None
            fields.append((f.name, sub))
        return fields
    return None


def schema_np_dtype(schema: MsgSchema) -> np.dtype | None:
    """Whole-message structured dtype when every field is fixed-width."""
    fields = []
    for f in schema.fields:
        sub = _np_dtype(f.type)
        if sub is None:
            return None
        fields.append((f.name, sub))
    try:
        return np.dtype(fields)
    except (TypeError, ValueError):  # pragma: no cover
        return None


_NP_SIZE = {
    "int8": 1, "uint8": 1, "char": 1, "byte": 1, "bool": 1,
    "int16": 2, "uint16": 2,
    "int32": 4, "uint32": 4, "float32": 4,
    "int64": 8, "uint64": 8, "float64": 8,
}


def _cdr_layout(t: MsgType, off: int):
    """(dtype-like, aligned start, end) for fixed-width types under CDR
    alignment rules, or None for varlen content / arrays of records (the
    row decoder handles those)."""
    if t.is_primitive:
        p = t.primitive
        if p in ("string", "wstring"):
            return None
        if p in ("time", "duration"):
            off += (-off) % 4
            return np.dtype([("sec", "<u4"), ("nsec", "<u4")]), off, off + 8
        size = _NP_SIZE[p]
        off += (-off) % size
        return np.dtype(_NP_FMT[p]), off, off + size
    if t.array:
        n = t.fixed_size
        if n == 0:
            return None
        if t.items.is_primitive and t.items.primitive in _BYTEISH and not (0 < n < 10):
            return None  # binary blob: row decoder
        if t.items.is_primitive:
            p = t.items.primitive
            if p in ("string", "wstring"):
                return None
            if p in ("time", "duration"):
                inner, align, size = np.dtype([("sec", "<u4"), ("nsec", "<u4")]), 4, 8
            else:
                inner, align, size = np.dtype(_NP_FMT[p]), _NP_SIZE[p], _NP_SIZE[p]
            # packed once the first element is aligned (stride == size for
            # every CDR primitive incl. the 8-byte 4-aligned time pair)
            off += (-off) % align
            return np.dtype((inner, (n,))), off, off + n * size
        return None  # arrays of records: per-element realignment
    if t.record:
        names, formats, offsets = [], [], []
        cur = off
        for f in t.fields:
            sub = _cdr_layout(f.type, cur)
            if sub is None:
                return None
            fmt, fstart, fend = sub
            names.append(f.name)
            formats.append(fmt)
            offsets.append(fstart - off)
            cur = fend
        spec = np.dtype(
            {"names": names, "formats": formats, "offsets": offsets, "itemsize": cur - off}
        )
        return spec, off, cur
    return None


def cdr_np_dtype(schema: MsgSchema) -> np.dtype | None:
    """Whole-message structured dtype for fixed-width CDR payloads: explicit
    field offsets encode the alignment padding, and the 4-byte encapsulation
    header is skipped by shifting every top-level offset."""
    names, formats, offsets = [], [], []
    cur = 0
    for f in schema.fields:
        sub = _cdr_layout(f.type, cur)
        if sub is None:
            return None
        fmt, fstart, fend = sub
        names.append(f.name)
        formats.append(fmt)
        offsets.append(4 + fstart)
        cur = fend
    try:
        return np.dtype(
            {"names": names, "formats": formats, "offsets": offsets, "itemsize": 4 + cur}
        )
    except (TypeError, ValueError):  # pragma: no cover
        return None


def _np_leaf_to_arrow(t: MsgType, arr: np.ndarray) -> pa.Array:
    prim = t.primitive
    if prim in ("time", "duration"):
        vals = arr["sec"].astype(np.int64) * 1_000_000_000 + arr["nsec"].astype(
            np.int64
        )
        return pa.array(vals, pa.int64())
    if prim == "bool":
        return pa.array(arr != 0, pa.bool_())
    if prim == "uint64":
        if arr.size and int(arr.max()) > _I64_MAX:
            raise RosDecodeError("uint64 value overflows bigint")
        return pa.array(arr.astype(np.int64), pa.int64())
    target = {
        "int8": pa.int8(),
        "uint8": pa.int16(),
        "char": pa.int16(),
        "byte": pa.int16(),
        "int16": pa.int16(),
        "uint16": pa.int32(),
        "int32": pa.int32(),
        "uint32": pa.int64(),
        "int64": pa.int64(),
        "float32": pa.float32(),
        "float64": pa.float64(),
    }[prim]
    return pa.array(arr.astype(target.to_pandas_dtype()), target)


def _np_to_arrow(t: MsgType, arr: np.ndarray) -> pa.Array:
    """Assemble an Arrow array from a (possibly nested) numpy view.  Fully
    column-at-a-time: no per-row Python."""
    if t.is_primitive:
        return _np_leaf_to_arrow(t, np.ascontiguousarray(arr).reshape(-1))
    if t.array:
        n = t.fixed_size
        count = int(np.prod(arr.shape[:1])) if arr.ndim else 0
        flat = np.ascontiguousarray(arr).reshape(-1, *arr.shape[2:]) if arr.ndim > 1 else arr
        values = _np_to_arrow(t.items, flat)
        offsets = pa.array(np.arange(count + 1, dtype=np.int32) * n, pa.int32())
        return pa.ListArray.from_arrays(offsets, values)
    if t.record:
        children = [_np_to_arrow(f.type, arr[f.name]) for f in t.fields]
        return pa.StructArray.from_arrays(children, [f.name for f in t.fields])
    raise RosDecodeError(f"cannot vectorize type {t!r}")  # pragma: no cover


# ===================================================== arrow type mapping

_PRIM_ARROW = {
    "int8": pa.int8(),
    "uint8": pa.int16(),
    "char": pa.int16(),
    "byte": pa.int16(),
    "int16": pa.int16(),
    "uint16": pa.int32(),
    "int32": pa.int32(),
    "uint32": pa.int64(),
    "int64": pa.int64(),
    "uint64": pa.int64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "string": pa.string(),
    "wstring": pa.string(),
    "bool": pa.bool_(),
    "time": pa.int64(),
    "duration": pa.int64(),
}


def _arrow_type(t: MsgType) -> pa.DataType:
    if t.is_primitive:
        return _PRIM_ARROW[t.primitive]
    if t.array:
        if t.items.is_primitive and t.items.primitive in _BYTEISH and not (
            0 < t.fixed_size < 10
        ):
            return pa.binary()
        return pa.list_(_arrow_type(t.items))
    if t.record:
        return pa.struct([pa.field(f.name, _arrow_type(f.type)) for f in t.fields])
    raise RosDecodeError(f"cannot map type {t!r}")  # pragma: no cover


# ========================================================== DataFrame API

META_COLS = ("producer", "topic", "log_time", "sequence")


def _pad_dtype(dt: np.dtype, itemsize: int) -> np.dtype:
    """Same field layout, wider record (uniform trailing padding)."""
    if itemsize == dt.itemsize:
        return dt
    return np.dtype(
        {
            "names": list(dt.names),
            "formats": [dt.fields[n][0] for n in dt.names],
            "offsets": [dt.fields[n][1] for n in dt.names],
            "itemsize": itemsize,
        }
    )


def _decode_impl(
    df: DataFrame,
    schema: MsgSchema,
    *,
    cdr: bool,
    data_col: str,
    meta_cols: tuple[str, ...],
) -> DataFrame:
    payload_struct = spark_struct(schema)
    for f in payload_struct.fieldNames():
        if f in meta_cols or f == data_col:
            raise RosDecodeError(
                f"schema field {f!r} collides with a metadata column"
            )
    out_fields = [df.schema[c] for c in meta_cols]
    out_schema_ddl = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
        + ", "
        + ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in payload_struct.fields
        )
    )
    arrow_types = [(f.name, _arrow_type(f.type)) for f in schema.fields]
    vec_dtype = cdr_np_dtype(schema) if cdr else schema_np_dtype(schema)
    names = list(meta_cols) + [n for n, _ in arrow_types]
    msg_fields = list(schema.fields)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # compiled per executor: the generated decoder holds struct.Struct
        # objects, which don't pickle — the (picklable) MsgSchema ships
        # instead and compiles lazily once per task
        row_decode = None
        for b in batches:
            nrows = b.num_rows
            if nrows == 0:
                continue
            payloads = b.column(b.schema.get_field_index(data_col)).to_pylist()
            meta_arrays = [b.column(b.schema.get_field_index(c)) for c in meta_cols]
            use_vec = False
            blob = None
            if vec_dtype is not None:
                sizes = {len(p) for p in payloads}
                if cdr:
                    # CDR serializers may pad the tail (encapsulation options);
                    # a uniform size >= the layout vectorizes with a widened
                    # record, anything ragged falls back to the row decoder
                    use_vec = (
                        len(sizes) == 1 and next(iter(sizes)) >= vec_dtype.itemsize
                    )
                else:
                    blob = b"".join(payloads)
                    if len(blob) != nrows * vec_dtype.itemsize:
                        raise RosDecodeError(
                            f"fixed-width schema {schema.name}: payload bytes "
                            f"{len(blob)} != {nrows} rows * {vec_dtype.itemsize}"
                        )
                    use_vec = True
            if use_vec:
                if blob is None:
                    blob = b"".join(payloads)
                dt = _pad_dtype(vec_dtype, len(blob) // nrows)
                if cdr:
                    hdr = np.frombuffer(blob, np.uint8).reshape(nrows, dt.itemsize)
                    if not (hdr[:, 1] == 1).all():
                        raise RosDecodeError(
                            "unsupported CDR encapsulation (only XCDR1 "
                            "little-endian)"
                        )
                rec = np.frombuffer(blob, dtype=dt)
                cols = [_np_to_arrow(f.type, rec[f.name]) for f in msg_fields]
            else:
                if row_decode is None:
                    row_decode = _compile(schema, cdr=cdr)
                dicts = [row_decode(p) for p in payloads]
                cols = [
                    pa.array([d[name] for d in dicts], type=typ)
                    for name, typ in arrow_types
                ]
            yield pa.RecordBatch.from_arrays(meta_arrays + cols, names)

    return df.mapInArrow(fn, out_schema_ddl)


def decode_ros1(
    df: DataFrame,
    schema: MsgSchema,
    *,
    data_col: str = "data",
    meta_cols: tuple[str, ...] = META_COLS,
) -> DataFrame:
    """Decode the binary `data_col` of an imported-MCAP DataFrame into typed
    top-level columns per schema field (nested structs for records, arrays
    for array fields) — the analog of the reference's decode-on-read
    (executor/expression.go:141-152), but materialized once per scan and
    fully Arrow-batched.

    All rows MUST carry payloads of this schema (filter by schema_hash
    first; see `dp3_spark.sources.mcap.decode_tables`)."""
    return _decode_impl(df, schema, cdr=False, data_col=data_col, meta_cols=meta_cols)


def decode_ros2(
    df: DataFrame,
    schema: MsgSchema,
    *,
    data_col: str = "data",
    meta_cols: tuple[str, ...] = META_COLS,
) -> DataFrame:
    """ROS2 variant of `decode_ros1` for CDR (XCDR1 little-endian) payloads
    — the wire format of `ros2msg`-schema messages in MCAP.  Fixed-width
    schemas take the numpy path via an offset-explicit dtype that encodes
    the alignment padding (`cdr_np_dtype`); everything else runs the
    compiled row decoder.  Beyond-reference: the reference parses ros2msg
    schema text but decodes payloads only for ros1 (util/ros2msg/
    transform.go vs util/ros1msg/parser.go)."""
    return _decode_impl(df, schema, cdr=True, data_col=data_col, meta_cols=meta_cols)


# ============================================================== encoder

def ros1_encode(schema: MsgSchema, msg: dict) -> bytes:
    """Serialize a message dict into ROS1 wire format — the inverse of the
    decoders, used for tests and fixture generation."""
    out = bytearray()

    def enc(t: MsgType, v) -> None:
        if t.is_primitive:
            p = t.primitive
            if p in ("string", "wstring"):
                b = v.encode("utf-8")
                out.extend(struct.pack("<I", len(b)))
                out.extend(b)
            elif p in ("time", "duration"):
                out.extend(struct.pack("<II", v // 1_000_000_000, v % 1_000_000_000))
            elif p == "bool":
                out.extend(struct.pack("<B", 1 if v else 0))
            else:
                out.extend(struct.pack("<" + _FMT[p], v))
            return
        if t.array:
            if isinstance(v, (bytes, bytearray)):
                if t.fixed_size:
                    if len(v) != t.fixed_size:
                        raise RosDecodeError(
                            f"fixed array needs {t.fixed_size} bytes, got {len(v)}"
                        )
                else:
                    out.extend(struct.pack("<I", len(v)))
                out.extend(v)
                return
            if t.fixed_size:
                if len(v) != t.fixed_size:
                    raise RosDecodeError(
                        f"fixed array needs {t.fixed_size} items, got {len(v)}"
                    )
            else:
                out.extend(struct.pack("<I", len(v)))
            for item in v:
                enc(t.items, item)
            return
        if t.record:
            for f in t.fields:
                enc(f.type, v[f.name])
            return
        raise RosDecodeError(f"cannot encode type {t!r}")  # pragma: no cover

    for f in schema.fields:
        enc(f.type, msg[f.name])
    return bytes(out)


CDR_HEADER = b"\x00\x01\x00\x00"  # XCDR1 little-endian, no options


def cdr_encode(schema: MsgSchema, msg: dict) -> bytes:
    """Serialize a message dict into ROS2 CDR (XCDR1 little-endian) wire
    format — inverse of `compile_cdr_row_decoder`, used for tests and
    fixture generation.  Alignment is relative to the post-encapsulation
    payload start; strings carry a counted trailing NUL."""
    out = bytearray()

    def align(n: int) -> None:
        out.extend(b"\x00" * ((-len(out)) % n))

    def enc(t: MsgType, v) -> None:
        if t.is_primitive:
            p = t.primitive
            if p == "wstring":
                raise RosDecodeError("wstring is not supported in CDR payloads")
            if p == "string":
                b = v.encode("utf-8") + b"\x00"
                align(4)
                out.extend(struct.pack("<I", len(b)))
                out.extend(b)
            elif p in ("time", "duration"):
                align(4)
                out.extend(struct.pack("<II", v // 1_000_000_000, v % 1_000_000_000))
            elif p == "bool":
                out.append(1 if v else 0)
            else:
                align(_PRIM_BYTES[p])
                out.extend(struct.pack("<" + _FMT[p], v))
            return
        if t.array:
            if isinstance(v, (bytes, bytearray)):
                if t.fixed_size:
                    if len(v) != t.fixed_size:
                        raise RosDecodeError(
                            f"fixed array needs {t.fixed_size} bytes, got {len(v)}"
                        )
                else:
                    align(4)
                    out.extend(struct.pack("<I", len(v)))
                out.extend(v)
                return
            if t.fixed_size:
                if len(v) != t.fixed_size:
                    raise RosDecodeError(
                        f"fixed array needs {t.fixed_size} items, got {len(v)}"
                    )
            else:
                align(4)
                out.extend(struct.pack("<I", len(v)))
            for item in v:
                enc(t.items, item)
            return
        if t.record:
            for f in t.fields:
                enc(f.type, v[f.name])
            return
        raise RosDecodeError(f"cannot encode type {t!r}")  # pragma: no cover

    for f in schema.fields:
        enc(f.type, msg[f.name])
    return bytes(CDR_HEADER + out)
