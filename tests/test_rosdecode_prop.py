"""Property-based round-trip fuzz for the ROS1 / CDR payload codecs.

Random schema trees (primitives, fixed/varlen arrays, nested records) are
rendered to real concatenated .msg text, parsed by the production parser,
and random matching messages are pushed through encode -> compiled decode
for BOTH wire formats; fixed-width schemas additionally check the
vectorized numpy path against the row decoder. This is the adversarial
counterpart of the hand-written matrices in test_rosdecode.py — the CDR
alignment codegen (static pad folding vs runtime realignment) is exactly
the kind of state machine a fuzzer breaks."""

import numpy as np
from hypothesis import given, settings, strategies as st

from dp3_spark.sources.msgdef import parse_ros1msg
from dp3_spark.sources.rosdecode import (
    _np_to_arrow,
    cdr_encode,
    cdr_np_dtype,
    compile_cdr_row_decoder,
    compile_row_decoder,
    ros1_encode,
    schema_np_dtype,
)

_I64_MAX = (1 << 63) - 1

_INT_BOUNDS = {
    "int8": (-128, 127),
    "uint8": (0, 255),
    "char": (0, 255),
    "byte": (0, 255),
    "int16": (-(1 << 15), (1 << 15) - 1),
    "uint16": (0, (1 << 16) - 1),
    "int32": (-(1 << 31), (1 << 31) - 1),
    "uint32": (0, (1 << 32) - 1),
    "int64": (-(1 << 63), _I64_MAX),
    # decoder raises above _I64_MAX by design (bigint target)
    "uint64": (0, _I64_MAX),
}

_PRIMS = sorted(_INT_BOUNDS) + ["bool", "float32", "float64", "string", "time", "duration"]
_BYTEISH = ("uint8", "char", "byte")

# ------------------------------------------------------------ schema gen
# spec: ("prim", name) | ("array", n, spec) | ("record", [(fname, spec)..])

_prim_spec = st.sampled_from(_PRIMS).map(lambda p: ("prim", p))
_arr_item = st.sampled_from([p for p in _PRIMS])


def _array_spec(item_spec):
    return st.tuples(st.integers(min_value=0, max_value=11), item_spec).map(
        lambda t: ("array", t[0], t[1])
    )


_spec = st.recursive(
    _prim_spec,
    lambda children: st.one_of(
        _array_spec(children.filter(lambda s: s[0] != "array")),
        st.lists(children, min_size=1, max_size=4).map(
            lambda fs: ("record", [(f"f{i}", s) for i, s in enumerate(fs)])
        ),
    ),
    max_leaves=10,
)

_schema_spec = st.lists(_spec, min_size=1, max_size=6).map(
    lambda fs: ("record", [(f"t{i}", s) for i, s in enumerate(fs)])
)


def _render(spec) -> str:
    """Concatenated .msg text for a top-level record spec."""
    subs: list[tuple[str, str]] = []
    counter = iter(range(1_000_000))

    def typename(s) -> str:
        kind = s[0]
        if kind == "prim":
            return s[1]
        if kind == "array":
            n, item = s[1], s[2]
            return typename(item) + (f"[{n}]" if n else "[]")
        name = f"R{next(counter)}"
        subs.append((name, body(s)))
        return "test/" + name

    def body(rec) -> str:
        return "".join(f"{typename(s)} {fname}\n" for fname, s in rec[1])

    top = body(spec)
    out = top
    for name, text in subs:
        out += "=" * 80 + f"\nMSG: test/{name}\n" + text
    return out


# ------------------------------------------------------------- value gen

_F32 = st.floats(allow_nan=False, width=32)
_F64 = st.floats(allow_nan=False, width=64)
_TXT = st.text(max_size=6)


def _prim_value(p: str):
    if p == "bool":
        return st.booleans()
    if p == "float32":
        return _F32
    if p == "float64":
        return _F64
    if p in ("string", "wstring"):
        return _TXT
    if p in ("time", "duration"):
        return st.tuples(
            st.integers(0, (1 << 32) - 1), st.integers(0, 999_999_999)
        ).map(lambda t: t[0] * 1_000_000_000 + t[1])
    lo, hi = _INT_BOUNDS[p]
    return st.integers(lo, hi)


def _value(spec):
    kind = spec[0]
    if kind == "prim":
        return _prim_value(spec[1])
    if kind == "array":
        n, item = spec[1], spec[2]
        if item[0] == "prim" and item[1] in _BYTEISH and not (0 < n < 10):
            # decodes as a binary blob
            return (
                st.binary(min_size=n, max_size=n)
                if n
                else st.binary(max_size=8)
            )
        inner = _value(item)
        if n:
            return st.lists(inner, min_size=n, max_size=n)
        return st.lists(inner, max_size=4)
    return st.fixed_dictionaries({fname: _value(s) for fname, s in spec[1]})


_spec_and_msgs = _schema_spec.flatmap(
    lambda spec: st.tuples(
        st.just(spec), st.lists(_value(spec), min_size=1, max_size=3)
    )
)


@settings(max_examples=60, deadline=None)
@given(_spec_and_msgs)
def test_roundtrip_both_wire_formats(spec_msgs):
    spec, msgs = spec_msgs
    schema = parse_ros1msg("test", "Fuzz", _render(spec))

    dec1 = compile_row_decoder(schema)
    dec2 = compile_cdr_row_decoder(schema)
    for m in msgs:
        assert dec1(ros1_encode(schema, m)) == m
        assert dec2(cdr_encode(schema, m)) == m

    # vectorized paths agree with the row decoders bit-for-bit
    for dtype_of, encode in (
        (schema_np_dtype, ros1_encode),
        (cdr_np_dtype, cdr_encode),
    ):
        dt = dtype_of(schema)
        if dt is None:
            continue
        bufs = [encode(schema, m) for m in msgs]
        assert all(len(b) == dt.itemsize for b in bufs), (
            "vectorized layout disagrees with the encoder: "
            f"{[len(b) for b in bufs]} != {dt.itemsize}"
        )
        rec = np.frombuffer(b"".join(bufs), dtype=dt)
        for f in schema.fields:
            got = _np_to_arrow(f.type, rec[f.name]).to_pylist()
            assert got == [m[f.name] for m in msgs]


def test_recursive_definition_errors_cleanly():
    import pytest

    from dp3_spark.sources.msgdef import MsgDefError

    REC = (
        "test/Loop a\n"
        + "=" * 80
        + "\nMSG: test/Loop\ntest/Loop inner\n"
    )
    with pytest.raises(MsgDefError, match="recursive"):
        parse_ros1msg("test", "M", REC)
