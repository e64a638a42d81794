"""Progressive (SOF2) JPEG round-trips.

The progressive encoder reuses the baseline quantization chain, so a
correct progressive decode is PIXEL-IDENTICAL to decoding the baseline
encoding of the same image — the strongest possible oracle without a
reference codec in the container.  The default scan script covers
interleaved DC with successive approximation, spectral-selection bands,
two-stage AC refinement, EOB runs, and correction bits; further cases
pin restart markers, deep SA chains, and fuzz totality.
"""

import numpy as np
import pytest

from dp3_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _cases():
    rng = np.random.default_rng(7)
    return {
        "noise": rng.integers(0, 256, (24, 17, 3), dtype=np.uint8),
        "solid": np.full((16, 16, 3), 137, dtype=np.uint8),
        "gradient": (
            np.arange(32)[:, None, None] * 3
            + np.arange(40)[None, :, None] * 2
            + np.arange(3) * 10
        ).astype(np.uint8),
        "smooth": (
            128 + 60 * np.sin(np.arange(64) / 9.0)[:, None, None] * np.ones((64, 64, 3))
        ).astype(np.uint8),
        "noise_big": rng.integers(0, 256, (56, 72, 3), dtype=np.uint8),
    }


# every later stage steps Al down by exactly 1 from the previous scan's Al
_DEEP_SA = [
    ((0, 1, 2), 0, 0, 0, 3), ((0, 1, 2), 0, 0, 3, 2),
    ((0, 1, 2), 0, 0, 2, 1), ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 63, 0, 3), ((0,), 1, 63, 3, 2),
    ((0,), 1, 63, 2, 1), ((0,), 1, 63, 1, 0),
    ((1,), 1, 63, 0, 2), ((1,), 1, 63, 2, 1), ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 0, 1), ((2,), 1, 63, 1, 0),
]
_NO_SA = [
    ((0, 1, 2), 0, 0, 0, 0),
    ((0,), 1, 63, 0, 0), ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0),
]
_BANDS = [
    ((0, 1, 2), 0, 0, 0, 0),
    ((0,), 1, 2, 0, 0), ((0,), 3, 10, 0, 0), ((0,), 11, 63, 0, 0),
    ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0),
]


@pytest.mark.parametrize("name", sorted(_cases()))
def test_progressive_default_script_matches_baseline(name):
    img = _cases()[name]
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert prog is not None
    assert np.array_equal(base, prog)


@pytest.mark.parametrize("script", [_NO_SA, _BANDS, _DEEP_SA],
                         ids=["no-sa", "bands", "deep-sa"])
@pytest.mark.parametrize("name", ["noise", "smooth"])
def test_progressive_scan_scripts(name, script):
    img = _cases()[name]
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img, scans=script))
    assert prog is not None
    assert np.array_equal(base, prog)


@pytest.mark.parametrize("ri", [1, 2, 5])
def test_progressive_restart_intervals(ri):
    img = _cases()["noise"]
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img, restart_interval=ri))
    assert prog is not None
    assert np.array_equal(base, prog)


def test_progressive_decode_total_on_corruption():
    """decode_jpeg never raises on mangled progressive streams — returns
    an image or None (the mapInPandas decode kernels rely on totality)."""
    img = _cases()["noise"]
    data = bytearray(encode_jpeg_progressive(img))
    rng = np.random.default_rng(3)
    for _ in range(40):
        mangled = bytearray(data)
        for _ in range(rng.integers(1, 6)):
            mangled[rng.integers(2, len(mangled))] = rng.integers(0, 256)
        out = decode_jpeg(bytes(mangled))
        assert out is None or (
            isinstance(out, np.ndarray) and out.dtype == np.uint8
        )
    # truncations
    for cut in (4, 20, len(data) // 2, len(data) - 1):
        out = decode_jpeg(bytes(data[:cut]))
        assert out is None or isinstance(out, np.ndarray)


def test_arithmetic_and_lossless_still_refuse():
    img = _cases()["solid"]
    data = bytearray(encode_jpeg_progressive(img))
    i = bytes(data).find(b"\xff\xc2")
    assert i > 0
    for sof in (0xC3, 0xC9, 0xCA, 0xCB):  # lossless / arithmetic variants
        d = bytearray(data)
        d[i + 1] = sof
        assert decode_jpeg(bytes(d)) is None
