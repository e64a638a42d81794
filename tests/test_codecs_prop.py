"""Property-based tests for the pure-python media codecs (PNG zlib+filter,
GIF LZW, BMP, WAV): encode/decode are exact inverses on arbitrary valid
inputs, and decoders never raise on corrupted bytes — corpus payloads are
untrusted, so total robustness is part of the operator contract.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dp3_spark.sources import multimodal as MM


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_random(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(MM.decode_png(MM.encode_png(img)), img)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ncol=st.integers(2, 256),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_random(h, w, ncol, seed):
    rng = np.random.default_rng(seed)
    pal = np.unique(
        rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8).view([("", np.uint8)] * 3)
    ).view(np.uint8).reshape(-1, 3)
    img = pal[rng.integers(0, len(pal), size=(h, w))]
    assert np.array_equal(MM.decode_gif(MM.encode_gif(img, palette=pal)), img)


@settings(max_examples=60, deadline=None)
@given(
    mcs=st.integers(2, 8),
    data=st.binary(min_size=0, max_size=4000),
)
def test_lzw_identity_random(mcs, data):
    # clamp symbols into the alphabet the code size permits
    idx = bytes(b % (1 << mcs) for b in data)
    out = MM._lzw_decode(MM._lzw_encode(idx, mcs), mcs, max(len(idx), 1))
    assert out == idx


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_total_and_bounded(h, w, seed):
    """JPEG is lossy, so the property is totality + boundedness: decode of
    encode always succeeds with the right shape, and for a SOLID frame the
    round-trip error is bounded by the DC quantizer chain (~12 levels)."""
    from dp3_spark.sources import jpeg as J

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    back = J.decode_jpeg(J.encode_jpeg(img))
    assert back is not None and back.shape == (h, w, 3)
    solid = np.full((h, w, 3), rng.integers(0, 256, 3), dtype=np.uint8)
    sback = J.decode_jpeg(J.encode_jpeg(solid))
    assert (sback == sback[0, 0]).all()
    assert int(np.abs(sback.astype(int) - solid.astype(int)).max()) <= 40


@settings(max_examples=60, deadline=None)
@given(
    which=st.sampled_from(["png", "gif", "bmp", "wav", "jpeg"]),
    cut=st.integers(0, 200),
    flips=st.lists(st.tuples(st.integers(0, 199), st.integers(0, 255)), max_size=4),
)
def test_decoders_total_on_corrupted_bytes(which, cut, flips):
    """Truncate and byte-flip valid files arbitrarily: decoders must
    return None or an array, never raise."""
    img = np.arange(6 * 5 * 3, dtype=np.uint8).reshape(6, 5, 3)
    pal = np.stack([np.arange(16) * 16] * 3, axis=1).astype(np.uint8)
    raw = {
        "png": MM.encode_png(img),
        "gif": MM.encode_gif(pal[np.arange(30).reshape(6, 5) % 16], palette=pal),
        "bmp": MM.encode_bmp(img),
        "wav": MM.encode_wav_pcm(np.arange(64, dtype=np.int16)),
        "jpeg": MM.encode_jpeg(img),
    }[which]
    b = bytearray(raw[: max(1, len(raw) - cut)])
    for pos, val in flips:
        if len(b):
            b[pos % len(b)] = val
    dec = {
        "png": MM.decode_png,
        "gif": MM.decode_gif,
        "bmp": MM.decode_bmp,
        "wav": MM.decode_wav_pcm,
        "jpeg": MM.decode_jpeg,
    }[which]
    out = dec(bytes(b))
    assert out is None or isinstance(out, np.ndarray)
