"""Property-based round-trip fuzz for the hand-rolled BMP codec
(tinymr_spark/tinybmp.py) — same differential strategy as the Avro
codec's fuzz: decode(encode(x)) must equal x for ANY generated image.
Covers the row-padding edges (widths where width*3 % 4 takes every
value), 1-pixel images, the top-down negative-height variant, and the
loud-failure contract on malformed payloads."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tinymr_spark.tinybmp import BmpError, decode_bmp, encode_bmp, iter_bmp_stream


@st.composite
def images(draw):
    w = draw(st.integers(min_value=1, max_value=40))
    h = draw(st.integers(min_value=1, max_value=24))
    seed = draw(st.integers(min_value=0, max_value=2**32 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@settings(max_examples=120, deadline=None)
@given(images())
def test_round_trip(img):
    w, h, out = decode_bmp(encode_bmp(img))
    assert (w, h) == (img.shape[1], img.shape[0])
    assert np.array_equal(out, img)


def test_padding_every_width_mod():
    # widths 1..8 hit every (width*3 % 4) padding residue twice
    for w in range(1, 9):
        img = (np.arange(2 * w * 3, dtype=np.int64) % 256).astype(np.uint8).reshape(2, w, 3)
        _, _, out = decode_bmp(encode_bmp(img))
        assert np.array_equal(out, img)


def test_top_down_negative_height():
    img = (np.arange(3 * 5 * 3) % 256).astype(np.uint8).reshape(3, 5, 3)
    payload = bytearray(encode_bmp(img))
    # flip the height sign and un-flip the stored rows: same logical image
    (h,) = struct.unpack_from("<i", payload, 22)
    struct.pack_into("<i", payload, 22, -h)
    stride = (5 * 3 + 3) // 4 * 4
    off = 54
    rows = [bytes(payload[off + i * stride : off + (i + 1) * stride]) for i in range(3)]
    payload[off : off + 3 * stride] = b"".join(reversed(rows))
    w, hh, out = decode_bmp(bytes(payload))
    assert (w, hh) == (5, 3)
    assert np.array_equal(out, img)


@pytest.mark.parametrize(
    "payload, msg",
    [
        (b"\x89PNG\r\n\x1a\n" + b"\x00" * 30, "magic"),
        (b"BM" + b"\x00" * 10, "truncated"),
        (encode_bmp(np.zeros((2, 2, 3), np.uint8))[:40], "truncated"),
    ],
)
def test_malformed_raises_loudly(payload, msg):
    with pytest.raises(BmpError, match=msg):
        decode_bmp(payload)


def test_unsupported_bpp_raises():
    payload = bytearray(encode_bmp(np.zeros((2, 2, 3), np.uint8)))
    struct.pack_into("<H", payload, 28, 8)  # claim 8-bit
    with pytest.raises(BmpError, match="bpp"):
        decode_bmp(bytes(payload))


def test_truncated_pixel_array_raises():
    payload = encode_bmp(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(BmpError, match="truncated|out of bounds"):
        decode_bmp(payload[:-5])


def test_spec_golden_vector():
    """A 2x1 BMP written out BY HAND from the format spec (not via
    encode_bmp) — left pixel red, right pixel blue, one padded row.
    Catches a self-consistent-but-wrong codec that round-trips its own
    output while disagreeing with the actual file format."""
    golden = bytes.fromhex(
        "424d"          # 'BM'
        "3e000000"      # file size = 54 + 8 = 62
        "0000" "0000"   # reserved
        "36000000"      # pixel offset = 54
        "28000000"      # DIB size = 40
        "02000000"      # width = 2
        "01000000"      # height = 1 (bottom-up)
        "0100"          # planes = 1
        "1800"          # bpp = 24
        "00000000"      # compression = BI_RGB
        "08000000"      # image size = 8 (one padded row)
        "130b0000" "130b0000"  # 2835 ppm
        "00000000" "00000000"  # palette
        "0000ff"        # left pixel, BGR = red
        "ff0000"        # right pixel, BGR = blue
        "0000"          # row padding to 4 bytes
    )
    assert len(golden) == 62
    w, h, rgb = decode_bmp(golden)
    assert (w, h) == (2, 1)
    assert rgb.tolist() == [[[255, 0, 0], [0, 0, 255]]]
    # and the encoder must reproduce the spec bytes for the same image
    assert encode_bmp(rgb) == golden


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200))
def test_garbage_bytes_never_escape_bmperror(data):
    """A real decoder's error surface is part of its contract: arbitrary
    bytes either decode or raise BmpError — struct.error / numpy
    exceptions leaking out would crash a mapInPandas worker with an
    undiagnosable traceback."""
    try:
        decode_bmp(data)
    except BmpError:
        pass


@settings(max_examples=100, deadline=None)
@given(images(), st.data())
def test_mutated_valid_bmps_never_escape_bmperror(img, data):
    payload = bytearray(encode_bmp(img))
    n_flips = data.draw(st.integers(min_value=1, max_value=8))
    for _ in range(n_flips):
        pos = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
        payload[pos] ^= data.draw(st.integers(min_value=1, max_value=255))
    try:
        decode_bmp(bytes(payload))
    except BmpError:
        pass


# ---------------------------------------------------------------------------
# iter_bmp_stream — the multi-frame container walk (q69's video payloads)
# ---------------------------------------------------------------------------
@settings(max_examples=60, deadline=None)
@given(st.lists(images(), min_size=0, max_size=5))
def test_stream_round_trip_recovers_every_frame(frames):
    stream = b"".join(encode_bmp(f) for f in frames)
    out = list(iter_bmp_stream(stream))
    assert len(out) == len(frames)
    for slice_, img in zip(out, frames):
        w, h, rgb = decode_bmp(slice_)
        assert (w, h) == (img.shape[1], img.shape[0])
        assert np.array_equal(rgb, img)


@pytest.mark.parametrize(
    "stream, msg",
    [
        # garbage where the second frame's header should be
        (encode_bmp(np.zeros((2, 2, 3), np.uint8)) + b"\x89PNG\r\n\x1a\n" + b"\x00" * 20, "magic"),
        # trailing bytes too short to be a header
        (encode_bmp(np.zeros((2, 2, 3), np.uint8)) + b"BM\x01", "trailing garbage"),
        # a size field that runs past the buffer
        (encode_bmp(np.zeros((2, 2, 3), np.uint8))[:-4], "overruns"),
    ],
)
def test_stream_malformed_raises_loudly(stream, msg):
    with pytest.raises(BmpError, match=msg):
        list(iter_bmp_stream(stream))


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_stream_garbage_never_escapes_bmperror(data):
    try:
        list(iter_bmp_stream(data))
    except BmpError:
        pass


@settings(max_examples=80, deadline=None)
@given(st.lists(images(), min_size=1, max_size=3), st.data())
def test_stream_mutated_never_escapes_bmperror(frames, data):
    """Bit-flipped multi-frame streams either walk+decode or raise
    BmpError — a corrupted size field must not desync into a raw
    struct/IndexError from a worker."""
    payload = bytearray(b"".join(encode_bmp(f) for f in frames))
    for _ in range(data.draw(st.integers(min_value=1, max_value=8))):
        pos = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
        payload[pos] ^= data.draw(st.integers(min_value=1, max_value=255))
    try:
        for frame in iter_bmp_stream(bytes(payload)):
            decode_bmp(frame)
    except BmpError:
        pass
