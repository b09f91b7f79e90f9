"""Minimal pure-Python/numpy BMP codec (24-bit uncompressed, BI_RGB).

The container ships no image libraries (Pillow absent for four straight
rounds), so the multimodal decode seam gets a real byte format the same
way Avro got one (sources/tinyavro.py): a from-scratch, spec-compliant
codec for the simplest widely-used raster format.  BMP v3
(BITMAPINFOHEADER) 24-bit uncompressed is fully specified by the
Windows GDI docs and is the canonical "no-codec-needed" interchange
format:

* 14-byte file header: ``BM`` magic, file size, pixel-array offset;
* 40-byte DIB header: width (int32), height (int32; negative means
  top-down row order), planes=1, bpp=24, compression=0 (BI_RGB);
* pixel array: rows BOTTOM-UP (for positive height), each pixel BGR,
  each row zero-padded to a 4-byte boundary.

``decode_bmp`` is the real decoder used inside ``mapInPandas`` workers
(operators/multimodal.py q61/q65/q68/q69); ``encode_bmp`` exists so the
pipeline can synthesize genuine BMP payloads deterministically from
table columns — which is what lets a DuckDB oracle hash-gate the whole
encode -> binary column -> decode -> pixel-math path end to end.
``iter_bmp_stream`` walks a concatenation of BMP files by their header
size fields — the multi-frame (video-like) container split q69 uses.

Scale note: both directions are a few numpy slice ops per image — no
per-pixel Python.  At 100 TB this code runs inside Arrow-batched
``mapInPandas`` workers, one image at a time off a binary column; the
codec itself allocates only the one frame it is decoding.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, pixel offset
_DIB_HEADER = struct.Struct("<IiiHHIIiiII")  # size, w, h, planes, bpp, comp, imgsize, xppm, yppm, colors, important

FILE_HEADER_SIZE = 14
DIB_HEADER_SIZE = 40


class BmpError(ValueError):
    """Raised on malformed or unsupported BMP payloads."""


def _row_stride(width: int) -> int:
    return (width * 3 + 3) // 4 * 4


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as a 24-bit BI_RGB BMP.

    Rows are written bottom-up with BGR channel order and 4-byte row
    padding, per the format spec — the details ``decode_bmp`` must undo
    exactly (and the position-weighted oracle checksum in q61 verifies
    it did).
    """
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise BmpError(f"expected (h, w, 3) RGB array, got shape {pixels.shape}")
    h, w, _ = pixels.shape
    if h <= 0 or w <= 0:
        raise BmpError(f"empty image {w}x{h}")
    stride = _row_stride(w)
    rows = np.zeros((h, stride), dtype=np.uint8)
    # RGB -> BGR, then flip vertically for the bottom-up file order.
    rows[:, : w * 3] = pixels.astype(np.uint8)[::-1, :, ::-1].reshape(h, w * 3)
    pixel_bytes = rows.tobytes()
    offset = FILE_HEADER_SIZE + DIB_HEADER_SIZE
    header = _FILE_HEADER.pack(b"BM", offset + len(pixel_bytes), 0, 0, offset)
    dib = _DIB_HEADER.pack(DIB_HEADER_SIZE, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    return header + dib + pixel_bytes


def iter_bmp_stream(payload: bytes):
    """Split a concatenation of BMP files into per-file byte slices by
    walking each file header's size field — the container walk a
    multi-frame (video-like) binary column needs (operators/multimodal.py
    q69 synthesizes per-document "videos" as concatenated BMP frames and
    this walker recovers the frame boundaries from the real headers).

    Yields one ``bytes`` slice per embedded file.  Raises
    :class:`BmpError` on bad magic mid-stream, a size field that
    overruns the buffer, or trailing garbage too short to be a header —
    the same single-typed loud-failure contract as :func:`decode_bmp`
    (a worker must never crash with a raw struct.error).
    """
    off, n = 0, len(payload)
    while off < n:
        if n - off < FILE_HEADER_SIZE:
            raise BmpError(f"trailing garbage at offset {off}: {n - off} bytes")
        magic, file_size, _r1, _r2, _pix = _FILE_HEADER.unpack_from(payload, off)
        if magic != b"BM":
            raise BmpError(f"bad magic at offset {off}: {magic!r}")
        if file_size < FILE_HEADER_SIZE or off + file_size > n:
            raise BmpError(
                f"frame at offset {off} overruns buffer "
                f"(size {file_size} of {n - off} remaining)"
            )
        yield payload[off : off + file_size]
        off += file_size


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a 24-bit uncompressed BMP to ``(width, height, rgb)``.

    ``rgb`` is an ``(h, w, 3)`` uint8 array in top-down RGB order
    regardless of the file's row direction (positive height = bottom-up
    per spec, negative = top-down).  Raises :class:`BmpError` on bad
    magic, truncation, or any unsupported variant (bpp != 24,
    compressed) — a real decoder fails loudly, it does not guess.
    """
    if len(payload) < FILE_HEADER_SIZE + 4:
        raise BmpError(f"truncated BMP: {len(payload)} bytes")
    magic, _file_size, _r1, _r2, pixel_offset = _FILE_HEADER.unpack_from(payload, 0)
    if magic != b"BM":
        raise BmpError(f"bad magic {magic!r}")
    (dib_size,) = struct.unpack_from("<I", payload, FILE_HEADER_SIZE)
    if dib_size < DIB_HEADER_SIZE:
        raise BmpError(f"unsupported DIB header size {dib_size}")
    if len(payload) < FILE_HEADER_SIZE + dib_size:
        raise BmpError("truncated DIB header")
    _, w, h_raw, planes, bpp, compression, *_ = _DIB_HEADER.unpack_from(payload, FILE_HEADER_SIZE)
    if planes != 1:
        raise BmpError(f"unsupported planes={planes}")
    if bpp != 24:
        raise BmpError(f"unsupported bpp={bpp} (only 24-bit is implemented)")
    if compression != 0:
        raise BmpError(f"unsupported compression={compression} (only BI_RGB)")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise BmpError(f"bad dimensions {w}x{h_raw}")
    stride = _row_stride(w)
    end = pixel_offset + stride * h
    if pixel_offset < FILE_HEADER_SIZE + dib_size or end > len(payload):
        raise BmpError(f"pixel array out of bounds ({pixel_offset}..{end} of {len(payload)})")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=pixel_offset)
    bgr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return w, h, np.ascontiguousarray(bgr[:, :, ::-1])
