"""Minimal pure-Python PNG codec (public W3C PNG spec / RFC 2083).

Vendored so the multimodal decode path (operators/multimodal.py) can
run a REAL codec in environments without Pillow: only stdlib zlib +
struct. Scope is the baseline subset the pipeline needs:

  encode_png   8-bit greyscale / RGB / RGBA, filter type 0, one IDAT
  read_header  signature + IHDR parse -> (width, height, bit_depth,
               color_type) without touching pixel data (the metadata
               fast path decode_images uses)
  decode_png   full decode: zlib-inflate IDAT, reverse all five
               scanline filters (None/Sub/Up/Average/Paeth), return
               raw pixel bytes

No interlace (Adam7), no palette, no 16-bit — callers that need those
use a real imaging library; the Spark-side plumbing is identical.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color_type -> samples per pixel (baseline, non-palette)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed or unsupported PNG payload."""


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(width: int, height: int, pixels: bytes,
               color_type: int = 2, level: int = 1) -> bytes:
    """Encode raw pixel bytes (row-major, no padding) as a PNG.

    color_type: 0 grey (1 B/px), 2 RGB (3 B/px), 6 RGBA (4 B/px).
    level: zlib level; default 1 — for pipeline payloads encode
    throughput matters more than the last bytes of compression.
    """
    ch = _CHANNELS.get(color_type)
    if ch is None or color_type == 4:
        raise PngError(f"unsupported color_type {color_type}")
    if width <= 0 or height <= 0:
        raise PngError(f"bad dimensions {width}x{height}")
    stride = width * ch
    if len(pixels) != stride * height:
        raise PngError(f"pixel buffer is {len(pixels)} B, "
                       f"need {stride * height}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type 0 (None) per scanline
        raw += pixels[y * stride:(y + 1) * stride]
    return (_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
            + _chunk(b"IEND", b""))


def _iter_chunks(data: bytes):
    pos = len(_SIGNATURE)
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        if pos + 12 + length > n:
            # covers truncation inside the body AND inside the 4-byte
            # CRC field (a body-only check would accept a blob cut off
            # mid-CRC). CRC VALUES are deliberately not verified —
            # module-docstring scope choice — but structural
            # completeness is.
            raise PngError("truncated chunk")
        body = data[pos + 8:pos + 8 + length]
        yield tag, body
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IEND":
            return


def read_header(data: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from the IHDR chunk.
    O(1) in payload size — never inflates pixel data."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise PngError("payload is not bytes")
    data = bytes(data)
    if data[:8] != _SIGNATURE:
        raise PngError("bad PNG signature")
    for tag, body in _iter_chunks(data):
        if tag != b"IHDR":
            raise PngError("first chunk is not IHDR")
        if len(body) != 13:
            raise PngError("bad IHDR length")
        w, h, depth, color, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", body)
        if w == 0 or h == 0:
            raise PngError("zero dimension")
        if comp != 0 or filt != 0:
            raise PngError("unsupported compression/filter method")
        if interlace != 0:
            raise PngError("interlaced PNG not supported")
        return w, h, depth, color
    raise PngError("no IHDR chunk")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Full decode -> (width, height, channels, raw pixel bytes).
    Supports 8-bit grey/grey+alpha/RGB/RGBA, all five scanline
    filters, non-interlaced."""
    w, h, depth, color = read_header(data)
    if depth != 8:
        raise PngError(f"bit depth {depth} not supported")
    ch = _CHANNELS.get(color)
    if ch is None:
        raise PngError(f"color_type {color} not supported")
    idat = b"".join(body for tag, body in _iter_chunks(bytes(data))
                    if tag == b"IDAT")
    if not idat:
        raise PngError("no IDAT data")
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise PngError("inflated size mismatch")
    out = bytearray(stride * h)
    prev = bytearray(stride)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ftype == 1:    # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise PngError(f"unknown filter type {ftype}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return w, h, ch, bytes(out)
