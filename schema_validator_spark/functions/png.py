"""Minimal pure-stdlib PNG codec (zlib + struct — no Pillow needed).

Exists so the multimodal decode path is REAL in this container: the
sandbox has no codec libraries and no network, but PNG's format is just
zlib-compressed filtered scanlines, which the standard library decodes.
Supports 8-bit grayscale (color type 0), RGB (2) and RGBA (6), all five
scanline filters, non-interlaced — the subset every real-world encoder
emits by default.  Anything else raises ``PngError`` so callers fall
back explicitly (never silently wrong).

This is a per-row kernel invoked inside Arrow-batched ``mapInPandas``
(operators/multimodal.py); nothing here touches Spark.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


class PngError(ValueError):
    pass


def encode_png(pixels, color_type: int | None = None) -> bytes:
    """Encode a numpy uint8 array — (h, w) grayscale, (h, w, 3) RGB or
    (h, w, 4) RGBA — as a non-interlaced filter-0 PNG."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        h, w, ch = a.shape[0], a.shape[1], 1
        ct = 0
    elif a.ndim == 3 and a.shape[2] in (3, 4):
        h, w, ch = a.shape
        ct = 2 if ch == 3 else 6
    else:
        raise PngError(f"unsupported pixel shape {a.shape}")
    if color_type is not None and color_type != ct:
        raise PngError(f"shape implies color type {ct}, requested {color_type}")

    raw = bytearray()
    flat = a.reshape(h, w * ch)
    for y in range(h):
        raw.append(0)  # filter type 0 (None)
        raw.extend(flat[y].tobytes())

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Refuse to materialize images beyond this many pixels: a forged IHDR
# (or a deliberate decompression bomb) must fail with PngError in the
# mapInPandas worker, never an uncatchable MemoryError/OOM-kill.
MAX_PIXELS = 64_000_000


def decode_png(buf: bytes, *, max_pixels: int = MAX_PIXELS):
    """Decode PNG bytes → (width, height, channels, pixels) where pixels
    is a uint8 numpy array of shape (h, w, channels).

    Every malformed-input path raises :class:`PngError` (callers rely on
    that to fall back per payload); decompression is bounded by the
    declared dimensions, so a zip-bomb IDAT cannot balloon memory."""
    import numpy as np

    if not buf.startswith(_SIG):
        raise PngError("not a PNG (bad signature)")
    pos = len(_SIG)
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos:pos + 4])
        tag = buf[pos + 4:pos + 8]
        body = buf[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise PngError("truncated chunk")
        if tag == b"IHDR":
            if length != 13:
                raise PngError(f"bad IHDR length {length}")
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise PngError("missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise PngError(
            f"unsupported PNG variant (depth={bit_depth}, "
            f"color={color_type}, interlace={interlace})"
        )
    if width == 0 or height == 0 or width * height > max_pixels:
        raise PngError(f"refusing dimensions {width}x{height} "
                       f"(max_pixels={max_pixels})")
    ch = _CHANNELS[color_type]
    stride = width * ch
    expected = height * (stride + 1)
    try:
        # bounded inflate: never produce more than the dims call for
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as e:
        raise PngError(f"bad IDAT stream: {e}") from None
    if len(raw) != expected or not (d.eof or d.decompress(b"", 1) == b""):
        raise PngError("IDAT length does not match dimensions")

    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    off = 0
    for y in range(height):
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        off += stride + 1
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (line[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                line[x] = (line[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise PngError(f"unknown filter type {ftype}")
        out[y] = line
        prev = out[y]
    return width, height, ch, out.reshape(height, width, ch)


def resize_nearest(pixels, new_w: int, new_h: int):
    """Nearest-neighbor resize of a (h, w, ch) uint8 array."""
    import numpy as np

    a = np.asarray(pixels)
    h, w = a.shape[0], a.shape[1]
    ys = (np.arange(new_h) * h // new_h).clip(0, h - 1)
    xs = (np.arange(new_w) * w // new_w).clip(0, w - 1)
    return a[ys][:, xs]
