"""Pure-stdlib PNG codec + the real multimodal decode/resize tiers."""

from __future__ import annotations

import numpy as np
import pytest

from schema_validator_spark.functions import png as PNG


def _gradient(h, w, ch=None):
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 7 + yy * 13) % 256).astype(np.uint8)
    if ch is None:
        return base
    return np.stack([(base + i * 40) % 256 for i in range(ch)], axis=2).astype(np.uint8)


def test_roundtrip_gray_rgb_rgba():
    for px in [_gradient(6, 9), _gradient(5, 4, 3), _gradient(3, 7, 4)]:
        buf = PNG.encode_png(px)
        w, h, ch, out = PNG.decode_png(buf)
        assert (w, h) == (px.shape[1], px.shape[0])
        expect = px.reshape(px.shape[0], px.shape[1], -1)
        assert ch == expect.shape[2]
        assert np.array_equal(out, expect)


def _forward_filter(px, ftype):
    """Apply a PNG scanline filter forward (what an encoder would emit)."""
    h, w = px.shape
    stride = w
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = px[y].astype(np.int32)
        f = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            left = line[x - 1] if x >= 1 else 0
            up = prev[x]
            ul = prev[x - 1] if x >= 1 else 0
            if ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:  # 4 Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            f[x] = (line[x] - pred) & 0xFF
        out.append(ftype)
        out.extend(bytes(f.astype(np.uint8)))
        prev = line
    return bytes(out)


def test_decode_all_filter_types():
    """The decoder must invert Sub/Up/Average/Paeth, not just filter 0."""
    import struct
    import zlib

    px = _gradient(5, 8)
    for ftype in (1, 2, 3, 4):
        raw = _forward_filter(px, ftype)

        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

        buf = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 5, 8, 0, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
        w, h, ch, out = PNG.decode_png(buf)
        assert np.array_equal(out.reshape(5, 8), px), f"filter {ftype}"


def test_decode_rejects_garbage():
    with pytest.raises(PNG.PngError):
        PNG.decode_png(b"\x89PNG\r\n\x1a\n" + b"junkjunkjunk")
    with pytest.raises(PNG.PngError):
        PNG.decode_png(b"not a png at all")


def test_extract_features_stdlib_png_tier(spark):
    """End-to-end: executor-generated REAL PNGs decode with real
    dimensions through the stdlib tier (no Pillow in this container)."""
    from schema_validator_spark.operators import multimodal as M

    media = M.synthetic_png_media(spark, 40)
    feats = M.extract_image_features(media)
    joined = {r["media_id"]: r for r in
              feats.join(media.select("media_id", "true_w", "true_h"),
                         "media_id").collect()}
    assert len(joined) == 40
    for r in joined.values():
        assert r["decoder"] in ("stdlib-png", "pil")
        assert r["width"] == r["true_w"] and r["height"] == r["true_h"]


def test_resize_images_real_path(spark):
    from schema_validator_spark.operators import multimodal as M

    media = M.synthetic_png_media(spark, 10)
    out = M.resize_images(media, 4, 4)
    rows = out.collect()
    assert all(r["resized"] for r in rows)
    for r in rows:
        w, h, ch, px = PNG.decode_png(bytes(r["payload"]))
        assert (w, h, ch) == (4, 4, 1)


def test_resize_passthrough_on_undecodable(spark):
    from schema_validator_spark.operators import multimodal as M

    media = M.synthetic_media(spark, 20)  # magic-byte fakes, not real PNGs
    out = M.resize_images(media, 4, 4)
    rows = out.collect()
    assert all(not r["resized"] for r in rows)
    assert all(r["width"] == -1 for r in rows)


def test_malformed_inputs_always_raise_pngerror():
    """Review regression: every malformed path must be PngError (the
    mapInPandas fallbacks catch exactly that), never struct/MemoryError."""
    import struct
    import zlib

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    # IHDR with wrong length (5 bytes) -> was struct.error
    with pytest.raises(PNG.PngError, match="IHDR length"):
        PNG.decode_png(sig + chunk(b"IHDR", b"12345"))
    # forged 4-billion-pixel dimensions -> bounded rejection, no allocation
    huge = struct.pack(">IIBBBBB", 0xFFFFFFF, 0xFFFFFFF, 8, 0, 0, 0, 0)
    with pytest.raises(PNG.PngError, match="refusing dimensions"):
        PNG.decode_png(sig + chunk(b"IHDR", huge) + chunk(b"IEND", b""))
    # decompression bomb: tiny IDAT inflating past the declared dims
    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 0, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * 100_000)
    with pytest.raises(PNG.PngError, match="does not match"):
        PNG.decode_png(sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bomb)
                       + chunk(b"IEND", b""))
