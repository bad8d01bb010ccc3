"""Minimal pure-stdlib YUV4MPEG2 (.y4m) video codec — no libav needed.

Completes the multimodal tier's codec coverage (VERDICT r4 order #5):
PNG (functions/png.py) and WAV gave image/audio REAL decode paths in
this offline container; Y4M does the same for video.  YUV4MPEG2 is the
uncompressed interchange format every ffmpeg/mjpegtools pipeline can
emit (`ffmpeg -i in.mp4 out.y4m`): a one-line ASCII stream header,
then per frame a `FRAME` marker line followed by raw planar YUV bytes.
No entropy coding, no inter-frame prediction — pure parsing, which is
exactly what the stdlib can do and a compressed codec (H.264/VP9)
cannot without native libraries (that blocker stays documented).

Supported: 8-bit planar C420 family (420jpeg / 420mpeg2 / 420paldv —
identical byte layout, different chroma siting we don't resample),
C422, C444, and Cmono.  Interlacing tokens other than progressive,
rare extensions (Cxxx p10/p12 bit depths), or malformed streams raise
``Y4mError`` so callers fall back explicitly (never silently wrong).

This is a per-row kernel invoked inside Arrow-batched ``mapInPandas``
(operators/multimodal.py); nothing here touches Spark.

Format reference: the yuv4mpeg(5) man page (mjpegtools), public.
"""

from __future__ import annotations

MAX_PIXELS = 64_000_000  # per frame, pre-allocation guard
MAX_FRAMES = 100_000

_MAGIC = b"YUV4MPEG2"

#: chroma token -> (x_subsample, y_subsample) of the U/V planes;
#: None = no chroma planes at all
_CHROMA = {
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "420": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
    "mono": None,
}


class Y4mError(ValueError):
    pass


def encode_y4m(y_frames, *, chroma: str = "420jpeg", fps=(25, 1),
               uv_fill: int = 128) -> bytes:
    """Encode a numpy uint8 array shaped (n_frames, h, w) of luma
    planes as a YUV4MPEG2 stream.  Chroma planes (for non-mono
    colorspaces) are filled with the constant ``uv_fill`` — gray; the
    library is a FORMAT codec, not a color pipeline, and the planted
    patterns the tests decode live in the luma plane."""
    import numpy as np

    a = np.asarray(y_frames, dtype=np.uint8)
    if a.ndim != 3:
        raise Y4mError(f"need (n_frames, h, w) luma array, got {a.shape}")
    n, h, w = a.shape
    if chroma not in _CHROMA:
        raise Y4mError(f"unsupported chroma {chroma!r}")
    sub = _CHROMA[chroma]
    if sub is not None and (w % sub[0] or h % sub[1]):
        raise Y4mError(
            f"C{chroma} needs dimensions divisible by {sub}; got {w}x{h}"
        )
    out = bytearray()
    out += b"%s W%d H%d F%d:%d Ip A1:1 C%s\n" % (
        _MAGIC, w, h, int(fps[0]), int(fps[1]), chroma.encode()
    )
    if sub is None:
        uv = b""
    else:
        cw, ch_ = w // sub[0], h // sub[1]
        uv = bytes([uv_fill & 0xFF]) * (cw * ch_) * 2
    for i in range(n):
        out += b"FRAME\n"
        out += a[i].tobytes()
        out += uv
    return bytes(out)


def _parse_header(line: bytes):
    parts = line.split(b" ")
    if parts[0] != _MAGIC:
        raise Y4mError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (0, 1)
    chroma = "420jpeg"  # spec default when no C token present
    for tok in parts[1:]:
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        try:
            if tag == b"W":
                w = int(val)
            elif tag == b"H":
                h = int(val)
            elif tag == b"F":
                num, den = val.split(b":")
                fps = (int(num), int(den))
            elif tag == b"C":
                chroma = val.decode("ascii")
            elif tag == b"I":
                if val not in (b"p", b"?"):
                    raise Y4mError(f"interlaced stream (I{val!r})")
            elif tag in (b"A", b"X"):
                pass  # aspect ratio / comment: ignored
            else:
                raise Y4mError(f"unknown header token {tok!r}")
        except (ValueError, UnicodeDecodeError) as e:
            if isinstance(e, Y4mError):
                raise
            raise Y4mError(f"bad header token {tok!r}") from e
    if not w or not h or w < 0 or h < 0:
        raise Y4mError("missing/invalid W or H")
    if chroma not in _CHROMA:
        raise Y4mError(f"unsupported chroma C{chroma}")
    sub = _CHROMA[chroma]
    if sub is not None and (w % sub[0] or h % sub[1]):
        raise Y4mError(f"C{chroma} needs even dimensions; got {w}x{h}")
    if w * h > MAX_PIXELS:
        raise Y4mError(f"frame {w}x{h} exceeds MAX_PIXELS")
    return w, h, fps, chroma


def decode_y4m(buf: bytes, *, max_frames: int = MAX_FRAMES):
    """Decode a YUV4MPEG2 stream.

    Returns ``(info, frames)`` where ``info`` is a dict with ``width,
    height, fps_num, fps_den, chroma, n_frames`` and ``frames`` is a
    list of dicts ``{"y": (h, w) uint8 array, "u": ..., "v": ...}``
    (``u``/``v`` are ``None`` for mono).  Raises :class:`Y4mError` on
    anything malformed — truncated planes, bad markers, unknown
    colorspaces."""
    import numpy as np

    buf = bytes(buf)
    nl = buf.find(b"\n")
    if nl < 0:
        raise Y4mError("no stream header line")
    w, h, fps, chroma = _parse_header(buf[:nl])
    sub = _CHROMA[chroma]
    ysz = w * h
    if sub is None:
        cw = ch_ = csz = 0
    else:
        cw, ch_ = w // sub[0], h // sub[1]
        csz = cw * ch_
    fsz = ysz + 2 * csz

    frames = []
    pos = nl + 1
    while pos < len(buf):
        if len(frames) >= max_frames:
            raise Y4mError(f"more than {max_frames} frames")
        fnl = buf.find(b"\n", pos)
        if fnl < 0:
            raise Y4mError("truncated FRAME marker")
        marker = buf[pos:fnl]
        if marker != b"FRAME" and not marker.startswith(b"FRAME "):
            raise Y4mError(f"bad FRAME marker {marker[:20]!r}")
        data = buf[fnl + 1:fnl + 1 + fsz]
        if len(data) != fsz:
            raise Y4mError(
                f"truncated frame {len(frames)}: {len(data)} of {fsz} bytes"
            )
        y = np.frombuffer(data, dtype=np.uint8, count=ysz).reshape(h, w)
        if sub is None:
            u = v = None
        else:
            u = np.frombuffer(
                data, dtype=np.uint8, count=csz, offset=ysz
            ).reshape(ch_, cw)
            v = np.frombuffer(
                data, dtype=np.uint8, count=csz, offset=ysz + csz
            ).reshape(ch_, cw)
        frames.append({"y": y, "u": u, "v": v})
        pos = fnl + 1 + fsz

    info = {
        "width": w, "height": h, "fps_num": fps[0], "fps_den": fps[1],
        "chroma": chroma, "n_frames": len(frames),
    }
    return info, frames
