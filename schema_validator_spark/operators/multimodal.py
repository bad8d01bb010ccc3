"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The reference validates only scalar leaves (its closest analog is the
``image`` extension-whitelist rule, rule/other.go:74-82).  A training-data
pipeline additionally needs binary payload columns with typed metadata and
distributed decode / feature-extract / frame-sample stages.  This module
makes the Spark-side plumbing real — schema, partitioning, Arrow batch
shape, mapInPandas signatures — and the decode itself is real for PNG:
a pure-stdlib codec (functions/png.py, zlib+struct) decodes dimensions
and pixels with no external library.  Pillow is preferred when importable
(covers every format); payloads neither can decode fall back to the
clearly-marked deterministic byte-histogram features.

Scale notes: payloads stay opaque ``binary`` end-to-end (no base64 blowup);
mapInPandas streams Arrow batches so a 100 TB scan never materializes a
partition in one Python list; per-file metadata is a plain struct column so
filters on it (e.g. ``meta.format = 'png'``) prune before any Python runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # codec libs are optional in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover - not installed here
    HAVE_PIL = False


# ---------------------------------------------------------------- magic bytes
# Pure-SQL container-format sniffing over the first bytes of the payload —
# stays in whole-stage codegen, no Python.

_MAGIC = {
    "png": "89504E470D0A1A0A",
    "jpeg": "FFD8FF",
    "gif": "474946383",  # GIF87a / GIF89a
    "riff": "52494646",  # WAV/AVI container
    "pdf": "255044462D",
}


def sniff_format(payload):
    """Column: detected container format from magic bytes, else 'unknown'."""
    head = F.hex(F.substring(payload, 1, 8))
    out = F.lit("unknown")
    expr = None
    for name, magic in _MAGIC.items():
        cond = head.startswith(magic)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(out).alias("sniffed_format")


def payload_ok(payload, declared_format):
    """Boolean Column: magic bytes agree with the declared format — the
    binary-column analog of the reference's ``image`` extension rule."""
    return sniff_format(payload) == F.lower(F.coalesce(declared_format, F.lit("")))


# --------------------------------------------------------------- result types

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("decoder", T.StringType()),  # 'pil' | 'histogram-fallback'
        T.StructField("width", T.IntegerType()),   # -1 when not decodable
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def _histogram_features(buf: bytes, n_bins: int = 16) -> list[float]:
    """Deterministic fallback 'features': normalized byte histogram.
    Real computation (not random), so tests are exact; clearly NOT a
    semantic image embedding — the real path is Pillow + model features."""
    if not buf:
        return [0.0] * n_bins
    counts = [0] * n_bins
    for b in buf:
        counts[b * n_bins // 256] += 1
    n = float(len(buf))
    return [c / n for c in counts]


def extract_image_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_bins: int = 16,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    Decoder ladder per payload: Pillow (any format, when importable) →
    pure-stdlib PNG codec (real dimensions + pixels, always available) →
    deterministic byte-histogram fallback (width/height = -1, decoder
    ='histogram-fallback') so downstream code can tell the tiers apart.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from ..functions import png as PNG

        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf) if buf is not None else b""
                width = height = -1
                decoder = "histogram-fallback"
                if HAVE_PIL:
                    try:
                        with Image.open(io.BytesIO(buf)) as im:
                            width, height = im.size
                            decoder = "pil"
                    except Exception:
                        pass
                if decoder == "histogram-fallback":
                    try:
                        width, height, _ch, _px = PNG.decode_png(buf)
                        decoder = "stdlib-png"
                    except PNG.PngError:
                        pass
                rows.append(
                    (mid, len(buf), decoder, width, height,
                     _histogram_features(buf, n_bins))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "decoder", "width", "height",
                         "features"],
            )

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("decoded", T.BooleanType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),   # of 16-bit PCM, normalized
        T.StructField("peak", T.DoubleType()),
    ]
)


def extract_audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL audio decode for WAV/PCM payloads — the `wave` stdlib module
    parses the RIFF container and 16-bit PCM needs no codec.  Emits
    per-clip metadata plus RMS/peak levels; non-WAV payloads come back
    decoded=False with -1/0 fields (never silently wrong)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        import numpy as np

        # Only genuine decode failures of malformed/non-WAV payloads map to
        # decoded=False; anything else (numpy bugs, schema mistakes) must
        # propagate — mirroring the PNG path's narrow `except PngError`.
        decode_errors = (wave.Error, EOFError, ValueError, struct.error)

        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf) if buf is not None else b""
                try:
                    with wave.open(io.BytesIO(buf)) as wf:
                        nch = wf.getnchannels()
                        rate = wf.getframerate()
                        n = wf.getnframes()
                        width = wf.getsampwidth()
                        pcm = wf.readframes(n)
                    if width != 2:
                        raise ValueError(f"only 16-bit PCM supported, got {width*8}")
                    x = np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32768.0
                    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
                    peak = float(np.max(np.abs(x))) if x.size else 0.0
                    rows.append((mid, True, nch, rate, n,
                                 round(n / rate, 6) if rate else 0.0,
                                 round(rms, 6), round(peak, 6)))
                except decode_errors:
                    rows.append((mid, False, -1, -1, -1, 0.0, 0.0, 0.0))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "decoded", "n_channels", "sample_rate",
                         "n_frames", "duration_sec", "rms", "peak"],
            )

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def synthetic_wav_media(spark, n_rows: int) -> DataFrame:
    """REAL 16-bit PCM WAV payloads generated in executors (stdlib `wave`):
    a deterministic sine tone per id — frequency/duration vary with the id
    (columns: media_id, payload, true_rate, true_frames)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                rate = 8000
                n = 400 + (mid % 5) * 100
                freq = 220.0 * (1 + mid % 4)
                t = np.arange(n) / rate
                x = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
                bio = io.BytesIO()
                with wave.open(bio, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(rate)
                    wf.writeframes(x.tobytes())
                rows.append((mid, bio.getvalue(), rate, n))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "true_rate", "true_frames"]
            )

    return spark.range(n_rows).mapInPandas(
        gen, "media_id long, payload binary, true_rate int, true_frames int"
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("resized", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Distributed nearest-neighbor resize of PNG payloads via the
    pure-stdlib codec (decode → resize → re-encode inside Arrow batches).
    Payloads the codec cannot decode pass through unchanged with
    resized=False and width/height = -1 — never silently wrong."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import png as PNG

        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf) if buf is not None else b""
                try:
                    _w, _h, _ch, px = PNG.decode_png(buf)
                    small = PNG.resize_nearest(px, width, height)
                    if _ch == 1:
                        small = small.reshape(height, width)
                    rows.append((mid, True, width, height,
                                 PNG.encode_png(small)))
                except PNG.PngError:
                    rows.append((mid, False, -1, -1, buf))
            yield pd.DataFrame(
                rows, columns=["media_id", "resized", "width", "height", "payload"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    frame_size: int = 256,
    every_k: int = 4,
) -> DataFrame:
    """Frame sampling for opaque 'video' payloads: emit every k-th
    fixed-size chunk as a frame row (1→N mapInPandas fan-out — the same
    batch shape a real demuxer stage has; chunking stands in for codec
    frame boundaries, which need an actual demuxer library)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf) if buf is not None else b""
                n_frames = len(buf) // frame_size
                for fi in range(0, n_frames, every_k):
                    out_ids.append(mid)
                    out_idx.append(fi)
                    out_frames.append(buf[fi * frame_size:(fi + 1) * frame_size])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_index": out_idx,
                 "frame_bytes": out_frames}
            )

    return df.select(id_col, payload_col).mapInPandas(run, FRAME_SCHEMA)


# ------------------------------------------------------------- synthetic data

def synthetic_png_media(spark, n_rows: int) -> DataFrame:
    """REAL decodable PNG payloads generated in executors via the stdlib
    codec: a deterministic gradient image per id, dimensions varying with
    the id (columns: media_id, payload, true_w, true_h)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions import png as PNG

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                w, h = 8 + mid % 5, 6 + mid % 3
                yy, xx = np.mgrid[0:h, 0:w]
                px = ((xx * 17 + yy * 31 + mid) % 256).astype("uint8")
                rows.append((mid, PNG.encode_png(px), w, h))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "true_w", "true_h"]
            )

    return spark.range(n_rows).mapInPandas(
        gen, "media_id long, payload binary, true_w int, true_h int"
    )


def synthetic_media(spark, n_rows: int, seed_tag: str = "m") -> DataFrame:
    """Deterministic opaque media table: payload bytes derived from
    sha2-chained hex (unhex -> binary), format label round-robins with a
    deliberate mismatch stripe (media_id % 17 == 3 claims png but carries
    jpeg magic) so payload_ok has known violations.

    Columns: media_id, kind, declared_format, payload(binary),
    meta struct<n_bytes, source>."""
    i = F.col("id")
    # 64 hex chars -> 32 bytes per sha2 call; repeat to vary lengths
    seed = F.sha2(F.concat(i.cast("string"), F.lit(seed_tag)), 256)
    body = F.concat(seed, F.sha2(seed, 256), F.repeat(seed, (i % 3).cast("int")))
    png_hdr, jpg_hdr = "89504E470D0A1A0A", "FFD8FFE0"
    is_png = (i % 2) == 0
    mismatch = (i % 17) == 3
    hdr = F.when(is_png & ~mismatch, png_hdr).when(is_png & mismatch, jpg_hdr) \
           .otherwise(jpg_hdr)
    declared = F.when(is_png, "png").otherwise("jpeg")
    payload = F.unhex(F.concat(hdr, body))
    return spark.range(n_rows).select(
        i.alias("media_id"),
        F.lit("image").alias("kind"),
        declared.alias("declared_format"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("int").alias("n_bytes"),
            F.lit("synthetic").alias("source"),
        ).alias("meta"),
    )


# ------------------------------------------------------------------ video

VIDEO_FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("decode_ok", T.BooleanType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("chroma", T.StringType()),
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("y_sum", T.LongType()),
])


def extract_video_frames(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    *,
    every_k: int = 1,
) -> DataFrame:
    """REAL video frame extraction for YUV4MPEG2 payloads — the demuxer
    stage of the video modality, with an actual stdlib codec
    (functions/y4m.py) instead of the fixed-size chunking stand-in
    :func:`sample_frames` uses for codec-compressed containers.

    One output row per SAMPLED frame (frame_index % every_k == 0):
    ``(media_id, decode_ok, width, height, n_frames, chroma,
    frame_index, y_sum)`` where ``y_sum`` is the exact integer sum of
    the frame's luma plane — a decode-pinning statistic an arithmetic
    oracle can recompute without touching bytes.  Undecodable payloads
    emit ONE row with ``decode_ok=false``, -1 dims and NULLs — flagged,
    never dropped (same contract as image_hashes).

    Scale shape: 1→N Arrow-batched fan-out riding the payload scan —
    no shuffle; a row's cost is linear in its payload bytes and the
    per-frame guard (functions/y4m.MAX_PIXELS/MAX_FRAMES) bounds
    allocation per row.
    """
    if every_k < 1:
        raise ValueError("every_k must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import y4m as Y4M

        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                mid = int(mid)
                try:
                    info, frames = Y4M.decode_y4m(
                        bytes(buf) if buf is not None else b""
                    )
                except Y4M.Y4mError:
                    rows.append((mid, False, -1, -1, -1, None, -1, None))
                    continue
                for fi in range(0, info["n_frames"], every_k):
                    rows.append((
                        mid, True, info["width"], info["height"],
                        info["n_frames"], info["chroma"], fi,
                        int(frames[fi]["y"].sum(dtype="int64")),
                    ))
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_FRAME_SCHEMA])

    return df.select(id_col, payload_col).mapInPandas(run, VIDEO_FRAME_SCHEMA)


def synthetic_y4m_media(spark, n_rows: int) -> DataFrame:
    """REAL decodable Y4M payloads generated in executors via the
    stdlib codec: per id a deterministic luma pattern
    ``y(x, y, f) = (x*7 + y*13 + 29*f + id) % 256`` across
    ``2 + id%3`` frames, chroma alternating 420jpeg/mono (columns:
    media_id, payload, true_w, true_h, true_frames)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions import y4m as Y4M

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                w, h = 8 + (mid % 3) * 2, 6 + (mid % 2) * 2
                n = 2 + mid % 3
                ff, yy, xx = np.mgrid[0:n, 0:h, 0:w]
                lum = ((xx * 7 + yy * 13 + 29 * ff + mid) % 256).astype(
                    "uint8"
                )
                chroma = "420jpeg" if mid % 2 == 0 else "mono"
                rows.append((
                    mid, Y4M.encode_y4m(lum, chroma=chroma), w, h, n
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "payload", "true_w", "true_h",
                         "true_frames"],
            )

    return spark.range(n_rows).mapInPandas(
        gen,
        "media_id long, payload binary, true_w int, true_h int,"
        " true_frames int",
    )
