"""Spectral landmark fingerprinting — the REAL-FFT tier above the
energy envelope (operators/audiohash.py): Shazam's constellation idea
(Wang 2003) reduced to its deterministic core.  Where the envelope
hash answers "same clip?", landmarks answer "does this clip CONTAIN
that snippet?" — the content-tracing / snippet-contamination question
a training-audio corpus needs (find every clip embedding a known
jingle, watermark tone, or benchmark audio prompt).

Definition:
1. parse WAV (stdlib ``wave``, 16-bit PCM — the repo's real-codec
   rule); drop the tail so the stream splits into whole ``window``-
   sample frames;
2. per frame: numpy rFFT, peak = the frequency bin (DC excluded) with
   the largest squared magnitude — np.argmax's first-wins rule makes
   ties break toward the LOWEST bin, deterministically;
3. landmarks: for each fan-out gap dt and frame t,
   ``hash = (peak[t] << 20) | (peak[t+dt] << 8) | dt`` — an int64
   that encodes "bin A is followed by bin B after dt frames", the
   time-anchored pair that survives trimming and re-encoding;
4. a clip's fingerprint is its DISTINCT landmark set.

Matching is a pure equi-join on the landmark value: two clips sharing
``min_shared`` landmarks match.  Hot landmarks (a silence artifact, a
standard test tone) would generate quadratic pairs — buckets above
``max_bucket`` are EXCLUDED AND COUNTED (the LSH hot-bucket rule used
by every banding tier in this repo; dropped buckets are reported, not
silent).

Scale shape: extraction is one Arrow pass (no shuffle); matching is
explode -> bucket-size agg -> capped equi-join -> pair-count groupBy —
the SimHash/banding shape, pair volume bounded by Σ bucket² over
capped buckets.

The driver oracle derives expected landmarks PURELY ARITHMETICALLY:
planted frames hold integer-bin sine tones (bin k over a ``window``-
sample frame puts the whole DFT mass at bin k; int16 quantization
leaves the argmax untouched by ~N·a/2 vs sub-LSB leakage), so
equality pins WAV-encode -> parse -> rFFT -> argmax -> bit-packing
against closed-form integers with no audio bytes in SQL.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LM_SCHEMA = (
    "media_id long, decode_ok boolean, n_windows int, "
    "landmarks array<long>"
)


def landmark_set(samples, *, window: int = 64,
                 fan_out: tuple[int, ...] = (1, 2, 3)) -> list[int]:
    """Distinct landmark hashes of an int16 sample sequence (sorted,
    for deterministic array output)."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    n_win = x.size // window
    if n_win < 2:
        return []
    frames = x[: n_win * window].reshape(n_win, window)
    spec = np.fft.rfft(frames, axis=1)
    mag = spec.real**2 + spec.imag**2
    peaks = 1 + np.argmax(mag[:, 1:], axis=1)  # DC excluded; ties -> low bin
    out = set()
    for dt in fan_out:
        for t in range(n_win - dt):
            out.add((int(peaks[t]) << 20) | (int(peaks[t + dt]) << 8) | dt)
    return sorted(out)


def audio_landmarks(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    *,
    window: int = 64,
    fan_out: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """``(media_id, decode_ok, n_windows, landmarks)`` — landmarks is
    the clip's sorted distinct hash set, NULL when the payload is not
    a decodable 16-bit PCM WAV (flagged, never dropped)."""
    import pandas as pd

    if window < 4 or window % 2:
        raise ValueError("window must be an even integer >= 4")
    if not fan_out or any(d < 1 for d in fan_out):
        raise ValueError("fan_out gaps must be >= 1")
    if max(fan_out) > 255 or window // 2 > 4095:
        raise ValueError("hash packing: dt <= 255, bins <= 4095")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        import numpy as np

        decode_errors = (wave.Error, EOFError, ValueError, struct.error)
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf) if buf is not None else b""
                try:
                    with wave.open(io.BytesIO(buf)) as wf:
                        n = wf.getnframes()
                        width = wf.getsampwidth()
                        pcm = wf.readframes(n)
                    if width != 2:
                        raise ValueError(
                            f"only 16-bit PCM supported, got {width * 8}"
                        )
                    x = np.frombuffer(pcm, dtype="<i2")
                    lms = landmark_set(x, window=window, fan_out=fan_out)
                    rows.append(
                        (int(mid), True, x.size // window, lms)
                    )
                except decode_errors:
                    rows.append((int(mid), False, -1, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "decode_ok", "n_windows",
                         "landmarks"],
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col)
    ).mapInPandas(run, LM_SCHEMA)


def landmark_matches(
    landmarks: DataFrame,
    *,
    min_shared: int = 5,
    max_bucket: int = 2000,
) -> DataFrame:
    """Clip pairs sharing >= ``min_shared`` landmarks:
    ``(id_a, id_b, n_shared)`` with ``id_a < id_b``.

    Landmarks appearing in more than ``max_bucket`` clips are excluded
    from pair generation and LOUDLY counted (a WARNING log with the
    drop count, computed eagerly off the materialized landmark frame;
    :func:`hot_landmarks` returns the same set programmatically).

    The exploded frame is localCheckpoint-ed: it embeds the upstream
    Arrow decode+rFFT pass, which would otherwise re-run for the
    bucket-size aggregate AND both self-join sides (the
    dedup._cap_hot_buckets / cluster_pairs lesson)."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    ex = (
        landmarks.filter(F.col("decode_ok"))
        .select("media_id", F.explode("landmarks").alias("_h"))
        .localCheckpoint()
    )
    sizes = ex.groupBy("_h").agg(
        F.count(F.lit(1)).alias("_n")
    ).localCheckpoint()
    n_hot = sizes.filter(F.col("_n") > max_bucket).count()
    if n_hot:
        import logging

        logging.getLogger(__name__).warning(
            "landmark_matches: %d landmark(s) above max_bucket=%d "
            "excluded from pair generation (hot_landmarks() lists them)",
            n_hot, max_bucket,
        )
    ok = ex.join(
        sizes.filter(F.col("_n") <= max_bucket).select("_h"), on="_h"
    )
    a = ok.select(F.col("media_id").alias("id_a"), "_h")
    b = ok.select(F.col("media_id").alias("id_b"), "_h")
    return (
        a.join(b, on="_h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def hot_landmarks(
    landmarks: DataFrame, *, max_bucket: int = 2000
) -> DataFrame:
    """The landmarks :func:`landmark_matches` excludes at this cap:
    ``(landmark, n_clips)`` — the drop report."""
    return (
        landmarks.filter(F.col("decode_ok"))
        .select(F.explode("landmarks").alias("landmark"))
        .groupBy("landmark")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clips"))
        .filter(F.col("n_clips") > max_bucket)
    )
