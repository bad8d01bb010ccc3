"""Perceptual image hashing + image near-duplicate detection — the
multimodal dedup tier (aHash / average-hash, the classic pHash-family
fingerprint): training-image corpora dedupe on PERCEPTUAL identity
(re-encoded, slightly-cropped, or resized copies), which byte-sha
dedup cannot see.  LAION and DataComp both ship perceptual-hash dedup
stages; this is that stage over the engine's binary media columns,
running on the repo's REAL pure-stdlib PNG codec (functions/png.py).

aHash definition (deterministic, integer-only):
1. decode PNG -> (h, w, ch) uint8 pixels;
2. grayscale = floor(sum(channels) / ch) per pixel;
3. nearest-neighbor resize to 8x8 (skipped when already 8x8);
4. bit i (row-major, MSB first) = 1 iff pixel_i * 64 > sum(pixels)
   — the strict integer cross-multiplied form of "above the mean",
   so no float ever decides a bit;
5. hash = 16-char lowercase hex of the 64-bit word.

Near-dup tier reuses the SimHash banding shape (dedup.py): 4 bands of
16 bits — any pair within Hamming distance 3 shares at least one
band EXACTLY (pigeonhole), so candidate generation is 4 equi-join
buckets, hot buckets capped with logged drops, then candidates are
verified by exact Hamming (bit_count of xor over two 32-bit halves —
a 64-bit hex does not fit a signed long through conv()).

Scale shape: hashing is Arrow-batched Python over the codec (the
documented vectorized-Python tier — same rule as multimodal.py);
banding/verify is pure DataFrame (1 explode-groupBy + 1 equi-join at
candidate grain).  Decode failures yield ``decode_ok = false`` and a
NULL hash — never dropped, never silently wrong.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_SCHEMA = (
    "media_id long, decode_ok boolean, width int, height int, "
    "ahash string"
)

N_BANDS = 4  # 16 bits each; pigeonhole covers hamming <= 3 candidates


def ahash64_pixels(px) -> int:
    """The integer-only aHash of a decoded pixel array (h, w[, ch])."""
    import numpy as np

    a = np.asarray(px, dtype=np.int64)
    if a.ndim == 3:
        a = a.sum(axis=2) // a.shape[2]
    if a.shape != (8, 8):
        from ..functions.png import resize_nearest

        a = np.asarray(
            resize_nearest(a.astype("uint8"), 8, 8), dtype=np.int64
        )
        if a.ndim == 3:
            a = a.reshape(8, 8)
    flat = a.reshape(-1)
    total = int(flat.sum())
    v = 0
    for i, p in enumerate(flat.tolist()):
        if p * 64 > total:
            v |= 1 << (63 - i)
    return v


def image_hashes(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """``(media_id, decode_ok, width, height, ahash)`` — ahash is the
    16-hex-char perceptual hash, NULL when the payload is not a
    decodable PNG."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import png as PNG

        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf) if buf is not None else b""
                try:
                    w, h, _ch, px = PNG.decode_png(buf)
                    rows.append(
                        (int(mid), True, w, h,
                         format(ahash64_pixels(px), "016x"))
                    )
                except PNG.PngError:
                    rows.append((int(mid), False, -1, -1, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "decode_ok", "width", "height",
                         "ahash"],
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col)
    ).mapInPandas(run, HASH_SCHEMA)


def _half(col, start):
    return F.conv(F.substring(col, start, 8), 16, 10).cast("long")


def hamming_hex64(a, b):
    """Exact Hamming distance between two 16-hex-char hashes, in
    codegen: bit_count(xor) over two 32-bit halves (a full 64-bit hex
    can exceed signed-long range through conv)."""
    return F.bit_count(
        _half(a, 1).bitwiseXOR(_half(b, 1))
    ) + F.bit_count(_half(a, 9).bitwiseXOR(_half(b, 9)))


def image_near_dups(
    hashes: DataFrame,
    *,
    max_hamming: int = 3,
    max_bucket: int = 2000,
) -> DataFrame:
    """Candidate pairs ``(id_a, id_b, hamming)`` with hamming <=
    ``max_hamming`` over the hash frame from :func:`image_hashes`.

    EXACT for ``max_hamming <= N_BANDS - 1`` (pigeonhole: <= 3 flipped
    bits cannot touch all 4 bands) — EXCEPT members of over-size
    buckets: a (band, key) bucket larger than ``max_bucket`` is
    DROPPED ENTIRELY from pair generation with its drop count logged
    (the SimHash tier's documented semantics, dedup._cap_hot_buckets
    — a degenerate bucket like 2M all-black thumbnails would
    otherwise go quadratic; dedupe such monoculture by EXACT hash
    equality first, which needs no pair generation at all).
    """
    if not 0 <= max_hamming <= 64:
        raise ValueError("max_hamming in [0, 64]")
    h = hashes.filter(F.col("decode_ok") & F.col("ahash").isNotNull())
    bands = h.select(
        "media_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.substring("ahash", 4 * i + 1, 4).alias("key"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "ahash", "bk.band", "bk.key")
    from .dedup import _cap_hot_buckets

    capped = _cap_hot_buckets(
        bands, ["band", "key"], max_bucket, what="image ahash bands"
    )
    a = capped.select(
        F.col("band"), F.col("key"),
        F.col("media_id").alias("id_a"), F.col("ahash").alias("_ha"),
    )
    b = capped.select(
        F.col("band"), F.col("key"),
        F.col("media_id").alias("id_b"), F.col("ahash").alias("_hb"),
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            hamming_hex64(F.col("_ha"), F.col("_hb")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def dhash64_pixels(px) -> int:
    """The integer-only dHash (difference/gradient hash) of a decoded
    pixel array: grayscale, nearest resize to 9 wide x 8 tall, bit
    (r, c) row-major MSB-first = 1 iff pixel[r][c] < pixel[r][c+1].
    Pure integer comparisons — no mean, no float; and because every
    bit is a LOCAL gradient, a global brightness shift (the classic
    re-encode artifact that flips aHash bits near the mean) leaves
    dHash untouched.  Run both tiers and OR the candidate sets for
    the robust near-dup pass."""
    import numpy as np

    a = np.asarray(px, dtype=np.int64)
    if a.ndim == 3:
        a = a.sum(axis=2) // a.shape[2]
    if a.shape != (8, 9):
        from ..functions.png import resize_nearest

        a = np.asarray(
            resize_nearest(a.astype("uint8"), 9, 8), dtype=np.int64
        )
    v = 0
    i = 0
    for r in range(8):
        for c in range(8):
            if a[r, c] < a[r, c + 1]:
                v |= 1 << (63 - i)
            i += 1
    return v


def image_dhashes(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """``(media_id, decode_ok, width, height, dhash)`` — the gradient
    twin of :func:`image_hashes`; near-dup detection reuses the same
    banding machinery on the renamed frame:
    ``image_near_dups(image_dhashes(df).withColumnRenamed('dhash',
    'ahash'))``."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import png as PNG

        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf) if buf is not None else b""
                try:
                    w, h, _ch, px = PNG.decode_png(buf)
                    rows.append(
                        (int(mid), True, w, h,
                         format(dhash64_pixels(px), "016x"))
                    )
                except PNG.PngError:
                    rows.append((int(mid), False, -1, -1, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "decode_ok", "width", "height",
                         "dhash"],
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col)
    ).mapInPandas(
        run,
        "media_id long, decode_ok boolean, width int, height int, "
        "dhash string",
    )
