from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from schema_validator_spark.functions import png as PNG
from schema_validator_spark.operators.imagehash import (
    ahash64_pixels,
    hamming_hex64,
    image_hashes,
    image_near_dups,
)


def _img8(fill):
    """8x8 grayscale image from a callable fill(x, y) -> 0..255."""
    import numpy as np

    a = np.zeros((8, 8), dtype="uint8")
    for y in range(8):
        for x in range(8):
            a[y, x] = fill(x, y)
    return a


def _png_df(spark, imgs):
    rows = [(i, PNG.encode_png(a)) for i, a in imgs]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_ahash_known_pattern():
    # left half black, right half white: bits = 0 for x<4, 1 for x>=4
    a = _img8(lambda x, y: 255 if x >= 4 else 0)
    v = ahash64_pixels(a)
    want = int("".join("00001111" for _ in range(8)), 2)
    assert v == want


def test_ahash_uniform_image_is_zero():
    # p * 64 > sum is false when all pixels equal (strict >)
    assert ahash64_pixels(_img8(lambda x, y: 7)) == 0


def test_hashes_via_real_codec_roundtrip(spark):
    import numpy as np

    imgs = [(1, _img8(lambda x, y: (x * 17 + y * 31) % 256)),
            (2, _img8(lambda x, y: 255 if (x + y) % 2 else 0))]
    out = {r["media_id"]: r.asDict()
           for r in image_hashes(_png_df(spark, imgs)).collect()}
    for i, a in imgs:
        assert out[i]["decode_ok"] is True
        assert out[i]["width"] == 8 and out[i]["height"] == 8
        assert out[i]["ahash"] == format(ahash64_pixels(a), "016x")


def test_corrupt_payload_flagged_not_dropped(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"not a png"))], "media_id long, payload binary")
    r = image_hashes(df).collect()[0]
    assert r["decode_ok"] is False and r["ahash"] is None


def test_rgb_and_resize_paths(spark):
    import numpy as np

    rgb = np.zeros((16, 16, 3), dtype="uint8")
    rgb[:, 8:, :] = 255  # right half white at 16x16
    df = _png_df(spark, [(1, rgb)])
    r = image_hashes(df).collect()[0]
    # downsampled to 8x8 keeps the half-split pattern
    want = format(int("".join("00001111" for _ in range(8)), 2), "016x")
    assert r["ahash"] == want and r["width"] == 16


def test_hamming_expr_exact(spark):
    df = spark.createDataFrame(
        [("0" * 16, "0" * 16), ("0" * 16, "f" * 16),
         ("00000000000000ff", "0000000000000000")],
        "a string, b string")
    got = [r["h"] for r in
           df.select(hamming_hex64(F.col("a"), F.col("b")).alias("h"))
           .collect()]
    assert got == [0, 64, 8]


def test_near_dups_within_hamming3_exact(spark):
    # base checkerboard + copies with 0..5 flipped pixels: pairs at
    # hamming <= 3 are guaranteed (pigeonhole over 4 bands)
    def base(x, y):
        return 255 if (x + y) % 2 else 0

    imgs = [(0, _img8(base))]
    for k in range(1, 6):
        a = _img8(base)
        for j in range(k):
            x, y = j % 8, (j * 3) % 8
            a[y, x] = 255 - a[y, x]
        imgs.append((k, a))
    hashes = image_hashes(_png_df(spark, imgs))
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_near_dups(hashes, max_hamming=3).collect()}
    # verify against exact all-pairs hamming in python
    hs = {r["media_id"]: int(r["ahash"], 16) for r in hashes.collect()}
    for i in hs:
        for j in hs:
            if i < j:
                d = bin(hs[i] ^ hs[j]).count("1")
                if d <= 3:
                    assert pairs.get((i, j)) == d, (i, j, d, pairs)
                else:
                    assert (i, j) not in pairs


def test_near_dup_guard(spark):
    df = spark.createDataFrame(
        [(1, True, 8, 8, "0" * 16)], "media_id long, decode_ok boolean,"
        " width int, height int, ahash string")
    with pytest.raises(ValueError):
        image_near_dups(df, max_hamming=65)


class TestDHash:
    def test_hand_computed_bits(self):
        import numpy as np

        from schema_validator_spark.operators.imagehash import (
            dhash64_pixels,
        )

        px = np.zeros((8, 9), dtype=np.uint8)
        px[0, 1] = 10  # (0,0)<(0,1) -> bit 0 set; (0,1)>(0,2) -> bit 1 clear
        px[7, 8] = 5   # (7,7)<(7,8) -> bit 63 set
        v = dhash64_pixels(px)
        assert v >> 63 == 1
        assert (v >> 62) & 1 == 0
        assert v & 1 == 1

    def test_brightness_shift_invariance(self):
        import numpy as np

        from schema_validator_spark.operators.imagehash import (
            ahash64_pixels,
            dhash64_pixels,
        )

        rng = [(r * 37 + c * 13) % 200 for r in range(8) for c in range(9)]
        px = np.asarray(rng, dtype=np.uint8).reshape(8, 9)
        shifted = px + 40  # no clipping (max 199+40)
        assert dhash64_pixels(px) == dhash64_pixels(shifted)
        # aHash is mean-relative: same here by linearity of the mean,
        # but dHash's guarantee is per-bit local, not distributional
        assert isinstance(ahash64_pixels(px[:, :8]), int)

    def test_frame_and_near_dups(self, spark):
        import numpy as np

        from schema_validator_spark.functions.png import encode_png
        from schema_validator_spark.operators.imagehash import (
            image_dhashes,
            image_near_dups,
        )

        rows = []
        for i in range(6):
            base = i // 2
            px = np.asarray(
                [(r * 37 + c * 13 + base * 7) % 200
                 for r in range(8) for c in range(9)],
                dtype=np.uint8).reshape(8, 9)
            if i % 2 == 1:
                px = px + 30  # brightness shift: same dhash
            rows.append((i, bytearray(encode_png(px))))
        rows.append((99, bytearray(b"NOTPNG")))
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        got = {r["media_id"]: r for r in image_dhashes(df).collect()}
        assert not got[99]["decode_ok"] and got[99]["dhash"] is None
        for b in range(3):
            assert got[2 * b]["dhash"] == got[2 * b + 1]["dhash"]
        pairs = image_near_dups(
            image_dhashes(df).withColumnRenamed("dhash", "ahash"),
            max_hamming=0,
        )
        assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} >= \
            {(0, 1), (2, 3), (4, 5)}
