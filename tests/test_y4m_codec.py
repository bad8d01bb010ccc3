"""functions/y4m.py — pure-stdlib YUV4MPEG2 codec (round-trip,
malformed-input rejection) and the mapInPandas frame-extraction stage
built on it."""

from __future__ import annotations

import numpy as np
import pytest

from schema_validator_spark.functions import y4m as Y4M


def _lum(n, h, w, salt=0):
    ff, yy, xx = np.mgrid[0:n, 0:h, 0:w]
    return ((xx * 7 + yy * 13 + 29 * ff + salt) % 256).astype("uint8")


def test_roundtrip_420():
    a = _lum(3, 6, 8, salt=5)
    buf = Y4M.encode_y4m(a, chroma="420jpeg", fps=(30, 1))
    info, frames = Y4M.decode_y4m(buf)
    assert (info["width"], info["height"], info["n_frames"]) == (8, 6, 3)
    assert (info["fps_num"], info["fps_den"]) == (30, 1)
    assert info["chroma"] == "420jpeg"
    for i in range(3):
        assert (frames[i]["y"] == a[i]).all()
        assert frames[i]["u"].shape == (3, 4)
        assert (frames[i]["u"] == 128).all() and (frames[i]["v"] == 128).all()


@pytest.mark.parametrize("chroma,ushape", [
    ("mono", None), ("422", (6, 4)), ("444", (6, 8)), ("420mpeg2", (3, 4)),
])
def test_roundtrip_other_chromas(chroma, ushape):
    a = _lum(2, 6, 8)
    info, frames = Y4M.decode_y4m(Y4M.encode_y4m(a, chroma=chroma))
    assert info["chroma"] == chroma and info["n_frames"] == 2
    assert (frames[1]["y"] == a[1]).all()
    if ushape is None:
        assert frames[0]["u"] is None and frames[0]["v"] is None
    else:
        assert frames[0]["u"].shape == ushape


def test_default_chroma_is_420jpeg():
    # spec: missing C token means 420jpeg
    a = _lum(1, 2, 2)
    buf = Y4M.encode_y4m(a, chroma="420jpeg")
    stripped = buf.replace(b" C420jpeg", b"", 1)
    info, frames = Y4M.decode_y4m(stripped)
    assert info["chroma"] == "420jpeg"
    assert (frames[0]["y"] == a[0]).all()


@pytest.mark.parametrize("mutate,msg", [
    (lambda b: b"JUNK" + b, "not a YUV4MPEG2"),
    (lambda b: b.replace(b"FRAME\n", b"FRUME\n", 1), "FRAME marker"),
    (lambda b: b[:-3], "truncated frame"),
    (lambda b: b.replace(b" Ip ", b" It ", 1), "interlaced"),
    (lambda b: b.replace(b"C420jpeg", b"C999x", 1), "unsupported chroma"),
    (lambda b: b.replace(b"W8", b"Wx", 1), "bad header token"),
    (lambda b: b[:b.find(b"\n")+1], ""),  # header only -> zero frames, OK
])
def test_malformed_streams(mutate, msg):
    buf = Y4M.encode_y4m(_lum(2, 6, 8), chroma="420jpeg")
    mutated = mutate(buf)
    if msg == "":
        info, frames = Y4M.decode_y4m(mutated)
        assert info["n_frames"] == 0 and frames == []
    else:
        with pytest.raises(Y4M.Y4mError, match=msg):
            Y4M.decode_y4m(mutated)


def test_encode_rejects_odd_dims_for_420():
    with pytest.raises(Y4M.Y4mError, match="divisible"):
        Y4M.encode_y4m(_lum(1, 5, 8), chroma="420jpeg")
    # mono has no chroma planes: odd dims fine
    info, _ = Y4M.decode_y4m(Y4M.encode_y4m(_lum(1, 5, 7), chroma="mono"))
    assert (info["width"], info["height"]) == (7, 5)


def test_extract_video_frames_real_decode(spark):
    from schema_validator_spark.operators.multimodal import (
        extract_video_frames,
        synthetic_y4m_media,
    )

    media = synthetic_y4m_media(spark, 12)
    got = {
        (r["media_id"], r["frame_index"]): r.asDict()
        for r in extract_video_frames(media, every_k=2).collect()
    }
    for mid in range(12):
        w, h = 8 + (mid % 3) * 2, 6 + (mid % 2) * 2
        n = 2 + mid % 3
        for fi in range(0, n, 2):
            r = got.pop((mid, fi))
            assert r["decode_ok"] and (r["width"], r["height"]) == (w, h)
            assert r["n_frames"] == n
            assert r["chroma"] == ("420jpeg" if mid % 2 == 0 else "mono")
            expect = int(
                ((np.arange(w)[None, :] * 7 + np.arange(h)[:, None] * 13
                  + 29 * fi + mid) % 256).sum()
            )
            assert r["y_sum"] == expect
    assert not got  # exactly the sampled frames, nothing else


def test_extract_video_frames_flags_garbage(spark):
    from schema_validator_spark.operators.multimodal import (
        extract_video_frames,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"not a video")), (2, None)],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in extract_video_frames(df).collect()}
    assert len(rows) == 2
    for r in rows.values():
        assert not r["decode_ok"] and r["width"] == -1
        assert r["y_sum"] is None and r["chroma"] is None


# ------------------------------------------------------- property fuzzing

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 4),
    h=st.integers(1, 6).map(lambda v: v * 2),
    w=st.integers(1, 6).map(lambda v: v * 2),
    chroma=st.sampled_from(["420jpeg", "420mpeg2", "422", "444", "mono"]),
    seed=st.integers(0, 10_000),
    fps=st.tuples(st.integers(1, 120), st.integers(1, 1001)),
)
def test_roundtrip_property(n, h, w, chroma, seed, fps):
    a = _lum(n, h, w, salt=seed)
    info, frames = Y4M.decode_y4m(Y4M.encode_y4m(a, chroma=chroma, fps=fps))
    assert (info["width"], info["height"], info["n_frames"]) == (w, h, n)
    assert (info["fps_num"], info["fps_den"]) == fps
    assert info["chroma"] == chroma
    for i in range(n):
        assert (frames[i]["y"] == a[i]).all()


@settings(max_examples=120, deadline=None)
@given(blob=st.binary(max_size=400))
def test_decode_never_crashes_on_garbage(blob):
    # arbitrary bytes either raise Y4mError or decode consistently —
    # no other exception type, no hang, no unguarded allocation
    try:
        info, frames = Y4M.decode_y4m(blob)
    except Y4M.Y4mError:
        return
    assert info["n_frames"] == len(frames)
    for f in frames:
        assert f["y"].shape == (info["height"], info["width"])


@settings(max_examples=80, deadline=None)
@given(
    cut=st.integers(0, 200),
    junk=st.binary(max_size=16),
)
def test_decode_truncation_and_splice_fuzz(cut, junk):
    """Valid stream mutated by truncation + byte splice: must raise
    Y4mError or return a consistent prefix decode, never anything
    else."""
    buf = Y4M.encode_y4m(_lum(3, 4, 6, salt=7), chroma="420jpeg")
    mutated = buf[:cut] + junk + buf[cut + len(junk):]
    try:
        info, frames = Y4M.decode_y4m(mutated)
    except Y4M.Y4mError:
        return
    assert 0 <= info["n_frames"] <= 3
