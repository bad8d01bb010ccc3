from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from pyspark.sql import functions as F

from schema_validator_spark.operators.audiolandmark import (
    audio_landmarks,
    hot_landmarks,
    landmark_matches,
    landmark_set,
)

W = 64


def _tone_frames(bins, amp=8000, window=W):
    """Concatenate pure integer-bin sine frames (one tone per frame)."""
    t = np.arange(window)
    out = []
    for k in bins:
        out.append(np.round(amp * np.sin(2 * np.pi * k * t / window)))
    return np.concatenate(out).astype("<i2")


def _wav(samples):
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(samples.tobytes())
    return bio.getvalue()


def _expected(bins, fan_out=(1, 2, 3)):
    out = set()
    for dt in fan_out:
        for t in range(len(bins) - dt):
            out.add((bins[t] << 20) | (bins[t + dt] << 8) | dt)
    return sorted(out)


def test_landmark_set_matches_closed_form():
    bins = [3, 7, 12, 5, 9, 3, 14, 8]
    got = landmark_set(_tone_frames(bins))
    assert got == _expected(bins)


def test_tail_samples_dropped_and_short_clips_empty():
    bins = [4, 11, 6]
    x = np.concatenate([_tone_frames(bins), np.zeros(17, dtype="<i2")])
    assert landmark_set(x) == _expected(bins)
    assert landmark_set(_tone_frames([5])) == []  # 1 window -> no pair


def test_frame_operator_and_corrupt_stripe(spark):
    rows = []
    for i in range(8):
        bins = [3 + ((w * 5 + i) % 13) for w in range(6)]
        rows.append((i, bytearray(_wav(_tone_frames(bins)))))
    rows.append((99, bytearray(b"NOTWAV")))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in audio_landmarks(df).collect()}
    for i in range(8):
        bins = [3 + ((w * 5 + i) % 13) for w in range(6)]
        assert got[i]["decode_ok"]
        assert got[i]["n_windows"] == 6
        assert list(got[i]["landmarks"]) == _expected(bins)
    assert not got[99]["decode_ok"]
    assert got[99]["landmarks"] is None


def test_snippet_containment_shares_landmarks(spark):
    base = [3, 7, 12, 5, 9, 14, 8, 11, 6, 10]
    full = _tone_frames(base)
    snippet = _tone_frames(base[3:8])
    df = spark.createDataFrame(
        [(1, bytearray(_wav(full))), (2, bytearray(_wav(snippet)))],
        "media_id long, payload binary")
    lms = audio_landmarks(df)
    m = landmark_matches(lms, min_shared=4).collect()
    assert len(m) == 1
    assert (m[0]["id_a"], m[0]["id_b"]) == (1, 2)
    # snippet of 5 frames: 4+3+2 = 9 pair-landmarks, all inside full
    assert m[0]["n_shared"] == 9


def test_matches_and_min_shared(spark):
    rows = []
    for i in range(6):
        bins = [3 + ((w * 5 + i % 2) % 13) for w in range(6)]
        rows.append((i, bytearray(_wav(_tone_frames(bins)))))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    lms = audio_landmarks(df)
    pairs = {(r["id_a"], r["id_b"]): r["n_shared"]
             for r in landmark_matches(lms, min_shared=10).collect()}
    same = {(a, b) for a in range(6) for b in range(a + 1, 6)
            if a % 2 == b % 2}
    assert set(pairs) == same
    n_expected = len(_expected([3 + ((w * 5) % 13) for w in range(6)]))
    assert all(v == n_expected for v in pairs.values())


def test_hot_bucket_cap_excludes_and_reports(spark):
    # every clip shares one constant frame pair -> one hot landmark
    rows = []
    for i in range(10):
        bins = [5, 9, 20 + i, 23 + i]
        rows.append((i, bytearray(_wav(_tone_frames(bins)))))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    lms = audio_landmarks(df, fan_out=(1,))
    hot = hot_landmarks(lms, max_bucket=5).collect()
    assert [(r["landmark"], r["n_clips"]) for r in hot] == \
        [((5 << 20) | (9 << 8) | 1, 10)]
    # with the hot landmark excluded no pair reaches min_shared=2
    assert landmark_matches(lms, min_shared=2, max_bucket=5).count() == 0
    # without the cap every pair shares the (5,9) landmark only
    uncapped = landmark_matches(lms, min_shared=1, max_bucket=2000)
    assert uncapped.count() == 45


def test_guards(spark):
    df = spark.createDataFrame([(1, bytearray(b""))],
                               "media_id long, payload binary")
    with pytest.raises(ValueError, match="window"):
        audio_landmarks(df, window=63)
    with pytest.raises(ValueError, match="fan_out"):
        audio_landmarks(df, fan_out=())
    with pytest.raises(ValueError, match="packing"):
        audio_landmarks(df, window=8200)
    with pytest.raises(ValueError, match="min_shared"):
        landmark_matches(audio_landmarks(df), min_shared=0)
