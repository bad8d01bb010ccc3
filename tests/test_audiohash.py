from __future__ import annotations

import io
import wave

import pytest

from schema_validator_spark.operators.audiohash import (
    audio_fingerprints,
    audio_near_dups,
    envelope_bits,
)


def _wav(samples, rate=8000):
    import numpy as np

    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return bio.getvalue()


def test_envelope_known_pattern():
    # first 32 windows loud, last 32 silent: bits = 32 ones then zeros
    samples = [1000] * 512 + [0] * 512  # 16 samples per window
    v = envelope_bits(samples)
    assert v == int("1" * 32 + "0" * 32, 2)


def test_envelope_uniform_is_zero():
    assert envelope_bits([500] * 1024) == 0
    assert envelope_bits([]) == 0


def test_fingerprints_via_real_codec(spark):
    samples = [2000] * 256 + [0] * 768
    df = spark.createDataFrame(
        [(1, _wav(samples)), (2, bytearray(b"not a wav"))],
        "media_id long, payload binary")
    out = {r["media_id"]: r.asDict()
           for r in audio_fingerprints(df).collect()}
    assert out[1]["decode_ok"] is True
    assert out[1]["n_frames"] == 1024 and out[1]["sample_rate"] == 8000
    assert out[1]["fingerprint"] == format(envelope_bits(samples), "016x")
    assert out[2]["decode_ok"] is False and out[2]["fingerprint"] is None


def test_near_dups_planted_flip(spark):
    import numpy as np

    rng_amp = [((w * 13) % 8 + 1) * 1000 for w in range(64)]
    base = [a for a in rng_amp for _ in range(16)]
    # variant: one window's amplitude flipped loud -> small hamming
    var = list(base)
    var[0:16] = [8000] * 16
    df = spark.createDataFrame(
        [(1, _wav(base)), (2, _wav(var)), (3, _wav([0] * 1024))],
        "media_id long, payload binary")
    fps = audio_fingerprints(df)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in audio_near_dups(fps, max_hamming=3).collect()}
    h = {r["media_id"]: int(r["fingerprint"], 16)
         for r in fps.collect()}
    d12 = bin(h[1] ^ h[2]).count("1")
    if d12 <= 3:
        assert pairs.get((1, 2)) == d12
    assert (1, 3) not in pairs and (2, 3) not in pairs
    assert d12 >= 1  # the flip actually changed the envelope
