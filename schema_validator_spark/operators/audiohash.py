"""Audio energy-envelope fingerprinting — the audio-modality analog
of the aHash tier (operators/imagehash.py): training-audio corpora
dedupe on PERCEPTUAL identity (re-encoded, re-sampled, trimmed
copies), which byte-sha cannot see.  The classic envelope fingerprint
(Shazam-family preprocessing, simplified to the deterministic core):
64 equal windows over the PCM stream, one bit per window = "is this
window's energy above the clip mean".

Definition (INTEGER-only end to end — any engine replaying the
arithmetic reproduces the hash bit-exactly):
1. parse WAV via the stdlib ``wave`` module (16-bit PCM; the repo's
   real-codec rule — multimodal.py);
2. window w of 64 spans samples [floor(w·n/64), floor((w+1)·n/64));
3. ``energy_w = Σ s_i²`` over the window (int64 — 16-bit samples
   squared cannot overflow at any real clip length);
4. bit w (MSB first) = 1 iff ``energy_w · 64 > total_energy`` — the
   same strict cross-multiplied mean test as the image tier;
5. fingerprint = 16-char lowercase hex.

Near-duplicate detection reuses the image tier's banding + exact
bit_count verify verbatim (``imagehash.image_near_dups`` on a renamed
frame) — one banded-hash machinery, two modalities.

Decode failures yield ``decode_ok = false`` and a NULL fingerprint —
never dropped, never silently wrong.  Multi-channel audio is hashed
over the interleaved stream (channel-agnostic energy; documented).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FP_SCHEMA = (
    "media_id long, decode_ok boolean, n_frames int, sample_rate int, "
    "fingerprint string"
)


def envelope_bits(samples) -> int:
    """The 64-bit envelope fingerprint of an int sample sequence."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int64)
    n = x.size
    if n == 0:
        return 0
    sq = x * x
    total = int(sq.sum())
    v = 0
    for w in range(64):
        lo = (w * n) // 64
        hi = ((w + 1) * n) // 64
        e = int(sq[lo:hi].sum())
        if e * 64 > total:
            v |= 1 << (63 - w)
    return v


def audio_fingerprints(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """``(media_id, decode_ok, n_frames, sample_rate, fingerprint)``
    — fingerprint is the 16-hex-char envelope hash, NULL when the
    payload is not a decodable 16-bit PCM WAV."""
    import pandas as pd

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
                        rate = wf.getframerate()
                        n = wf.getnframes()
                        width = wf.getsampwidth()
                        pcm = wf.readframes(n)
                    if width != 2:
                        raise ValueError(
                            f"only 16-bit PCM supported, got {width * 8}"
                        )
                    x = np.frombuffer(pcm, dtype="<i2")
                    rows.append(
                        (int(mid), True, n, rate,
                         format(envelope_bits(x), "016x"))
                    )
                except decode_errors:
                    rows.append((int(mid), False, -1, -1, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "decode_ok", "n_frames",
                         "sample_rate", "fingerprint"],
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col)
    ).mapInPandas(run, FP_SCHEMA)


def audio_near_dups(
    fingerprints: DataFrame,
    *,
    max_hamming: int = 3,
    max_bucket: int = 2000,
) -> DataFrame:
    """Candidate pairs within ``max_hamming`` over the fingerprint
    frame — the image tier's banding + exact verify, reused verbatim
    on the renamed frame (one machinery, two modalities)."""
    from .imagehash import image_near_dups

    return image_near_dups(
        fingerprints.select(
            "media_id", "decode_ok",
            F.col("fingerprint").alias("ahash"),
        ),
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )
