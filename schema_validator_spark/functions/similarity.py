"""Vector similarity column functions — pure Spark SQL over
``array<float/double>`` embedding columns (zip_with/aggregate stay in
whole-stage codegen; no UDF round trip)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def normalize(a: Column) -> Column:
    """Unit-normalize; zero vectors stay zero."""
    n = norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x / n)).otherwise(a)


def srp_signature(a: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection LSH signature: one bit per hyperplane
    (deterministic planes supplied by the caller).  Returns array<int>
    of 0/1 bits — the bucketing key for cosine-LSH."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(a, F.array(*[F.lit(float(w)) for w in plane]),
                           lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for plane in planes
    ]
    return F.array(*bits)


def deterministic_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Pseudo-random hyperplanes from a hash-based PRNG — fully
    deterministic across runs/machines (no RNG state)."""
    import hashlib
    import struct

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.sha256(f"{seed}:{p}:{d}".encode()).digest()
            (u,) = struct.unpack("<Q", h[:8])
            row.append((u / 2**64) * 2.0 - 1.0)
        planes.append(row)
    return planes
