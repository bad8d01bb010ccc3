"""Schema-evolution check between two table snapshots.

The reference's schema is static per run (parsed once from tags); across
*commits* of a real table, columns appear, vanish, or change type — the
drift family's metadata-level sibling.  Pure driver-side metadata
comparison (schemas are tiny); emitted as a DataFrame so it lands in the
same report sink as the data-level checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _flat(schema: T.StructType, prefix: str = "") -> dict[str, str]:
    """Flatten nested structs to dotted paths -> simpleString types."""
    out: dict[str, str] = {}
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        if isinstance(f.dataType, T.StructType):
            out[path] = "struct"
            out.update(_flat(f.dataType, prefix=f"{path}."))
        elif isinstance(f.dataType, (T.VarcharType, T.CharType)):
            # char/varchar read back as string at runtime — not a change
            out[path] = "string"
        else:
            out[path] = f.dataType.simpleString()
    return out


def schema_diff(
    spark: SparkSession,
    before: T.StructType | DataFrame,
    after: T.StructType | DataFrame,
) -> DataFrame:
    """(column, change, from_type, to_type) rows; change in
    {added, removed, type_changed}.  Empty DataFrame = schemas compatible."""
    b = _flat(before.schema if isinstance(before, DataFrame) else before)
    a = _flat(after.schema if isinstance(after, DataFrame) else after)
    rows = []
    for col in sorted(b.keys() | a.keys()):
        if col not in a:
            rows.append((col, "removed", b[col], None))
        elif col not in b:
            rows.append((col, "added", None, a[col]))
        elif a[col] != b[col]:
            rows.append((col, "type_changed", b[col], a[col]))
    return spark.createDataFrame(
        rows, "column string, change string, from_type string, to_type string"
    )


def assert_compatible(
    spark: SparkSession,
    before: T.StructType | DataFrame,
    after: T.StructType | DataFrame,
    *,
    allow_added: bool = True,
) -> None:
    """Raise ValueError when the evolution would break readers: removed
    columns or type changes always break; additions break only when
    ``allow_added=False``."""
    diff = schema_diff(spark, before, after).collect()
    breaking = [
        r for r in diff
        if r["change"] in ("removed", "type_changed")
        or (r["change"] == "added" and not allow_added)
    ]
    if breaking:
        detail = "; ".join(
            f"{r['column']}: {r['change']}"
            f" ({r['from_type']} -> {r['to_type']})" for r in breaking
        )
        raise ValueError(f"incompatible schema evolution: {detail}")
