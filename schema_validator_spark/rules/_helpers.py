"""Type-polymorphism helpers shared by all rule factories.

These encode the reference's value semantics in Spark Column algebra:

* ``IsNilOrZero`` (data/value.go:101-118): nil, "", 0, 0.0, false and the
  zero time are "missing"; empty-but-non-nil arrays/maps are NOT missing.
  Spark deviation (documented in SURVEY.md §1.2): after a storage round
  trip null and nil coincide; an empty array/map is non-null and passes.
* ``Value().String()`` uses lenient casts (spf13/cast): nil → "", numbers
  → decimal string, bool → "true"/"false".  We model null-as-zero by
  coalescing to the type's zero before applying string-shaped rules, so a
  NULL string cell behaves exactly like "" (as a nil *string does in Go).
* ``compareValue`` (rule/validators.go:73-136): numeric vs numeric,
  string vs int-castable param → compares *byte length* (Go ``len``),
  string vs string → lexicographic, slice/array → compares size.
"""

from __future__ import annotations

import operator
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import CompileError

__all__ = ["CompileError", "kind", "is_zero", "required", "as_string",
           "num_col", "param_int", "param_num", "is_intlike",
           "compare_lit", "compare_field", "java_escape_char_class", "strict_anchor"]


# ---------------------------------------------------------------- type kinds

def kind(dtype: T.DataType) -> str:
    if isinstance(dtype, T.StringType):
        return "string"
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "float"
    if isinstance(dtype, T.BooleanType):
        return "bool"
    if isinstance(dtype, T.TimestampType):
        return "timestamp"
    if isinstance(dtype, T.DateType):
        return "date"
    if isinstance(dtype, T.ArrayType):
        return "array"
    if isinstance(dtype, T.MapType):
        return "map"
    if isinstance(dtype, T.StructType):
        return "struct"
    if isinstance(dtype, T.BinaryType):
        return "binary"
    return "other"


_GO_ZERO_TIME = "0001-01-01 00:00:00"


def is_zero(col: Column, dtype: T.DataType) -> Column:
    """IsNilOrZero as a boolean Column (data/value.go:101-118)."""
    k = kind(dtype)
    if k == "string":
        return col.isNull() | (col == F.lit(""))
    if k in ("int", "float"):
        return col.isNull() | (col == F.lit(0))
    if k == "bool":
        return col.isNull() | (~col)
    if k == "timestamp":
        # Go's zero time.Time marshals to year 1; treat it as zero too.
        return col.isNull() | (col == F.lit(_GO_ZERO_TIME).cast("timestamp"))
    if k == "date":
        return col.isNull() | (col == F.lit("0001-01-01").cast("date"))
    # arrays/maps/structs/binary: nil slice/map is zero, empty non-nil is NOT
    # (data/value_test.go:150-155) — in Spark only null is distinguishable.
    return col.isNull()


def required(col: Column, dtype: T.DataType) -> Column:
    return ~is_zero(col, dtype)


def as_string(col: Column, dtype: T.DataType) -> Column:
    """Value().String() equivalent: lenient cast, null → zero string."""
    k = kind(dtype)
    if k == "string":
        return F.coalesce(col, F.lit(""))
    if k == "bool":
        return F.when(col.isNull(), "false").when(col, "true").otherwise("false")
    if k == "int":
        return F.coalesce(col.cast("string"), F.lit("0"))
    if k == "float":
        # Go's cast.ToStringE(15.0) == "15"; Spark's cast gives "15.0".
        whole = col.cast("long")
        s = F.when(col.isNotNull() & (col == whole.cast("double")), whole.cast("string")) \
             .otherwise(col.cast("string"))
        return F.coalesce(s, F.lit("0"))
    return F.coalesce(col.cast("string"), F.lit(""))


def num_col(col: Column, dtype: T.DataType) -> Column:
    """Numeric view with null → 0 (nil numeric pointer casts to 0 in Go)."""
    return F.coalesce(col, F.lit(0).cast(dtype))


# ------------------------------------------------------------- param coercion

def param_int(name: str, p: str) -> int:
    try:
        return int(p)
    except ValueError as exc:
        raise CompileError(f"rule {name!r}: param {p!r} is not an int") from exc


def param_num(name: str, p: str) -> float:
    try:
        return float(p)
    except ValueError as exc:
        raise CompileError(f"rule {name!r}: param {p!r} is not numeric") from exc


def is_intlike(p: str) -> bool:
    try:
        int(p)
        return True
    except ValueError:
        return False


# --------------------------------------------------------------- comparisons

_OPS: dict[str, Callable[[Column, Column], Column]] = {
    "eq": operator.eq,
    "ne": operator.ne,
    "gt": operator.gt,
    "gte": operator.ge,
    "lt": operator.lt,
    "lte": operator.le,
}


def compare_lit(op: str, col: Column, dtype: T.DataType, param: str, rule: str) -> Column:
    """compareValue(ct, value, NewValue(param)) — rule/validators.go:73-136.

    * numeric column: param must cast to a number;
    * string column + int-castable param: compares byte length (Go ``len``);
    * string column + other param: lexicographic string compare;
    * array column: compares size.
    """
    f = _OPS[op]
    k = kind(dtype)
    if k in ("int", "float"):
        return f(num_col(col, dtype), F.lit(param_num(rule, param)))
    if k == "string":
        if is_intlike(param):
            return f(F.octet_length(F.coalesce(col, F.lit(""))), F.lit(int(param)))
        return f(F.coalesce(col, F.lit("")), F.lit(param))
    if k == "array":
        return f(F.size(F.coalesce(col, F.array())), F.lit(param_int(rule, param)))
    if k == "bool":
        # Engine extension: Go's compareValue hard-errors on bool
        # (validators.go:128-135 default branch), but conditional
        # constraints over boolean flag columns (FIXTURES.md F6:
        # required_if=required,true) need eq/ne; other ops stay errors.
        if op in ("eq", "ne"):
            pl = param.strip().lower()
            if pl in ("true", "1"):
                b = True
            elif pl in ("false", "0"):
                b = False
            else:
                raise CompileError(f"rule {rule!r}: param {param!r} is not a bool")
            return f(F.coalesce(col, F.lit(False)), F.lit(b))
        raise CompileError(f"rule {rule!r}: unsupported comparison on bool column")
    if k in ("timestamp", "date"):
        return f(col, F.lit(param).cast("timestamp" if k == "timestamp" else "date"))
    raise CompileError(f"rule {rule!r}: unsupported type for comparison: {dtype}")


def compare_field(op: str, col: Column, dtype: T.DataType,
                  other: Column, other_dtype: T.DataType, rule: str) -> Column:
    """compareValue between two same-row columns (rule/field.go:9-27)."""
    f = _OPS[op]
    k = kind(dtype)
    ok = kind(other_dtype)
    if k in ("int", "float"):
        return f(num_col(col, dtype), num_col(other, other_dtype).cast("double"))
    if k == "string":
        if ok in ("int", "float"):
            # Go: cast.ToE[int](other) succeeds → length compare.
            return f(F.octet_length(F.coalesce(col, F.lit(""))),
                     num_col(other, other_dtype).cast("int"))
        return f(F.coalesce(col, F.lit("")), F.coalesce(other.cast("string"), F.lit("")))
    if k == "array":
        return f(F.size(F.coalesce(col, F.array())), num_col(other, other_dtype).cast("int"))
    if k in ("timestamp", "date"):
        return f(col, other.cast("timestamp" if k == "timestamp" else "date"))
    raise CompileError(f"rule {rule!r}: unsupported type for comparison: {dtype}")




def strict_anchor(pattern: str) -> str:
    r"""Java's `$` matches before a trailing newline; Go's (RE2) does not.
    Rewrite a final `$` to `\z` so rlike matches Go semantics on content
    with trailing newlines (critical for source-code columns)."""
    if pattern.endswith("$") and not pattern.endswith(r"\$"):
        return pattern[:-1] + r"\z"
    return pattern


def java_escape_char_class(chars: str) -> str:
    """Escape a literal character set for use inside a Java regex [...]."""
    out = []
    for ch in chars:
        if ch in r"\^]-[&":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)
