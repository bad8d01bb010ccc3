"""Validation engine: spec + DataFrame → (annotated, violations, summary).

The reference's lifecycle (validator.go:32-49: bind schema once, walk the
value, collect errors) becomes: compile the spec once on the driver, add a
single ``_fails`` array column in one wide projection (single scan pass),
then fork two cheap branches:

* violations — ``explode(_fails)`` keyed by the caller's key columns
  (the analog of ValidationErrors, schema/error.go:11-21);
* summary — per-partition pass/fail aggregate (the analog of the single
  nil-or-error result, validator.go:43-48, generalized per north_rule).

Scale design: the projection is pure whole-stage codegen (regex + boolean
forest), the only shuffle is the summary groupBy (map-side partial agg),
and both branches share one scan when the caller caches or writes the
annotated frame.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .compiler import CompiledPlan, compile_spec
from .registry import Registry
from .errors import CompileError


FAILS_COL = "_fails"


@dataclass
class ValidationResult:
    annotated: DataFrame
    key_cols: list[str]
    partition_cols: list[str]

    @cached_property
    def violations(self) -> DataFrame:
        """One row per failed check: (*key_cols, field, code, params)."""
        v = self.annotated.select(
            *self.key_cols, F.explode(FAILS_COL).alias("_v")
        )
        return v.select(
            *self.key_cols,
            F.col("_v.field").alias("field"),
            F.col("_v.code").alias("code"),
            F.col("_v.params").alias("params"),
        )

    @cached_property
    def summary(self) -> DataFrame:
        """Per-partition pass/fail rollup (map-side combinable)."""
        n_fails = F.size(F.col(FAILS_COL))
        g = self.annotated.groupBy(*self.partition_cols) if self.partition_cols \
            else self.annotated.groupBy()
        return g.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((n_fails > 0).cast("long")).alias("n_rows_failed"),
            F.sum(n_fails.cast("long")).alias("n_violations"),
        ).withColumn(
            "pass_rate",
            F.round(1.0 - F.col("n_rows_failed") / F.col("n_rows"), 6),
        )

    def violations_observed(self, partition_values: list | None = None):
        """Single-job pattern: the violations DataFrame with an attached
        ``Observation`` that yields the summary as job metrics — one scan
        produces BOTH outputs (the two-branch form pays a second full
        scan, or a persist, for the summary).

        Works when the first partition_col has small known cardinality
        (e.g. ``lang`` from a ``oneof`` rule): per-value conditional
        aggregates + an ``__other__`` bucket.  With no partition_cols the
        observation is the three global counters.

        Returns (violations_df, observation); read
        ``observation.get`` AFTER an action on violations_df.  Keys:
        ``{value}::n_rows / n_rows_failed / n_violations``.
        """
        from pyspark.sql import Observation

        n_fails = F.size(F.col(FAILS_COL))
        aggs: list[Column] = []

        def three(pred, tag: str):
            m = F.when(pred, 1).otherwise(0) if pred is not None else F.lit(1)
            mf = m * (n_fails > 0).cast("int")
            mv = F.when(pred, n_fails).otherwise(0) if pred is not None else n_fails
            aggs.append(F.sum(m).alias(f"{tag}::n_rows"))
            aggs.append(F.sum(mf).alias(f"{tag}::n_rows_failed"))
            aggs.append(F.sum(mv.cast("long")).alias(f"{tag}::n_violations"))

        if partition_values and self.partition_cols:
            pcol = F.col(self.partition_cols[0])
            for v in partition_values:
                three(pcol == F.lit(v), str(v))
            three(~pcol.isin(*partition_values) | pcol.isNull(), "__other__")
        else:
            three(None, "__all__")

        obs = Observation()
        observed = self.annotated.observe(obs, *aggs)
        v = observed.select(
            *self.key_cols, F.explode(F.col(FAILS_COL)).alias("_v")
        ).select(
            *self.key_cols,
            F.col("_v.field").alias("field"),
            F.col("_v.code").alias("code"),
            F.col("_v.params").alias("params"),
        )
        return v, obs

    def violation_counts(self) -> DataFrame:
        """Per-(field, code) violation counts — error-code introspection
        (the HasErrorCode/HasFieldError analog, schema/error.go:65-83)."""
        return (
            self.annotated.select(F.explode(FAILS_COL).alias("_v"))
            .groupBy(F.col("_v.field").alias("field"), F.col("_v.code").alias("code"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def is_valid(self) -> bool:
        """Driver-side: True iff zero violations (the nil-error analog)."""
        row = self.annotated.select(
            F.sum(F.size(F.col(FAILS_COL)).cast("long")).alias("n")
        ).first()
        return (row["n"] or 0) == 0

    # -- error introspection (schema/error.go:65-93 analogs) ---------------

    def has_field_error(self, field: str) -> bool:
        """HasFieldError: any violation on this field path (error.go:65-73)."""
        return self.violations.filter(F.col("field") == field).limit(1).count() > 0

    def has_error_code(self, code: str) -> bool:
        """HasErrorCode (error.go:75-83)."""
        return self.violations.filter(F.col("code") == code).limit(1).count() > 0

    def translated(self, lang: str = "en") -> DataFrame:
        """Translate (error.go:85-93): violations + rendered ``message``
        column — pure expression, composes with any sink."""
        from .i18n import message_column

        return self.violations.withColumn("message", message_column(lang))


class ValidationEngine:
    """Compile-once, run-many validation over DataFrames.

    Parameters
    ----------
    spec : {column: tag-string | rule list}
        Constraint spec in the reference's tag grammar (tag/tag.go:19-25),
        e.g. ``{"commit": "required|len=40|hexadecimal|lowercase"}``.
    key_cols : columns identifying a row in the violations output.
    partition_cols : columns to roll the summary up by.
    derived : {name: Column} computed columns added before rule eval
        (e.g. ``{"content_sha256": F.sha2(F.col("content"), 256)}``).
    """

    def __init__(
        self,
        spec: Mapping[str, object],
        *,
        key_cols: list[str] | None = None,
        partition_cols: list[str] | None = None,
        derived: Mapping[str, Column] | None = None,
        registry: Registry | None = None,
        allow_driver_only: bool = False,
        field_labels: Mapping[str, str] | None = None,
    ) -> None:
        if registry is None:
            from .registry import default_registry

            registry = default_registry()
        self.spec = dict(spec)
        self.key_cols = list(key_cols or [])
        self.partition_cols = list(partition_cols or [])
        self.derived = dict(derived or {})
        self.registry = registry
        self.allow_driver_only = allow_driver_only
        self.field_labels = dict(field_labels or {})

    # -- plan construction --------------------------------------------------

    def _with_derived(self, df: DataFrame) -> DataFrame:
        for name, col in self.derived.items():
            df = df.withColumn(name, col)
        return df

    def compile(self, df: DataFrame) -> CompiledPlan:
        return compile_spec(
            self.spec,
            self._with_derived(df).schema,
            self.registry,
            allow_driver_only=self.allow_driver_only,
            field_labels=self.field_labels,
        )

    def annotate(self, df: DataFrame) -> DataFrame:
        """df + ``_fails`` array column — the single-pass wide projection."""
        prepared = self._with_derived(df)
        plan = self.compile(df)
        return prepared.withColumn(FAILS_COL, plan.fails_column())

    def run(self, df: DataFrame) -> ValidationResult:
        missing = [c for c in self.key_cols if c not in df.columns]
        if missing:
            raise CompileError(f"key_cols not in DataFrame: {missing}")
        return ValidationResult(
            annotated=self.annotate(df),
            key_cols=self.key_cols,
            partition_cols=self.partition_cols,
        )
