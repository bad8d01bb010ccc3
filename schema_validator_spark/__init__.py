"""schema_validator_spark — a PySpark-native schema + constraint
validation engine.

From-scratch generalization of weilence/schema-validator's rule model
(161 named predicates, tag grammar, zero-value semantics) into
declarative column-level constraints compiled to Spark SQL expressions,
plus the table-level checks the reference lacks: uniqueness, referential
integrity, distribution drift, checkpoint/resume — designed for
Iceberg/parquet source-code tables at 10^12-file scale.
"""

from .engine import ValidationEngine, ValidationResult
from .registry import Registry, RuleContext, default_registry
from .errors import CompileError
from .tag import Rule, parse as parse_tag

__all__ = [
    "ValidationEngine",
    "ValidationResult",
    "Registry",
    "RuleContext",
    "default_registry",
    "CompileError",
    "Rule",
    "parse_tag",
]

__version__ = "0.1.0"
