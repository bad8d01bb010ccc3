"""Fluent spec builders — the code-built schema entry point.

Mirrors the reference's SchemaBuilder surface (builder.go:15-72;
entry point B in SURVEY.md §3): ``Object()/Field()/Array()``,
``Required()/Optional()``, ``AddValidator``, ``WithField``/``FieldName``,
and duplicate-field merge (schema/object.go:85-93 mergeSchema).  The
output is a plain ``{column: [Rule, ...]}`` spec plus a field-label map,
consumable by :class:`~schema_validator_spark.engine.ValidationEngine`:

    spec = (
        Object()
        .with_field("email", Field().required().rule("email"))
        .with_field("age", Field().rule("gte", 0))
        .with_field("items", Array().rule("min", 1).dive(Field().rule("min", 3)))
        .field_name("email", "E-Mail")
    )
    engine = spec.engine(key_cols=["id"])        # or spec.build() for the dict
"""

from __future__ import annotations

from typing import Mapping

from .errors import CompileError
from .tag import Rule


class Field:
    """Rule list for a scalar column (FieldSchemaBuilder, builder.go:29-52)."""

    def __init__(self) -> None:
        self._rules: list[Rule] = []

    def rule(self, name: str, *params) -> "Field":
        """AddValidator(name, params...) — builder.go:48-52."""
        self._rules.append(Rule(name, tuple(str(p) for p in params)))
        return self

    def required(self) -> "Field":
        """Required() — prepends required unless present (builder.go:36-40)."""
        if not any(r.name == "required" for r in self._rules):
            self._rules.insert(0, Rule("required", ()))
        return self

    def optional(self) -> "Field":
        """Optional() — drops required (builder.go:42-45)."""
        self._rules = [r for r in self._rules if r.name != "required"]
        return self

    def omitempty(self) -> "Field":
        if not any(r.name == "omitempty" for r in self._rules):
            self._rules.insert(0, Rule("omitempty", ()))
        return self

    def rules(self) -> list[Rule]:
        return list(self._rules)


class Array(Field):
    """Array column: rules before ``dive`` bound the array itself, the
    dived Field's rules apply per element (ArraySchemaBuilder + DiveTag,
    builder.go:15-27, parser.go:129-154)."""

    def __init__(self) -> None:
        super().__init__()
        self._element: Field | None = None

    def dive(self, element: Field) -> "Array":
        self._element = element
        return self

    def rules(self) -> list[Rule]:
        out = list(self._rules)
        if self._element is not None:
            out.append(Rule("dive", ()))
            out.extend(self._element.rules())
        return out


class Object:
    """Top-level spec builder (ObjectSchemaBuilder, builder.go:15-27)."""

    def __init__(self) -> None:
        self._fields: dict[str, list[Rule]] = {}
        self._labels: dict[str, str] = {}

    def with_field(self, name: str, field: Field | str) -> "Object":
        """WithField — duplicate names MERGE validator lists, matching
        mergeSchema (schema/object.go:85-93,121-152)."""
        rules = field.rules() if isinstance(field, Field) else _parse(field)
        self._fields.setdefault(name, []).extend(rules)
        return self

    # builder.go spells it AddField in the legacy package; keep an alias
    add_field = with_field

    def field_name(self, column: str, display: str) -> "Object":
        """FieldName — display name used in violation rows
        (fieldNameMap, schema/object.go:13,100-103)."""
        self._labels[column] = display
        return self

    def build(self) -> dict[str, list[Rule]]:
        if not self._fields:
            raise CompileError("empty Object(): no fields declared")
        return {k: list(v) for k, v in self._fields.items()}

    @property
    def labels(self) -> Mapping[str, str]:
        return dict(self._labels)

    def engine(self, **engine_kwargs):
        """NewFromSchema analog: bind the built spec to an engine."""
        from .engine import ValidationEngine

        return ValidationEngine(
            self.build(), field_labels=self._labels, **engine_kwargs
        )


def _parse(tag_string: str) -> list[Rule]:
    from .tag import parse

    return parse(tag_string)
