"""Spec-from-class — entry point A of the reference (``New(User{})``,
validator.go:15-22 / parser.go:58-122) re-expressed over Python
dataclasses: rule tags live in ``field(metadata={"validate": ...})``,
nested dataclasses recurse into dotted column paths, ``"-"`` skips a
field (parser.go:110-112), and ``metadata["name"]`` overrides the
display name (the json/param/query tag resolution, parser.go:310-331).

    @dataclass
    class Contact:
        email: str = field(metadata={"validate": "required|email"})
        age: int = field(metadata={"validate": "gte=18"})

    @dataclass
    class User:
        name: str = field(metadata={"validate": "required|min=2",
                                    "name": "Name"})
        contact: Contact = field(default=None)

    spec, labels = from_dataclass(User)
    # spec   == {"name": "required|min=2",
    #            "contact.email": "required|email", "contact.age": "gte=18"}
    # labels == {"name": "Name"}

    engine_from_dataclass(User, key_cols=["id"])   # ready-to-run engine
"""

from __future__ import annotations

import dataclasses

from .errors import CompileError

SKIP = "-"


def from_dataclass(cls) -> tuple[dict[str, str], dict[str, str]]:
    """(spec, field_labels) from a dataclass tree."""
    if not dataclasses.is_dataclass(cls):
        raise CompileError(f"{cls!r} is not a dataclass")
    spec: dict[str, str] = {}
    labels: dict[str, str] = {}
    _walk(cls, prefix="", spec=spec, labels=labels, seen=set())
    return spec, labels


def _walk(cls, *, prefix: str, spec: dict, labels: dict, seen: set) -> None:
    if cls in seen:  # self-referential dataclasses would recurse forever
        raise CompileError(f"recursive dataclass {cls.__name__!r} in spec")
    seen = seen | {cls}
    import typing

    try:  # resolve postponed (string) annotations
        hints = typing.get_type_hints(cls)
    except Exception:
        hints = {}
    for f in dataclasses.fields(cls):
        tag = f.metadata.get("validate")
        if tag == SKIP:
            continue
        path = f"{prefix}{f.name}"
        ftype = hints.get(f.name, f.type)
        # typing.Optional[X] / unions: validate the dataclass member if any
        inner = _unwrap_optional(ftype)
        if dataclasses.is_dataclass(inner):
            if tag:
                raise CompileError(
                    f"{path}: rules on a nested-dataclass field belong on "
                    f"its members (object-level rules: use builder/Object)"
                )
            _walk(inner, prefix=f"{path}.", spec=spec, labels=labels, seen=seen)
            continue
        if tag:
            spec[path] = tag
        if "name" in f.metadata:
            labels[path] = f.metadata["name"]


# String annotations we can safely call scalars when get_type_hints
# failed for the class (one unresolvable annotation anywhere makes ALL
# annotations come back as strings — the common builtins must keep
# working then).
_SCALAR_ANNOTATIONS = {
    "str", "int", "float", "bool", "bytes", "bytearray", "complex",
    "None", "NoneType", "object", "Any", "typing.Any",
    "date", "datetime", "Decimal", "datetime.date", "datetime.datetime",
    "decimal.Decimal",
}

# Container spellings that can never BE a nested dataclass themselves
# ('list[str]', 'Dict[str, int]', bare 'dict', ...).  Such a field keeps
# its own rule tag (treated as a scalar leaf) instead of failing compile —
# only an unknown bare name could hide a nested dataclass whose member
# rules would silently vanish.
_CONTAINER_HEADS = {
    "list", "dict", "set", "tuple", "frozenset",
    "List", "Dict", "Set", "Tuple", "FrozenSet",
    "Sequence", "Mapping", "MutableMapping", "Iterable",
}


def _is_container_annotation(name: str) -> bool:
    head = name.split("[", 1)[0].strip()
    if head.startswith("typing."):
        head = head[len("typing."):]
    return head in _CONTAINER_HEADS


def _unwrap_optional(t):
    import types
    import typing

    if isinstance(t, str):
        # Postponed annotation that get_type_hints could not resolve.
        # Recognizable scalars (incl. 'Optional[str]' / 'str | None'
        # spellings) stay scalars; anything else COULD be a nested
        # dataclass whose member rules would silently vanish — fail loud.
        base = t.strip()
        if base.startswith("Optional[") and base.endswith("]"):
            base = base[len("Optional["):-1].strip()
        elif base.startswith("typing.Optional[") and base.endswith("]"):
            base = base[len("typing.Optional["):-1].strip()
        parts = [p.strip() for p in base.split("|")]
        names = [p for p in parts if p not in ("None", "NoneType")]
        if all(n in _SCALAR_ANNOTATIONS or _is_container_annotation(n) for n in names):
            return None  # scalar: caller keeps any rule tag on the field
        raise CompileError(
            f"unresolvable annotation {t!r}: import the referenced type "
            f"into the dataclass module or avoid postponed annotations"
        )
    origin = typing.get_origin(t)
    # typing.Optional[X] (origin Union) and PEP 604 'X | None'
    # (origin types.UnionType) both unwrap to X.
    if origin is typing.Union or origin is types.UnionType:
        args = [a for a in typing.get_args(t) if a is not type(None)]
        if len(args) == 1:
            return args[0]
    return t


def engine_from_dataclass(cls, **engine_kwargs):
    """New(prototype) analog: dataclass → compiled-once ValidationEngine."""
    from .engine import ValidationEngine

    spec, labels = from_dataclass(cls)
    if not spec:
        raise CompileError(f"{cls.__name__}: no validate metadata found")
    return ValidationEngine(spec, field_labels=labels, **engine_kwargs)
