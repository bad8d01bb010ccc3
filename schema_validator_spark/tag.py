"""Constraint tag grammar — parses the reference's compact rule-spec strings.

Grammar (reference: tag/tag.go:19-25): rules split by ``|``, rule name and
params separated by ``=``, params separated by ``,``.  A ``|`` *inside* a
param list is kept as part of the param unless the following segment looks
like a new rule name (heuristic at tag/tag.go:57-75) — e.g.
``"oneof=a|b|required"`` parses as ``oneof=[a|b]`` then ``required``.

This module is pure Python (driver-side only); it never touches Spark.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Rule:
    name: str
    params: tuple[str, ...] = field(default_factory=tuple)


def _is_validator_name(s: str) -> bool:
    """A bare rule name: starts with a letter, then letters/underscores.

    Mirrors tag/tag.go:121-140 (``isValidatorName``).
    """
    s = s.strip()
    if not s:
        return False
    first = s[0]
    if not (("a" <= first <= "z") or ("A" <= first <= "Z")):
        return False
    for ch in s[1:]:
        if not (("a" <= ch <= "z") or ("A" <= ch <= "Z") or ch == "_"):
            return False
    return True


def _parse_rule(rule_str: str, name_param_sep: str, params_sep: str) -> Rule:
    rule_str = rule_str.strip()
    before, sep, after = rule_str.partition(name_param_sep)
    if sep:
        raw = after.strip()
        params = tuple(
            p.strip() for p in raw.split(params_sep) if p.strip()
        ) if raw else ()
        return Rule(before.strip(), params)
    return Rule(rule_str, ())


def parse(
    tag: str,
    *,
    rule_splitter: str = "|",
    name_param_sep: str = "=",
    params_sep: str = ",",
) -> list[Rule]:
    """Parse a constraint tag string into an ordered rule list.

    Reference semantics: tag/tag.go:42-92, including the in-param ``|``
    heuristic: once inside a param (after ``=``), a ``|`` only terminates
    the rule when the next ``|``-delimited segment either contains ``=``
    or is a plain validator name.
    """
    if not tag:
        return []

    rules: list[Rule] = []
    current = ""
    in_param = False

    i = 0
    n = len(tag)
    while i < n:
        ch = tag[i]
        if ch == name_param_sep:
            in_param = True
            current += ch
        elif ch == rule_splitter:
            if in_param:
                next_part = ""
                j = i + 1
                while j < n and tag[j] != rule_splitter:
                    next_part += tag[j]
                    j += 1
                if name_param_sep not in next_part and not _is_validator_name(next_part):
                    current += ch
                else:
                    in_param = False
                    if current:
                        rules.append(_parse_rule(current, name_param_sep, params_sep))
                        current = ""
            else:
                if current:
                    rules.append(_parse_rule(current, name_param_sep, params_sep))
                    current = ""
        else:
            current += ch
        i += 1

    if current:
        rules.append(_parse_rule(current, name_param_sep, params_sep))

    return rules
