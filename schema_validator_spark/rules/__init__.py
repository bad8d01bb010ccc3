"""Built-in rule pack — mirrors RegisterDefault (rule/validators.go:15-22),
which installs the six rule families: compare, field, format, network,
other (presence/misc), string."""

from __future__ import annotations


def install_all(registry) -> None:
    # imported lazily to avoid a registry<->rules import cycle
    from . import compare, fields, formats, network, presence, strings

    compare.install(registry)
    fields.install(registry)
    formats.install(registry)
    network.install(registry)
    presence.install(registry)
    strings.install(registry)
