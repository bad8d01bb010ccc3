"""Built-in rule pack — mirrors RegisterDefault (rule/validators.go:15-22),
which installs the six rule families: compare, field, format, network,
other (presence/misc), string."""

from __future__ import annotations


def install_all(registry, *, parity_stubs: bool = True) -> None:
    # imported lazily to avoid a registry<->rules import cycle
    from . import compare, fields, formats, network, presence, strings

    compare.install(registry)
    fields.install(registry)
    formats.install(registry)
    network.install(registry)
    presence.install(registry)
    strings.install(registry)
    if not parity_stubs:
        _install_engine_mode(registry)


def _install_engine_mode(registry) -> None:
    """Replace the reference's always-pass stubs with real checks
    (SURVEY.md risk register: parity mode keeps fixture byte-matching
    honest; engine mode is what a user actually wants).

    * uuidN_rfc4122 (stubs at format.go:466-492) -> same check as uuidN
      (RFC 4122 regex + version digit).
    * postcode_iso3166_alpha2_field (stub at format.go:408-411) ->
      the generic postcode length shape of its non-_field sibling.
    * unique (stub at other.go:311-316) -> hard CompileError pointing at
      the table-level operator: silently passing hides a table-level
      check; failing the compile is the honest engine behavior.
    """
    from pyspark.sql import functions as F

    from ..errors import CompileError
    from .formats import _UUID_RE
    from ._helpers import as_string

    for ver in ("3", "4", "5"):
        def _uuid_v(ctx, params, _v=ver):
            s = as_string(ctx.col, ctx.dtype)
            return s.rlike(_UUID_RE) & (F.substring(s, 15, 1) == _v)

        registry.register(f"uuid{ver}_rfc4122", _uuid_v)

    def _postcode(ctx, params):
        return F.octet_length(as_string(ctx.col, ctx.dtype)).between(3, 10)

    registry.register("postcode_iso3166_alpha2_field", _postcode,
                      min_params=0, max_params=None)

    def _unique(ctx, params):
        raise CompileError(
            "'unique' is table-level: use "
            "schema_validator_spark.operators.uniqueness (the reference "
            "stubs it to always-pass; engine mode refuses to pretend)"
        )

    registry.register("unique", _unique)
