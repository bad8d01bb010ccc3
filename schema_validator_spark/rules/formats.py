"""Format rules (reference: rule/format.go, 677 LoC).

Regex-backed rules lift the reference's patterns verbatim (Go RE2 and
Java regex agree on every pattern used here; cited per rule).  The
algorithmic rules (Luhn, ISBN, ISSN) are pure Spark SQL higher-order
functions — ``transform``/``aggregate`` over a char array — so checksum
validation stays JVM-side with zero Python.  Only ``email`` needs a
vectorized pandas UDF (Go uses net/mail RFC-5322 parsing,
format.go:186-193, which no regex reproduces faithfully).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..registry import Registry, RuleContext
from ._helpers import strict_anchor, as_string


def _s(ctx: RuleContext) -> Column:
    return as_string(ctx.col, ctx.dtype)


def _regex_rule(pattern: str):
    pattern = strict_anchor(pattern)

    def factory(ctx: RuleContext, params: tuple[str, ...]) -> Column:
        return _s(ctx).rlike(pattern)

    return factory


# Patterns copied character-for-character from rule/format.go (loc in name).
_REGEX_RULES = {
    "bic": r"^[A-Z]{6}[A-Z0-9]{2}([A-Z0-9]{3})?$",                 # format.go:44
    "bic_iso_9362_2014": r"^[A-Z]{6}[A-Z0-9]{2}([A-Z0-9]{3})?$",
    "bcp47_language_tag": r"^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$",  # :61
    "btc_addr": r"^[13][a-km-zA-HJ-NP-Z1-9]{25,34}$",              # :70
    "btc_addr_bech32": r"^bc1[a-z0-9]{39,59}$",                    # :79
    "mongodb": r"^[a-fA-F0-9]{24}$",                               # :120
    "mongodb_connection_string": r"^mongodb(\+srv)?://.*$",        # :129
    "cron": r"^(@(annually|yearly|monthly|weekly|daily|midnight|hourly))|(((\d+,)+\d+|(\d+(\/|-)\d+)|\d+|\*|\?) ?){5,7}$",  # :138
    "e164": r"^\+[1-9]\d{1,14}$",                                  # :168
    "ein": r"^\d{2}-\d{7}$",                                       # :177
    "eth_addr": r"^0x[a-fA-F0-9]{40}$",                            # :195
    "hexadecimal": r"^[0-9a-fA-F]+$",                              # :204
    "hexcolor": r"^#([0-9a-fA-F]{3}|[0-9a-fA-F]{6})$",             # :213
    "hsl": r"^hsl\(\d+,\s*\d+%,\s*\d+%\)$",                        # :222
    "hsla": r"^hsla\(\d+,\s*\d+%,\s*\d+%,\s*[\d.]+\)$",            # :231
    "html": r"<[^>]+>",                                            # :240 (substring)
    "iso3166_1_alpha2": r"^[A-Z]{2}$",                             # :295
    "iso3166_1_alpha3": r"^[A-Z]{3}$",                             # :304
    "iso3166_1_alpha_numeric": r"^\d{3}$",                         # :313
    "iso3166_2": r"^[A-Z]{2}-[A-Z0-9]{1,3}$",                      # :322
    "iso4217": r"^[A-Z]{3}$",                                      # :331
    "jwt": r"^[A-Za-z0-9-_]+\.[A-Za-z0-9-_]+\.[A-Za-z0-9-_]*$",    # :351
    "rgb": r"^rgb\(\d+,\s*\d+,\s*\d+\)$",                          # :413
    "rgba": r"^rgba\(\d+,\s*\d+,\s*\d+,\s*[\d.]+\)$",              # :422
    "ssn": r"^\d{3}-\d{2}-\d{4}$",                                 # :431
    "md4": r"^[a-fA-F0-9]{32}$",                                   # :502
    "md5": r"^[a-fA-F0-9]{32}$",                                   # :511
    "sha256": r"^[a-fA-F0-9]{64}$",                                # :520
    "sha384": r"^[a-fA-F0-9]{96}$",                                # :529
    "sha512": r"^[a-fA-F0-9]{128}$",                               # :538
    "ripemd128": r"^[a-fA-F0-9]{32}$",                             # :547
    "ripemd160": r"^[a-fA-F0-9]{40}$",                             # :556
    "tiger128": r"^[a-fA-F0-9]{32}$",                              # :565
    "tiger160": r"^[a-fA-F0-9]{40}$",                              # :574
    "tiger192": r"^[a-fA-F0-9]{48}$",                              # :583
    "semver": r"^v?(0|[1-9]\d*)\.(0|[1-9]\d*)\.(0|[1-9]\d*)(?:-((?:0|[1-9]\d*|\d*[a-zA-Z-][0-9a-zA-Z-]*)(?:\.(?:0|[1-9]\d*|\d*[a-zA-Z-][0-9a-zA-Z-]*))*))?(?:\+([0-9a-zA-Z-]+(?:\.[0-9a-zA-Z-]+)*))?$",  # :592
    "ulid": r"^[0-9A-HJKMNP-TV-Z]{26}$",                           # :601
    "cve": r"^CVE-\d{4}-\d{4,}$",                                  # :610
}

_UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"  # :449


# -------------------------------------------------------- checksum cores (SQL)

def _chars(s: Column) -> Column:
    return F.split(s, "")


def _luhn_sum(s: Column) -> Column:
    """Luhn over raw bytes: int(ch - '0') with NO digit pre-check — exactly
    the reference's byte arithmetic (format.go:378-397), so non-digits
    contribute garbage, matching Go bit-for-bit."""
    rev = _chars(F.reverse(s))
    digits = F.transform(
        rev,
        lambda c, i: F.when(
            i % 2 == 1,
            F.when((F.ascii(c) - 48) * 2 > 9, (F.ascii(c) - 48) * 2 - 9)
            .otherwise((F.ascii(c) - 48) * 2),
        ).otherwise(F.ascii(c) - 48),
    )
    return F.aggregate(digits, F.lit(0), lambda acc, x: acc + x)


def _luhn_ok(s: Column) -> Column:
    # Go: empty string → zero-iteration loop → sum 0 → passes.
    return (s == F.lit("")) | (_luhn_sum(s) % 10 == 0)


def _isbn10_ok(s: Column) -> Column:
    """Weighted mod-11 (format.go:621-640): digit*(10-i); 'X' only legal at
    i==9 where it contributes 10."""
    shape = s.rlike(r"^[0-9]{9}[0-9X]\z")
    weighted = F.transform(
        _chars(s),
        lambda c, i: F.when(c == "X", F.lit(10)).otherwise((F.ascii(c) - 48) * (10 - i)),
    )
    total = F.aggregate(weighted, F.lit(0), lambda acc, x: acc + x)
    return shape & (total % 11 == 0)


def _isbn13_ok(s: Column) -> Column:
    """Alternating 1/3 weights mod-10 (format.go:642-657)."""
    shape = s.rlike(r"^[0-9]{13}\z")
    weighted = F.transform(
        _chars(s),
        lambda c, i: F.when(i % 2 == 0, F.ascii(c) - 48).otherwise((F.ascii(c) - 48) * 3),
    )
    total = F.aggregate(weighted, F.lit(0), lambda acc, x: acc + x)
    return shape & (total % 10 == 0)


def _issn_ok(s: Column) -> Column:
    """Regex gate then mod-11 with weights (8-i); X at i==7 → 10
    (format.go:286-293 + :659-677)."""
    shape = s.rlike(r"^\d{4}-\d{3}[\dX]\z")
    stripped = F.replace(s, F.lit("-"), F.lit(""))
    weighted = F.transform(
        _chars(stripped),
        lambda c, i: F.when(c == "X", F.lit(10)).otherwise((F.ascii(c) - 48) * (8 - i)),
    )
    total = F.aggregate(weighted, F.lit(0), lambda acc, x: acc + x)
    return shape & (total % 11 == 0)


def _strip_card(s: Column) -> Column:
    return F.replace(F.replace(s, F.lit(" "), F.lit("")), F.lit("-"), F.lit(""))


# ----------------------------------------------------------------- email UDF

def _email_factory(ctx: RuleContext, params: tuple[str, ...]) -> Column:
    """RFC-5322 address parse parity with Go net/mail (format.go:186-193).

    Vectorized pandas UDF (Arrow-batched); accepts ``Name <a@b>`` display
    forms like Go does.  Residual divergence: Python's parser is laxer on
    some exotic quoted-string forms — documented, not load-bearing.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _email_ok(s: pd.Series) -> pd.Series:
        from email.utils import parseaddr

        def chk(v: str | None) -> bool:
            if not v:
                return False
            name, addr = parseaddr(v)
            if not addr or "@" not in addr:
                return False
            local, _, domain = addr.rpartition("@")
            if not local or not domain:
                return False
            if any(ch.isspace() for ch in addr):
                return False
            # Go requires a sane domain: at least one char, no leading dot.
            if domain.startswith(".") or domain.endswith("."):
                return False
            return True

        return s.fillna("").map(chk)

    return _email_ok(_s(ctx))


def install(r: Registry) -> None:
    for name, pattern in _REGEX_RULES.items():
        r.register(name, _regex_rule(pattern))

    # UUIDs: base regex + version digit at byte 14 (format.go:458-492).
    r.register("uuid", _regex_rule(_UUID_RE))
    r.register("uuid_rfc4122", _regex_rule(_UUID_RE))
    for ver in ("3", "4", "5"):
        def _uuid_v(ctx, params, _v=ver):
            s = _s(ctx)
            return s.rlike(_UUID_RE) & (F.substring(s, 15, 1) == _v)

        r.register(f"uuid{ver}", _uuid_v)
        # Always-pass stubs in the reference (format.go:466-492).
        r.register(f"uuid{ver}_rfc4122", lambda ctx, p: F.lit(True))

    # base64 family: Go's strict decoders re-expressed as shape regexes
    # (Spark's try_to_binary is laxer than Go's StdEncoding).
    r.register(
        "base64",
        _regex_rule(r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"),
    )
    r.register(
        "base64url",
        _regex_rule(r"^(?:[A-Za-z0-9_-]{4})*(?:[A-Za-z0-9_-]{2}==|[A-Za-z0-9_-]{3}=)?$"),
    )
    r.register(
        "base64rawurl",
        _regex_rule(r"^(?:[A-Za-z0-9_-]{4})*(?:[A-Za-z0-9_-]{2,3})?$"),
    )

    # checksum rules — pure SQL (see cores above)
    def _credit_card(ctx, params):
        s = _strip_card(_s(ctx))
        shape = F.octet_length(s).between(13, 19) & s.rlike(r"^\p{Nd}+\z")
        return shape & (_luhn_sum(s) % 10 == 0)

    r.register("credit_card", _credit_card)
    r.register("luhn_checksum", lambda ctx, p: _luhn_ok(_s(ctx)))

    def _isbn(ctx, params):
        s = F.replace(_s(ctx), F.lit("-"), F.lit(""))
        n = F.octet_length(s)
        return F.when(n == 10, _isbn10_ok(s)).when(n == 13, _isbn13_ok(s)).otherwise(False)

    r.register("isbn", _isbn)
    r.register(
        "isbn10",
        lambda ctx, p: _isbn10_ok(F.replace(_s(ctx), F.lit("-"), F.lit(""))),
    )
    r.register(
        "isbn13",
        lambda ctx, p: _isbn13_ok(F.replace(_s(ctx), F.lit("-"), F.lit(""))),
    )
    r.register("issn", lambda ctx, p: _issn_ok(_s(ctx)))

    # datetime: RFC3339, else "2006-01-02 15:04:05" (format.go:156-166)
    def _datetime(ctx, params):
        s = _s(ctx)
        parsed = F.coalesce(
            F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
            F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
            F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
            F.try_to_timestamp(s, F.lit("yyyy-MM-dd HH:mm:ss")),
        )
        return parsed.isNotNull()

    r.register("datetime", _datetime)

    r.register("email", _email_factory)

    def _latitude(ctx, params):
        v = _s(ctx).cast("double")
        return v.isNotNull() & v.between(-90.0, 90.0)

    def _longitude(ctx, params):
        v = _s(ctx).cast("double")
        return v.isNotNull() & v.between(-180.0, 180.0)

    r.register("latitude", _latitude)
    r.register("longitude", _longitude)

    def _timezone(ctx, params):
        # Go time.LoadLocation: "" and "Local" load without error (:440-447).
        import zoneinfo

        zones = sorted(zoneinfo.available_timezones()) + ["", "Local"]
        return _s(ctx).isin(*zones)

    r.register("timezone", _timezone)

    # near-stub shape checks (format.go:147-154, :340-349, :249-255, :399-411)
    def _spicedb(ctx, params):
        return _s(ctx).contains("/")

    r.register("spicedb", _spicedb)

    def _json(ctx, params):
        s = _s(ctx)
        return (s.startswith("{") & s.endswith("}")) | (
            s.startswith("[") & s.endswith("]")
        )

    r.register("json", _json)

    def _html_encoded(ctx, params):
        s = _s(ctx)
        return s.contains("&") & s.contains(";")

    r.register("html_encoded", _html_encoded)

    def _postcode(ctx, params):
        return F.octet_length(_s(ctx)).between(3, 10)

    r.register("postcode_iso3166_alpha2", _postcode)
    # Always-pass stub (format.go:408-411).
    r.register("postcode_iso3166_alpha2_field", lambda ctx, p: F.lit(True),
               min_params=0, max_params=None)
