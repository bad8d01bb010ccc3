"""Network rules (reference: rule/network.go, 363 LoC).

Regex-shaped rules are verbatim Spark ``rlike``; IP/CIDR/socket-address
families use ONE Arrow-vectorized pandas UDF apiece built on Python's
``ipaddress`` (exact ``net.ParseIP`` parity incl. the To4() treatment of
IPv4-mapped IPv6).  Divergences, by design, for cluster safety:

* ``tcp_addr``/``udp_addr`` (network.go:217-224,261-268) may DNS-resolve
  in Go — executors must not do network I/O, so here the host must be an
  IP literal (syntactic check only).
* ``uds_exists`` stats the local filesystem — driver_only, like dir/file.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..registry import Registry, RuleContext
from ._helpers import strict_anchor, as_string, num_col


def _s(ctx: RuleContext) -> Column:
    return as_string(ctx.col, ctx.dtype)


def _regex_rule(pattern: str):
    pattern = strict_anchor(pattern)

    def factory(ctx: RuleContext, params: tuple[str, ...]) -> Column:
        return _s(ctx).rlike(pattern)

    return factory


_HOSTNAME_RE = r"^[a-zA-Z0-9]([a-zA-Z0-9-.]{0,61}[a-zA-Z0-9])?$"  # network.go:65


def _ip_udf(mode: str):
    """mode: 'any' | 'v4' | 'v6'.  Go To4() is non-nil for IPv4-mapped
    IPv6 (::ffff:a.b.c.d), so 'v4' accepts those and 'v6' rejects them."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _ok(s: pd.Series) -> pd.Series:
        import ipaddress

        def chk(v):
            if not v:
                return False
            try:
                ip = ipaddress.ip_address(v)
            except ValueError:
                return False
            is4 = ip.version == 4 or (ip.version == 6 and ip.ipv4_mapped is not None)
            if mode == "v4":
                return is4
            if mode == "v6":
                return not is4
            return True

        return s.fillna("").map(chk)

    return _ok


def _cidr_udf(mode: str):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _ok(s: pd.Series) -> pd.Series:
        import ipaddress

        def chk(v):
            if not v or "/" not in v:
                return False
            try:
                # Go ParseCIDR allows host bits set → ip_interface, not
                # strict ip_network (network.go:18-43).
                iface = ipaddress.ip_interface(v)
            except ValueError:
                return False
            ip = iface.ip
            is4 = ip.version == 4 or (ip.version == 6 and ip.ipv4_mapped is not None)
            if mode == "v4":
                return is4
            if mode == "v6":
                return not is4
            return True

        return s.fillna("").map(chk)

    return _ok


def _hostport_udf(mode: str):
    """mode: 'tcp4'|'tcp6'|'ip' — host:port with IP-family constraint.
    Replicates net.SplitHostPort + LookupPort numeric path
    (network.go:182-268); port range 0..65535 like LookupPort."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _ok(s: pd.Series) -> pd.Series:
        import ipaddress

        def split_host_port(v: str):
            # net.SplitHostPort: last colon separates port; [..] wraps v6.
            i = v.rfind(":")
            if i < 0:
                return None
            host, port = v[:i], v[i + 1 :]
            if host.startswith("["):
                if not host.endswith("]"):
                    return None
                host = host[1:-1]
            elif ":" in host:
                # unbracketed extra colons → "too many colons" error in Go
                return None
            return host, port

        def chk(v):
            if not v:
                return False
            hp = split_host_port(v)
            if hp is None:
                return False
            host, port = hp
            if not port.isdigit():
                return False
            p = int(port)
            if p < 0 or p > 65535:
                return False
            try:
                ip = ipaddress.ip_address(host)
            except ValueError:
                return False
            is4 = ip.version == 4 or (ip.version == 6 and ip.ipv4_mapped is not None)
            if mode == "tcp4":
                return is4
            if mode == "tcp6":
                return not is4
            return True

        return s.fillna("").map(chk)

    return _ok


def install(r: Registry) -> None:
    r.register("datauri", _regex_rule(r"^data:[^;]+(;base64)?,.*$"))   # network.go:46
    r.register("hostname", _regex_rule(_HOSTNAME_RE))                  # :65
    r.register("hostname_rfc1123", _regex_rule(_HOSTNAME_RE))          # :74 (same)
    r.register("mac", _regex_rule(r"^([0-9a-fA-F]{2}[:-]){5}[0-9a-fA-F]{2}$"))  # :172
    r.register("url", _regex_rule(r"^https?://[^\s]+$"))               # :300
    r.register("http_url", _regex_rule(r"^https?://[^\s]+$"))          # :310
    r.register("https_url", _regex_rule(r"^https://[^\s]+$"))          # :319
    r.register("urn_rfc2141", _regex_rule(r"^urn:[a-zA-Z0-9][a-zA-Z0-9-]{0,31}:[a-zA-Z0-9()+,.:=@;$_!*'-]+$"))  # :341

    # fqdn: miekg/dns IsFqdn — non-empty, ends with an unescaped '.'
    def _fqdn(ctx, params):
        s = _s(ctx)
        return (s != "") & s.endswith(".") & ~s.endswith("\\.")

    r.register("fqdn", _fqdn)

    def _unix_addr(ctx, params):
        s = _s(ctx)
        return s.startswith("/") | s.startswith("@")

    r.register("unix_addr", _unix_addr)

    def _url_encoded(ctx, params):
        # no spaces + url.QueryUnescape: every % must be %HH (network.go:328)
        s = _s(ctx)
        return ~s.contains(" ") & ~s.rlike(r"%(?![0-9a-fA-F]{2})")

    r.register("url_encoded", _url_encoded)

    def _port(ctx, params):
        # Value().IntE() then 1..65535 (network.go:101-114).  Go returns a
        # hard error on a non-numeric string; here an uncastable value
        # simply fails the check (documented divergence).
        from . import _helpers

        k = _helpers.kind(ctx.dtype)
        v = num_col(ctx.col, ctx.dtype) if k in ("int", "float") else _s(ctx).cast("long")
        return v.isNotNull() & v.between(1, 65535)

    r.register("port", _port)

    def _uri(ctx, params):
        # url.ParseRequestURI: absolute URI (scheme) or rooted path (:292).
        s = _s(ctx)
        return (s.startswith("/") | s.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")) & ~s.contains(" ")

    r.register("uri", _uri)

    def _domain(ctx, params):
        # miekg/dns IsDomainName: ≤255 octets, labels 1..63, no empty label
        # (except the root "." itself); lax about charset like the Go impl.
        s = _s(ctx)
        return (
            (F.octet_length(s) > 0)
            & (F.octet_length(s) <= 255)
            & ~s.contains("..")
            & ~s.rlike(r"[^.]{64,}")
        )

    r.register("domain", _domain)

    # IP / CIDR families — one vectorized UDF each
    for name, mode in (
        ("ip", "any"), ("ip_addr", "any"),
        ("ipv4", "v4"), ("ip4_addr", "v4"),
        ("ipv6", "v6"), ("ip6_addr", "v6"),
    ):
        def _mk(ctx, params, _m=mode):
            return _ip_udf(_m)(_s(ctx))

        r.register(name, _mk)

    for name, mode in (("cidr", "any"), ("cidrv4", "v4"), ("cidrv6", "v6")):
        def _mkc(ctx, params, _m=mode):
            return _cidr_udf(_m)(_s(ctx))

        r.register(name, _mkc)

    for name, mode in (
        ("tcp4_addr", "tcp4"), ("udp4_addr", "tcp4"),
        ("tcp6_addr", "tcp6"), ("udp6_addr", "tcp6"),
        ("tcp_addr", "ip"), ("udp_addr", "ip"),
    ):
        def _mkh(ctx, params, _m=mode):
            return _hostport_udf(_m)(_s(ctx))

        r.register(name, _mkh)

    def _hostname_port(ctx, params):
        # SplitHostPort; host must be an IP or match the hostname regex;
        # port 1..65535 (network.go:83-99).  SQL-only: host/port split via
        # regex on the LAST colon.
        s = _s(ctx)
        host = F.regexp_extract(s, r"^(?:\[([^\]]*)\]|(.*)):(\d+)\z", 2)
        host6 = F.regexp_extract(s, r"^(?:\[([^\]]*)\]|(.*)):(\d+)\z", 1)
        port = F.regexp_extract(s, r"^(?:\[([^\]]*)\]|(.*)):(\d+)\z", 3).cast("int")
        host_ok = (host6 != "") | host.rlike(_HOSTNAME_RE) | host.rlike(
            r"^(\d{1,3}\.){3}\d{1,3}$"
        )
        return port.isNotNull() & port.between(1, 65535) & host_ok

    r.register("hostname_port", _hostname_port)

    def _uds_exists(ctx, params):
        # network.go:279-289: abstract sockets pass; else os.Stat.
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("boolean")
        def _ok(s: pd.Series) -> pd.Series:
            import os

            def chk(v):
                if not v:
                    return False
                if v.startswith("@"):
                    return True
                return os.path.exists(v)

            return s.fillna("").map(chk)

        return _ok(_s(ctx))

    r.register("uds_exists", _uds_exists, driver_only=True)
