"""URL / domain curation functions — blocklist filtering with
public-suffix-style registered-domain extraction.

The standard web-corpus curation stage (C4's badwords/domain filters,
RefinedWeb's URL filtering): extract the host, find the LONGEST matching
public suffix, take one label more as the registered domain, and drop
documents whose registered domain sits on a blocklist — so
``ads.tracker.co.uk`` is blocked by the entry ``tracker.co.uk`` no matter
which subdomain serves it.

Scale shape: two tiers.

* ``registered_domain`` — pure codegen expression.  The suffix set is
  compiled into per-label-count ``isin`` sets (Catalyst turns >10-element
  ``isin`` into a JVM hash-set ``InSet``), so even the full ~9k-entry
  public-suffix list is an O(1) probe per row, zero shuffle, zero
  Python.  Plain suffixes only (no ``*.``/``!`` PSL rules — documented
  divergence; the rule classes cover ~99% of registrations).
* ``filter_blocked_domains`` — the blocklist itself joins as a broadcast
  ``left_anti`` (same 0-Exchange shape as referential.py), which is the
  right plan when blocklists grow to millions of entries.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default max labels a public suffix can span (``co.uk`` = 2; PSL's
#: longest real entries are 4).
MAX_SUFFIX_LABELS = 4

_HOST_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.\-]*://)?(?:[^@/?#]*@)?([^:/?#]+)"


def host_of(url: Column) -> Column:
    """Lowercased host of a URL: strips scheme, userinfo, port,
    path/query/fragment, and a trailing dot.  NULL/malformed -> ''."""
    h = F.lower(F.regexp_extract(F.coalesce(url, F.lit("")), _HOST_RE, 1))
    return F.regexp_replace(h, r"\.$", "")


def registered_domain(
    host: Column, public_suffixes: list[str]
) -> Column:
    """Registered (registrable) domain of a host under ``public_suffixes``:
    longest-suffix match, then one more label.  NULL when the host IS a
    suffix (nothing registrable) or matches no suffix at all (unknown
    TLD — callers decide whether that is suspicious)."""
    by_k: dict[int, list[str]] = defaultdict(list)
    for s in public_suffixes:
        s = s.strip(".").lower()
        if s:
            by_k[s.count(".") + 1].append(s)
    if not by_k:
        raise ValueError("public_suffixes must be non-empty")
    n = F.size(F.split(host, r"\."))
    null_str = F.lit(None).cast("string")
    chain = None
    for k in sorted(by_k, reverse=True):  # longest suffix wins, even when
        cand = F.substring_index(host, ".", -k)  # it consumes the whole host
        cond = (n >= k) & cand.isin(by_k[k])
        reg = F.when(n >= k + 1, F.substring_index(host, ".", -(k + 1))).otherwise(
            null_str
        )
        chain = chain.when(cond, reg) if chain is not None else F.when(cond, reg)
    return chain.otherwise(null_str)


def annotate_domains(
    df: DataFrame,
    url_col: str,
    public_suffixes: list[str],
    *,
    host_col: str = "host",
    domain_col: str = "reg_domain",
) -> DataFrame:
    """Append host + registered-domain columns (pure per-row codegen)."""
    h = host_of(F.col(url_col))
    return df.withColumn(host_col, h).withColumn(
        domain_col, registered_domain(F.col(host_col), public_suffixes)
    )


def filter_blocked_domains(
    df: DataFrame,
    url_col: str,
    blocked_domains: DataFrame | list[str],
    public_suffixes: list[str],
    *,
    keep_unknown: bool = True,
) -> DataFrame:
    """Drop rows whose registered domain is blocklisted.

    ``blocked_domains`` may be a list (small blocklists) or a single-
    column DataFrame (production blocklists) — either way the join side
    is broadcast, so the corpus never shuffles.  Rows with NO registered
    domain (unknown TLD / bare suffix) are kept or dropped per
    ``keep_unknown``."""
    spark = df.sparkSession
    if isinstance(blocked_domains, list):
        blocked = spark.createDataFrame(
            [(d.lower(),) for d in blocked_domains], "reg_domain string"
        )
    else:
        cols = blocked_domains.columns
        blocked = blocked_domains.select(F.lower(F.col(cols[0])).alias("reg_domain"))
    host_col, dom_col = "_host", "_reg_domain"
    while host_col in df.columns:  # collision-proof temp names
        host_col += "_"
    while dom_col in df.columns:
        dom_col += "_"
    ann = annotate_domains(
        df, url_col, public_suffixes, host_col=host_col, domain_col=dom_col
    )
    out = ann.join(
        F.broadcast(blocked.withColumnRenamed("reg_domain", dom_col)),
        on=dom_col,
        how="left_anti",
    )
    if not keep_unknown:
        out = out.filter(F.col(dom_col).isNotNull())
    return out.drop(dom_col, host_col)


#: Query-param NAME PREFIXES stripped by canonicalize_url (families).
TRACKING_PARAM_PREFIXES = ("utm_",)
#: Exact query-param NAMES stripped by canonicalize_url.  Exact match on
#: the name only — a bare "ref" prefix would also eat refid/refresh/
#: referrer and over-merge distinct pages.
TRACKING_PARAMS_EXACT = ("gclid", "fbclid", "mc_eid", "ref")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL for URL-level dedup — pure codegen:

    * fragment and userinfo dropped; scheme and host lowercased; a
      missing scheme defaults to ``http`` (messy crawl URLs like
      ``www.example.com/page`` keep their real host and path); trailing
      host dot and default ports (http:80 / https:443) removed;
    * tracking query params dropped — ``TRACKING_PARAM_PREFIXES``
      families by name prefix, ``TRACKING_PARAMS_EXACT`` by exact name —
      the rest SORTED (param order never distinguishes pages);
    * empty path becomes ``/``; empty query drops its ``?``.

    Two crawls of the same page through different tracking links then
    share one canonical string — group on it (or feed it to
    ``fingerprint``-style exact dedup) before any content-level pass.
    """
    u = F.coalesce(url, F.lit(""))
    nofrag = F.regexp_replace(u, r"#.*$", "")
    scheme_raw = F.regexp_extract(nofrag, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1)
    scheme = F.when(scheme_raw == "", F.lit("http")).otherwise(F.lower(scheme_raw))
    # scheme (if any) and userinfo stripped; host parsing then works for
    # scheme-less crawl URLs too
    rest = F.regexp_replace(
        F.regexp_replace(nofrag, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", ""),
        r"^[^/?#]*@", "",
    )
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]+)", 1))
    # default port only for its own scheme (https://h:80 is NOT default),
    # then a trailing host dot (before the port or at the end)
    noport = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    host = F.regexp_replace(noport, r"\.(?=:|$)", "")
    path = F.regexp_extract(rest, r"^[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(rest, r"\?([^#]*)", 1)

    def is_tracking(p):
        name = F.substring_index(p, "=", 1)
        by_prefix = F.aggregate(
            F.array(*[F.lit(x) for x in TRACKING_PARAM_PREFIXES]),
            F.lit(False),
            lambda acc, pref: acc | name.startswith(pref),
        )
        return by_prefix | name.isin(*TRACKING_PARAMS_EXACT)

    keep = F.filter(F.split(query, "&"), lambda p: (p != "") & ~is_tracking(p))
    canon_q = F.array_join(F.array_sort(keep), "&")
    return F.concat(
        scheme, F.lit("://"), host,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )
