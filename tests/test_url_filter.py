"""URL blocklist filtering + registered-domain extraction (functions/url.py)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.functions import url as U
from schema_validator_spark.plans import inspect as P

SUFFIXES = ["com", "org", "net", "io", "uk", "co.uk", "ac.uk", "jp", "co.jp"]


def _domains(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    rows = df.select(
        "host", U.registered_domain(F.col("host"), SUFFIXES).alias("d")
    ).collect()
    return {r["host"]: r["d"] for r in rows}


def test_host_of(spark):
    cases = {
        "https://Sub.Example.COM/path?q=1": "sub.example.com",
        "http://user:pw@example.org:8080/x": "example.org",
        "example.net/no-scheme": "example.net",
        "ftp://archive.example.io.": "archive.example.io",
        None: "",
        "": "",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["h"]
           for r in df.select("url", U.host_of(F.col("url")).alias("h")).collect()}
    assert got == cases


def test_registered_domain_longest_match(spark):
    got = _domains(spark, [
        "www.example.co.uk",      # 2-label suffix beats 1-label "uk"
        "deep.sub.example.co.uk",
        "example.co.uk",
        "co.uk",                  # host IS a suffix -> nothing registrable
        "uk",
        "example.com",
        "a.b.example.com",
        "weird.hostlocal",        # unknown TLD -> NULL
        "site.ac.uk",
        "blog.example.co.jp",
    ])
    assert got["www.example.co.uk"] == "example.co.uk"
    assert got["deep.sub.example.co.uk"] == "example.co.uk"
    assert got["example.co.uk"] == "example.co.uk"
    assert got["co.uk"] is None
    assert got["uk"] is None
    assert got["example.com"] == "example.com"
    assert got["a.b.example.com"] == "example.com"
    assert got["weird.hostlocal"] is None
    assert got["site.ac.uk"] == "site.ac.uk"
    assert got["blog.example.co.jp"] == "example.co.jp"


def test_registered_domain_rejects_empty():
    with pytest.raises(ValueError, match="non-empty"):
        U.registered_domain(F.lit("x"), [])


def test_filter_blocked_domains(spark):
    rows = [
        (1, "https://ads.tracker.co.uk/pixel"),   # blocked via suffix walk
        (2, "https://tracker.co.uk/x"),           # blocked exactly
        (3, "https://good.site.org/a"),
        (4, "https://sub.good.site.org/b"),
        (5, "https://unknown.hostlocal/c"),       # no reg domain
        (6, "https://TRACKER.CO.UK/upper"),       # case-insensitive
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(
        r["doc_id"]
        for r in U.filter_blocked_domains(
            df, "url", ["tracker.co.uk"], SUFFIXES
        ).collect()
    )
    assert kept == [3, 4, 5]
    dropped_unknown = sorted(
        r["doc_id"]
        for r in U.filter_blocked_domains(
            df, "url", ["tracker.co.uk"], SUFFIXES, keep_unknown=False
        ).collect()
    )
    assert dropped_unknown == [3, 4]
    # DataFrame blocklist form, and original columns survive untouched
    bl = spark.createDataFrame([("Tracker.co.uk",)], "d string")
    out = U.filter_blocked_domains(df, "url", bl, SUFFIXES)
    assert sorted(r["doc_id"] for r in out.collect()) == [3, 4, 5]
    assert out.columns == ["doc_id", "url"]


def test_filter_plan_is_broadcast_anti_no_corpus_shuffle(spark):
    df = spark.range(100).withColumn(
        "url", F.concat(F.lit("https://h"), F.col("id"), F.lit(".example.com/x"))
    )
    out = U.filter_blocked_domains(df, "url", ["example.com"], SUFFIXES)
    plan = P.executed_plan(out)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert P.n_exchanges(out) == 0, plan  # corpus side never shuffles
    assert not P.uses_python(out)


def test_canonicalize_url(spark):
    cases = {
        # tracking params dropped, remainder sorted, fragment gone
        "https://Example.COM:443/a/b?utm_source=x&z=1&a=2#frag":
            "https://example.com/a/b?a=2&z=1",
        # http default port + trailing host dot + empty path
        "HTTP://Host.Example.org.:80?b=2&a=1":
            "http://host.example.org/?a=1&b=2",
        # https with port 80 is NOT default -> kept
        "https://h.example.com:80/x": "https://h.example.com:80/x",
        # non-default port kept; all-tracking query drops the '?'
        "https://h.example.com:8080/x?utm_campaign=c&gclid=1&fbclid=2&ref=z":
            "https://h.example.com:8080/x",
        # already canonical -> unchanged
        "https://example.com/": "https://example.com/",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["c"] for r in df.select(
        "url", U.canonicalize_url(F.col("url")).alias("c")).collect()}
    assert got == cases
    # equal pages through different tracking links share one canonical key
    variants = [
        "https://site.org/page?id=7&utm_source=tw",
        "https://SITE.org:443/page?utm_medium=m&id=7#top",
        "https://site.org./page?id=7",
    ]
    vdf = spark.createDataFrame([(u,) for u in variants], "url string")
    canon = {r["c"] for r in vdf.select(
        U.canonicalize_url(F.col("url")).alias("c")).collect()}
    assert canon == {"https://site.org/page?id=7"}


def test_canonicalize_url_schemeless_and_ref_params(spark):
    """Round-3 review fixes: scheme-less crawl URLs keep host+path
    (defaulting to http), and only the EXACT 'ref' param is tracking —
    refid/refresh must survive (they distinguish pages)."""
    cases = {
        "www.Example.com/page?id=1": "http://www.example.com/page?id=1",
        "example.com": "http://example.com/",
        "user:pw@example.com/x": "http://example.com/x",
        "https://shop.example.com/item?refid=123":
            "https://shop.example.com/item?refid=123",
        "https://shop.example.com/item?ref=tw&refid=123":
            "https://shop.example.com/item?refid=123",
        "https://shop.example.com/item?refresh=1&utm_source=x":
            "https://shop.example.com/item?refresh=1",
    }
    df = spark.createDataFrame([(us,) for us in cases], "url string")
    got = {r["url"]: r["c"] for r in df.select(
        "url", U.canonicalize_url(F.col("url")).alias("c")).collect()}
    assert got == cases
    # two pages differing only in refid stay DISTINCT
    a, b = [U.canonicalize_url(F.lit(x)) for x in
            ("https://s.com/i?refid=1", "https://s.com/i?refid=2")]
    row = spark.range(1).select(a.alias("a"), b.alias("b")).first()
    assert row["a"] != row["b"]


# ---- property: canonicalize_url == exact Python replay on random URLs ----

def _ref_canon(u: str) -> str:
    import re

    nofrag = re.sub(r"#.*$", "", u or "")
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", nofrag)
    scheme = m.group(1).lower() if m else "http"
    rest = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", "", nofrag)
    rest = re.sub(r"^[^/?#]*@", "", rest)
    hm = re.match(r"^([^/?#]+)", rest)
    hostport = (hm.group(1) if hm else "").lower()
    if scheme == "http":
        hostport = re.sub(r":80$", "", hostport)
    elif scheme == "https":
        hostport = re.sub(r":443$", "", hostport)
    host = re.sub(r"\.(?=:|$)", "", hostport)
    pm = re.match(r"^[^/?#]+([^?#]*)", rest)
    path = pm.group(1) if pm else ""
    qm = re.search(r"\?([^#]*)", rest)
    query = qm.group(1) if qm else ""
    keep = []
    for p in query.split("&"):
        if not p:
            continue
        name = p.split("=", 1)[0]
        if any(name.startswith(x) for x in U.TRACKING_PARAM_PREFIXES):
            continue
        if name in U.TRACKING_PARAMS_EXACT:
            continue
        keep.append(p)
    q = "&".join(sorted(keep))
    return f"{scheme}://{host}{path or '/'}{'?' + q if q else ''}"


def test_canonicalize_url_property(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    label = st.text(alphabet="aBcD19-", min_size=1, max_size=5)
    param = st.tuples(
        st.sampled_from(["id", "a", "utm_source", "utm_x", "ref", "refid",
                         "gclid", "fbclid", "mc_eid", "x9"]),
        st.text(alphabet="abc123", max_size=3),
    )

    @st.composite
    def urls(draw):
        parts = []
        scheme = draw(st.sampled_from(
            [None, "http", "HTTP", "https", "HtTpS", "ftp"]))
        if scheme:
            parts.append(scheme + "://")
        if draw(st.booleans()):
            parts.append("user:pw@")
        parts.append(".".join(draw(st.lists(label, min_size=1, max_size=3))))
        if draw(st.booleans()):
            parts.append(".")
        port = draw(st.sampled_from([None, 80, 443, 8080]))
        if port:
            parts.append(f":{port}")
        for seg in draw(st.lists(label, max_size=2)):
            parts.append("/" + seg)
        ps = draw(st.lists(param, max_size=4))
        if ps:
            parts.append("?" + "&".join(f"{k}={v}" for k, v in ps))
        if draw(st.booleans()):
            parts.append("#frag")
        return "".join(parts)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(urls(), min_size=1, max_size=30, unique=True))
    def check(batch):
        df = spark.createDataFrame([(u,) for u in batch], "url string")
        got = {r["url"]: r["c"] for r in df.select(
            "url", U.canonicalize_url(F.col("url")).alias("c")).collect()}
        for u in batch:
            assert got[u] == _ref_canon(u), u

    check()
