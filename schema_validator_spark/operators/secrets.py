"""Secret / credential scanning over code content — the code-table
sibling of operators/pii.py (pii_scan finds personal data in TEXT
columns; this finds leaked credentials in SOURCE CODE, the scan a
code-corpus curator runs before training or publishing — BigCode's
Stack pipeline redacts exactly this class).

Patterns are the published gitleaks/detect-secrets shapes for
well-known credential formats (AWS access-key ids, GitHub fine/classic
tokens, Slack tokens, PEM private-key headers, JWTs) plus two
assignment heuristics (password/api-key literals).  All RE2-safe — no
backreferences, no lookaround — so the DuckDB oracle replays them with
the identical regex semantics.

Scale shape: ``secret_scan`` is the pii_scan shape — every
(column x pattern) pair is two map-side-combinable aggregates in ONE
global aggregation producing ONE row; ``secret_findings`` is row-level
— one ``regexp_count`` per pattern in a single projection, ONE
stack-unpivot (not a scan per pattern), then a filter; zero joins,
zero Python, the corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (secret_type, RE2-safe pattern) — ordered, names stable (they are
#: output values); single source of truth shared with the oracle
SECRET_PATTERNS: list[tuple[str, str]] = [
    ("AWS_ACCESS_KEY_ID", r"\bAKIA[0-9A-Z]{16}\b"),
    ("GITHUB_TOKEN", r"\bgh[pousr]_[0-9A-Za-z]{36}\b"),
    ("SLACK_TOKEN", r"\bxox[baprs]-[0-9A-Za-z-]{10,}"),
    ("PRIVATE_KEY_BLOCK", r"-----BEGIN [A-Z ]{0,20}PRIVATE KEY-----"),
    (
        "JWT",
        r"\beyJ[0-9A-Za-z_-]{8,}\.[0-9A-Za-z_-]{8,}\.[0-9A-Za-z_-]{8,}",
    ),
    ("PASSWORD_LITERAL", r"(?i)\b(password|passwd|pwd)\s*[:=]\s*\S{4,}"),
    ("API_KEY_LITERAL", r"(?i)\bapi[_-]?key\s*[:=]\s*[0-9A-Za-z_-]{8,}"),
]


def has_secret(
    content_col: str,
    *,
    patterns: list[tuple[str, str]] | None = None,
):
    """Boolean Column: any credential pattern matches — the quarantine
    predicate for a curation funnel (pure codegen OR-chain; short-
    circuits per row)."""
    pats = patterns if patterns is not None else SECRET_PATTERNS
    if not pats:
        raise ValueError("empty pattern list")
    s = F.coalesce(F.col(content_col), F.lit(""))
    cond = s.rlike(pats[0][1])
    for _, p in pats[1:]:
        cond = cond | s.rlike(p)
    return cond


def secret_findings(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    *,
    patterns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Row-level findings: ``(id_cols..., secret_type, n_spans)`` —
    one row per (file, credential type) actually present.  This is the
    actionable form (which files to quarantine); ``secret_scan`` is the
    governance rollup."""
    pats = patterns if patterns is not None else SECRET_PATTERNS
    if not pats:
        raise ValueError("empty pattern list")
    s = F.coalesce(F.col(content_col), F.lit(""))
    counted = df.select(
        *id_cols,
        *[
            F.regexp_count(s, F.lit(p)).alias(f"_c{i}")
            for i, (_, p) in enumerate(pats)
        ],
    )
    from ._util import stack_findings

    return stack_findings(
        counted, id_cols, [name for name, _ in pats], "secret_type"
    )


#: candidate-token shape for the entropy tier: long unbroken
#: base64/hex-ish runs, truffleHog's scan unit.  RE2-safe.
ENTROPY_CANDIDATE = r"[0-9A-Za-z+/=_-]{20,}"

#: truffleHog's classic thresholds: ~4.5 bits/char flags random base64
#: material; hex-only material maxes at 4.0 (16 symbols), so scans
#: targeting hex keys should pass ~3.0-3.5 explicitly.
DEFAULT_ENTROPY_BITS = 4.5


def shannon_entropy(tok) -> "F.Column":
    """Double Column: Shannon entropy (bits/char) of a string Column's
    character distribution — pure codegen (split/distinct/replace
    HOFs; O(distinct_chars x len) per value, both engine-side)."""
    t = F.coalesce(tok, F.lit(""))
    L = F.length(t).cast("double")
    chars = F.filter(
        F.array_distinct(F.split(t, "")), lambda c: c != F.lit("")
    )
    probs = F.transform(
        chars, lambda c: (L - F.length(F.replace(t, c, F.lit("")))) / L
    )
    return F.aggregate(
        F.transform(probs, lambda p: -p * F.log2(p)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def entropy_findings(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    *,
    threshold: float = DEFAULT_ENTROPY_BITS,
    candidate: str = ENTROPY_CANDIDATE,
) -> DataFrame:
    """High-entropy string findings — the truffleHog tier that catches
    credentials NO published pattern knows (random API keys, session
    tokens, encoded blobs): ``(id_cols..., token, token_len,
    entropy)`` for every DISTINCT candidate run in the file whose
    character entropy is >= ``threshold`` bits/char.  Complements the
    pattern tier (``secret_findings``): patterns are precise on known
    formats, entropy is the recall net behind them.  Known FP classes
    (long git shas, content hashes in lockfiles) are the documented
    trade — tune ``threshold``/``candidate`` or post-filter paths.

    The token itself is emitted (downstream redaction needs the span);
    entropy is the exact -sum(p*log2 p) over the token's own chars.
    Scale shape: extraction + entropy are one per-row codegen
    projection riding the scan; zero shuffles, zero Python; output is
    findings-volume sized."""
    if not id_cols:
        raise ValueError("entropy_findings needs id columns")
    s = F.coalesce(F.col(content_col), F.lit(""))
    toks = F.array_distinct(F.regexp_extract_all(s, F.lit(candidate), 0))
    rows = df.select(*id_cols, F.explode(toks).alias("token"))
    return rows.select(
        *id_cols,
        "token",
        F.length("token").alias("token_len"),
        shannon_entropy(F.col("token")).alias("entropy"),
    ).filter(F.col("entropy") >= F.lit(float(threshold)))


def secret_scan(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    patterns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Per (column, secret_type) exposure report:
    ``(column, secret_type, n_rows, n_matched, n_spans, match_rate)``.
    ``cols`` defaults to every string column.  ONE aggregation pass
    over the table, one output row per (column, type) — the shared
    governance-scan shape (operators/pii.pattern_scan, single source
    of truth with pii_scan)."""
    from .pii import pattern_scan

    pats = patterns if patterns is not None else SECRET_PATTERNS
    return pattern_scan(df, cols, pats, "secret_type")
