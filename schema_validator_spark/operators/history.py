"""File-version history over the north rule's (repo, path, commit,
lang, content) source-code table — head-version selection and per-file
churn, the commit-grain axis of the code pack.

A repository table at corpus scale carries MANY versions of each file
(one row per (repo, path, commit)); every downstream stage — dedup,
quality, training-data export — wants exactly one: the head.  The Stack
and CodeParrot pipelines both start with this "keep latest visible
version" step.  Churn stats are the other side of the same groupBy:
how often a file is rewritten (versions vs distinct contents) is a
strong generated-file / lockfile signal and feeds freshness gates.

Reference analog: the reference validates one value at a time
(rule/compare.go's ordering rules); this is the table-level ordering
primitive those row rules can't express — arg-max per key across rows.

Scale shape (PLANS.md): ONE hash shuffle on the file key for either
aggregate.  ``latest_files`` is a map-side-combinable ``max(struct(
version, tiebreak, payload...))`` arg-max — no window, no sort, no hot
reducer (a pathological file with 10^6 commits still combines
map-side).  ``churn_stats`` rides the same groupBy; its
count(distinct sha) is the only two-phase term and it shuffles
(key, sha) rows, bounded by distinct versions.  ``edit_pairs`` is the
one window op of the family (adjacent-version pairing needs the sort);
see its docstring for the hot-key bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _check_reserved(
    cols: list[str],
    key_cols: list[str],
    *,
    reserved: frozenset[str] = frozenset({"_v", "_s", "_head"}),
    what: str = "history operators",
) -> None:
    # internal struct/agg/window column names: an input column named _v
    # would make `_head._v` ambiguous; _head/_s would shadow aliases
    clash = sorted(reserved & set([*cols, *key_cols]))
    if clash:
        raise ValueError(
            f"{what} reserve(s) these column names; rename the "
            f"input columns: {clash}"
        )


def latest_files(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    *,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """One row per key: the payload of the row with the greatest
    ``version_col`` (head version).  Returns ``(key_cols...,
    version_col, payload_cols...)``.

    Ties on the version are broken by the greatest payload tuple
    (struct comparison is field-order lexicographic) — deterministic,
    documented.  NULL versions sort first (Spark struct max treats
    NULL fields as smallest), so a key whose every version is NULL
    still emits one row.

    Plan: map-side-combinable ``max(struct(...))`` — one Exchange on
    the key, no window/sort.
    """
    if payload_cols is None:
        payload_cols = [
            c for c in df.columns
            if c not in key_cols and c != version_col
        ]
    _check_reserved(payload_cols, key_cols)
    packed = F.max(
        F.struct(
            F.col(version_col).alias("_v"),
            *[F.col(c).alias(c) for c in payload_cols],
        )
    ).alias("_head")
    out = df.groupBy(*[F.col(k) for k in key_cols]).agg(packed)
    return out.select(
        *key_cols,
        F.col("_head._v").alias(version_col),
        *[F.col(f"_head.{c}").alias(c) for c in payload_cols],
    )


def churn_stats(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    content_col: str,
) -> DataFrame:
    """Per-key version churn: ``(key_cols..., n_versions,
    n_distinct_versions, first_version, last_version, head_sha,
    churn_ratio)``.

    ``n_distinct_versions`` counts distinct content sha256s (NULL
    content hashes as the empty string, so it still counts one
    version); ``head_sha`` is the content hash of the greatest
    version (ties -> greatest sha, same contract as latest_files);
    ``churn_ratio`` = 1 - distinct/versions, rounded 6dp: 0 means every
    commit produced a new content state (organic edits); values near 1
    mean the file keeps flipping between identical states — a
    generated-file / lockfile signal.

    Plan: ONE groupBy on the key; every term map-side combinable
    except the count(distinct sha) two-phase agg.
    """
    _check_reserved([version_col, content_col], key_cols)
    sha = F.sha2(F.coalesce(F.col(content_col), F.lit("")), 256)
    out = df.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.count_distinct(sha).alias("n_distinct_versions"),
        F.min(version_col).alias("first_version"),
        F.max(version_col).alias("last_version"),
        F.max(
            F.struct(F.col(version_col).alias("_v"), sha.alias("_s"))
        ).alias("_head"),
    )
    return out.select(
        *key_cols,
        "n_versions",
        "n_distinct_versions",
        "first_version",
        "last_version",
        F.col("_head._s").alias("head_sha"),
        F.round(
            1 - F.col("n_distinct_versions") / F.col("n_versions"), 6
        ).alias("churn_ratio"),
    )


def edit_pairs(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    content_col: str,
    *,
    changed_only: bool = False,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Consecutive version pairs per file with set-based line-diff
    stats — the (before, after) mining step for edit/diff training
    data (the CommitPack shape: OctoPack, Muennighoff et al. 2023).
    One row per adjacent (version, next version) pair of each key:

    * ``from_version`` / ``to_version`` — the pair, ordered by
      ``version_col`` (ties broken by content sha — deterministic,
      same contract as latest_files)
    * ``n_added`` / ``n_removed`` / ``n_common`` — DISTINCT lines of
      the after-side not in the before-side / vice versa / shared
    * ``line_jaccard`` — n_common over the distinct-line union, 6dp
    * ``changed`` — whether the raw content bytes differ (a pair can
      be unchanged while a later pair of the same key edits back)

    ``changed_only=True`` keeps only real edits.  NULL content splits
    as the empty document (one empty line).  ``keep_cols`` passes
    extra columns of the TO-side row (the edit's own commit) through
    to the output — e.g. the commit message for :func:`commit_pairs`;
    they join the window ordering after the sha so duplicate
    (version, content) rows with different carried values still pair
    deterministically.

    Scale shape: ONE Exchange on the key + per-key sort by version;
    the lag window carries (version, sha, distinct-line array) — the
    line array is derived once per row BEFORE the window so neither
    the lag nor the diff re-splits content.  Hot-key caveat: one
    file's whole history sorts in a single task — bounded by VCS
    history depth (10^3-10^5 commits), not corpus size; for a
    degenerate key (a 10^5-version lockfile) use
    :func:`edit_pairs_chunked` — identical rows, bounded tasks.
    """
    _check_reserved(
        df.columns, key_cols,
        reserved=frozenset({
            "_ln", "_sha", "_pv", "_pl", "_ps", "_rn",
            "from_version", "to_version",
        }),
        what="edit_pairs",
    )
    keep_cols = list(keep_cols or [])
    s = F.coalesce(F.col(content_col), F.lit(""))
    base = df.select(
        *key_cols,
        F.col(version_col),
        *keep_cols,
        F.array_distinct(F.split(s, "\n")).alias("_ln"),
        F.sha2(s, 256).alias("_sha"),
    )
    # keep_cols join the ordering so a duplicate (version, content) row
    # with a different carried value (e.g. two identical commits with
    # different messages) still yields ONE deterministic pairing
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).asc(),
        F.col("_sha").asc(),
        *[F.col(c).asc() for c in keep_cols],
    )
    lagged = base.select(
        *key_cols,
        F.col(version_col),
        *keep_cols,
        "_ln",
        "_sha",
        F.lag(version_col).over(w).alias("_pv"),
        F.lag("_ln").over(w).alias("_pl"),
        F.lag("_sha").over(w).alias("_ps"),
        F.row_number().over(w).alias("_rn"),
    ).filter(F.col("_rn") >= 2)
    return _pairs_from_lagged(
        lagged, key_cols, version_col, keep_cols, changed_only
    )


def _pairs_from_lagged(
    lagged: DataFrame,
    key_cols: list[str],
    version_col: str,
    keep_cols: list[str],
    changed_only: bool,
) -> DataFrame:
    """Diff projection shared by the serial and chunked pairers: input
    rows carry the current row (version, keeps, _ln, _sha) plus its
    predecessor (_pv, _pl, _ps); rows with no predecessor are already
    dropped."""
    n_added = F.size(F.array_except("_ln", "_pl"))
    n_removed = F.size(F.array_except("_pl", "_ln"))
    n_common = F.size(F.array_intersect("_ln", "_pl"))
    out = lagged.select(
        *key_cols,
        F.col("_pv").alias("from_version"),
        F.col(version_col).alias("to_version"),
        *keep_cols,
        n_added.alias("n_added"),
        n_removed.alias("n_removed"),
        n_common.alias("n_common"),
        F.round(
            n_common / (n_added + n_removed + n_common), 6
        ).alias("line_jaccard"),
        (F.col("_sha") != F.col("_ps")).alias("changed"),
    )
    if changed_only:
        out = out.filter(F.col("changed"))
    return out


def edit_pairs_chunked(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    content_col: str,
    *,
    changed_only: bool = False,
    keep_cols: list[str] | None = None,
    chunk_width: int = 1000,
) -> DataFrame:
    """Hot-key-safe :func:`edit_pairs`: identical rows, bounded tasks.

    The serial pairer sorts a key's WHOLE history in one task — fine at
    VCS depth (10^3-10^5), a stalled reducer for a degenerate key (a
    lockfile rewritten by a bot 10^5+ times).  This variant windows by
    ``(key, chunk)`` where ``chunk = floor(version / chunk_width)``
    (monotone in the version, so chunking preserves the serial order;
    version ties share a chunk by construction) and stitches chunk
    boundaries with ONE lag over the per-(key, chunk) summary:

    * within a chunk, each row lags its in-chunk predecessor — same
      expression as the serial window;
    * the FIRST row of a chunk pairs with the LAST row of the previous
      NON-EMPTY chunk (summary = map-side-combinable ``max(struct(
      version, sha, keeps..., lines))``; the struct comparison reaches
      the array field only on full (version, sha, keeps) ties, where
      the arrays are equal by construction since the sha pins the
      content) — empty chunks between two populated ones are skipped
      by the summary lag, unlike sessionize_chunked where chunk > gap
      makes adjacency sufficient;
    * the globally first row of a key has a NULL stitched predecessor
      and is dropped, matching the serial ``_rn >= 2``.

    ``version_col`` must be numeric or timestamp (cast to double for
    chunking; the pair columns keep the original type).  NULL versions
    all land in the NULL chunk, which sorts first — same relative
    order as the serial window's nulls-first — but they do share one
    task; a key whose hot axis is NULL-version rows is data corruption,
    not history.  Non-finite float versions keep the serial order too:
    NaN and +inf share the terminal chunk (the in-chunk version sort
    puts NaN after +inf, Spark's double ordering), -inf gets its own
    first finite chunk.  Key columns stitch NULL-SAFELY — a NULL-keyed
    file pairs exactly as the serial window's partitionBy groups it.

    Shuffle budget: one hash partitioning by (key, chunk) reused by
    the window and the summary groupBy, one tiny shuffle of summary
    rows (≤ versions/chunk_width per key), one join of summaries back
    on (key, chunk).  A 10^5-version key at the default width is 100
    summary rows and 100 bounded tasks, never one.
    """
    if chunk_width < 2:
        raise ValueError("chunk_width must be >= 2")
    _check_reserved(
        df.columns, key_cols,
        reserved=frozenset({
            "_ln", "_sha", "_pv", "_pl", "_ps", "_rn", "_chunk",
            "_pchunk", "_last", "_prev",
            "from_version", "to_version",
            *[f"_prevk{i}" for i in range(len(key_cols))],
        }),
        what="edit_pairs_chunked",
    )
    vtype = dict(df.dtypes)[version_col]
    if vtype.split("(")[0] not in {
        "tinyint", "smallint", "int", "bigint", "float", "double",
        "decimal", "date", "timestamp", "timestamp_ntz",
    }:
        raise ValueError(
            f"edit_pairs_chunked needs a numeric/timestamp version "
            f"column to chunk on; got {version_col}: {vtype}. Map the "
            f"version to its commit index first, or use edit_pairs."
        )
    keep_cols = list(keep_cols or [])
    s = F.coalesce(F.col(content_col), F.lit(""))
    vnum = (
        F.col(version_col).cast("timestamp").cast("double")
        if vtype.startswith(("date", "timestamp"))
        else F.col(version_col).cast("double")
    )
    # chunk id as double so the non-finite versions a float column can
    # carry keep the SERIAL sort order: Spark orders NaN greater than
    # +inf, but floor(NaN/width) would not — map NaN and +inf into one
    # terminal +inf chunk (internally re-ordered by the version sort,
    # where NaN lands after +inf) and -inf into a -inf chunk that sorts
    # after the NULL chunk and before every finite one
    inf = float("inf")
    chunk = (
        F.when(F.isnan(vnum) | (vnum == F.lit(inf)), F.lit(inf))
        .when(vnum == F.lit(-inf), F.lit(-inf))
        .otherwise(F.floor(vnum / F.lit(chunk_width)).cast("double"))
    )
    base = df.select(
        *key_cols,
        F.col(version_col),
        *keep_cols,
        F.array_distinct(F.split(s, "\n")).alias("_ln"),
        F.sha2(s, 256).alias("_sha"),
        chunk.alias("_chunk"),
    )
    order = [
        F.col(version_col).asc(),
        F.col("_sha").asc(),
        *[F.col(c).asc() for c in keep_cols],
    ]
    w = Window.partitionBy(*key_cols, "_chunk").orderBy(*order)
    lagged = base.select(
        *key_cols,
        F.col(version_col),
        *keep_cols,
        "_ln",
        "_sha",
        "_chunk",
        F.lag(version_col).over(w).alias("_pv"),
        F.lag("_ln").over(w).alias("_pl"),
        F.lag("_sha").over(w).alias("_ps"),
        F.row_number().over(w).alias("_rn"),
    )
    # last row of each (key, chunk), then each chunk's predecessor-chunk
    # last row via one lag over summaries (NULL chunk sorts first, same
    # as the serial window's nulls-first version order)
    summ = base.groupBy(*key_cols, "_chunk").agg(
        F.max(
            F.struct(
                F.col(version_col).alias("_v"),
                F.col("_sha").alias("_s"),
                *[F.col(c).alias(c) for c in keep_cols],
                F.col("_ln").alias("_l"),
            )
        ).alias("_last")
    )
    # stitch join must be NULL-SAFE on every key: the serial window's
    # partitionBy groups NULL key values, so a null-unsafe equi-join
    # here would silently drop every stitched pair of a NULL-keyed
    # file (and of the NULL chunk's rows); alias the right side's
    # keys so the join output stays unambiguous
    prev = summ.select(
        *[F.col(k).alias(f"_prevk{i}") for i, k in enumerate(key_cols)],
        F.col("_chunk").alias("_pchunk"),
        "_last",
    ).select(
        *[f"_prevk{i}" for i in range(len(key_cols))],
        "_pchunk",
        F.lag("_last").over(
            Window.partitionBy(
                *[f"_prevk{i}" for i in range(len(key_cols))]
            ).orderBy(F.col("_pchunk").asc())
        ).alias("_prev"),
    )
    cond = F.col("_chunk").eqNullSafe(F.col("_pchunk"))
    for i, k in enumerate(key_cols):
        cond = cond & F.col(k).eqNullSafe(F.col(f"_prevk{i}"))
    joined = lagged.join(prev, cond, "left").drop(
        "_pchunk", *[f"_prevk{i}" for i in range(len(key_cols))]
    )
    stitched = (
        joined.withColumn(
            "_pv",
            F.when(F.col("_rn") >= 2, F.col("_pv"))
            .otherwise(F.col("_prev._v")),
        )
        .withColumn(
            "_pl",
            F.when(F.col("_rn") >= 2, F.col("_pl"))
            .otherwise(F.col("_prev._l")),
        )
        .withColumn(
            "_ps",
            F.when(F.col("_rn") >= 2, F.col("_ps"))
            .otherwise(F.col("_prev._s")),
        )
        # globally-first row: no in-chunk predecessor and no prior
        # chunk — _ps is the non-NULL witness (_pv can be a real NULL
        # version)
        .filter(F.col("_ps").isNotNull())
    )
    return _pairs_from_lagged(
        stitched, key_cols, version_col, keep_cols, changed_only
    )


#: commit-message reject tiers (case-insensitive) — the CommitPackFT
#: cleaning idea (OctoPack, Muennighoff et al. 2023 §3/appendix):
#: machine/process commits (merges, reverts, version bumps, bot
#: traffic) carry no instruction signal.  Subject-anchored verbs OR
#: anywhere-in-subject trailer/bot markers, one alternation so the
#: filter costs a single regex pass.  ASCII classes only ([a-z0-9_]
#: boundaries spelled explicitly, no \b) so Spark (Java, Unicode
#:  word chars) and any RE2 oracle agree on every input.
MSG_REJECT_RE = (
    "(?i)(^(merge[sd]?|merging|revert(ed|ing|s)?|rollback|"
    "cherry.?pick(ed|ing|s)?|bump(ed|ing|s)?|wip|auto|automated|"
    "automatic)([^a-z0-9_]|$))"
    "|(?i)(co-authored-by|signed-off-by|dependabot|renovate|\\[bot\\]|"
    "\\[skip ci\\])"
)


def commit_pairs(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    content_col: str,
    message_col: str,
    *,
    min_msg_chars: int = 10,
    max_msg_chars: int = 200,
    reject_re: str = MSG_REJECT_RE,
    quality_only: bool = True,
    chunked: bool = False,
    chunk_width: int = 1000,
) -> DataFrame:
    """(message, before, after) instruction-pair mining — the
    CommitPackFT shape (OctoPack, Muennighoff et al. 2023): real edits
    whose commit message reads like an instruction.  Builds on
    :func:`edit_pairs` (``changed_only=True`` — an instruction pair
    needs an actual edit) and scores the TO-side commit's message:

    * ``message`` — the subject line (text before the first newline),
      trimmed; NULL messages score as the empty subject
    * ``msg_ok`` — subject length in ``[min_msg_chars,
      max_msg_chars]``, subject contains at least one ASCII letter,
      and the FULL raw message does not match ``reject_re`` (the ``^``
      tier anchors at the subject's first word; the trailer/bot tier
      matches anywhere, because Co-authored-by / bot markers live in
      the body, not the subject — the CommitPackFT cleaning idea; the
      default is a documented approximation of that recipe, not a
      byte-level port)

    ``quality_only=True`` (default) keeps only passing pairs and drops
    the verdict column; ``False`` returns every changed pair with
    ``msg_ok`` for audit.  Output: ``(key_cols..., from_version,
    to_version, message, n_added, n_removed, n_common, line_jaccard)``
    (+ ``msg_ok``).

    Scale shape: identical to edit_pairs (ONE Exchange + per-key
    version sort), or to edit_pairs_chunked with ``chunked=True``
    (bounded tasks for degenerate histories — requires a
    numeric/timestamp version column); subject and verdict are
    derived ONCE per input row
    in the projection BELOW the lag window and carried through it —
    the window is a pushdown barrier, so neither the quality filter
    nor the output projection re-derives the regexes (deriving them
    after the window instead would run the subject split once per
    filter conjunct plus once in the projection — the
    PushDownPredicate rule from CLAUDE.md).
    """
    if min_msg_chars < 1 or max_msg_chars < min_msg_chars:
        raise ValueError(
            "need 1 <= min_msg_chars <= max_msg_chars"
        )
    _check_reserved(
        df.columns, key_cols,
        reserved=frozenset(
            {"_subj", "_mok", "message", "msg_ok"} - {message_col}
        ),
        what="commit_pairs",
    )
    raw = F.coalesce(F.col(message_col), F.lit(""))
    subject = F.trim(F.split(raw, "\n").getItem(0))
    ok = (
        F.length(subject).between(min_msg_chars, max_msg_chars)
        & subject.rlike("[A-Za-z]")
        & ~raw.rlike(reject_re)
    )
    src = df.select("*", subject.alias("_subj"), ok.alias("_mok"))
    # chunked=True routes through the hot-key-safe pairer (identical
    # rows, bounded tasks) for corpora with degenerate VCS histories
    pairer = edit_pairs_chunked if chunked else edit_pairs
    kw = {"chunk_width": chunk_width} if chunked else {}
    pairs = pairer(
        src,
        key_cols,
        version_col,
        content_col,
        changed_only=True,
        keep_cols=["_subj", "_mok"],
        **kw,
    )
    scored = pairs.select(
        *key_cols,
        "from_version",
        "to_version",
        F.col("_subj").alias("message"),
        "n_added",
        "n_removed",
        "n_common",
        "line_jaccard",
        F.col("_mok").alias("msg_ok"),
    )
    if quality_only:
        return scored.filter(F.col("msg_ok")).drop("msg_ok")
    return scored
