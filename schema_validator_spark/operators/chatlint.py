"""SFT conversation-format lint — structural validation of chat
training rows (the ``messages`` JSON the OpenAI/HF fine-tuning formats
share: ``[{"role": ..., "content": ...}, ...]``).  Instruction-tuning
corpora are mined (commit_pairs, notebook_pairs, markdown_pairs …) and
then must pass a FORMAT gate before tokenization: role vocabulary,
at-most-one leading system turn, user-first, strict user/assistant
alternation, assistant-last, no empty turns.  This operator is that
gate — the conversation-grain analog of the reference's struct
validation (schema-validator validator.go walks one struct; here the
"struct" is a parsed JSON array and the rules are positional).

Reference anchor: rule semantics modeled on the reference's
required/oneof shape (rule/compare.go, rule/other.go) lifted to array
positions; part of the engine-extension surface SURVEY §2.9 mandates.

Scale shape: ZERO shuffles, zero Python — ``from_json`` + array HOFs
in one projection riding the scan.  The parsed array, role array, and
body (roles after the optional leading system) are each materialized
ONCE (lambda-CSE pitfall, CLAUDE.md).

Malformed-input edge semantics follow Spark's ``from_json``: a JSON
that is valid but cannot coerce to ``array<struct<role,content>>``
(e.g. an array of scalars) parses to NULL and reports
``invalid_json``; a top-level object reports ``not_an_array`` (Spark
would silently wrap it in a one-element array — the textual ``[``
guard makes the gate stricter than the parser, matching what a JSONL
format checker would say).  Scalar message fields coerce to their
string form on both engines ("content": 5 -> "5").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: first_error codes in priority order (the emitted code is the FIRST
#: failing check; later checks may be vacuous on rows that already
#: failed an earlier one)
ERROR_PRIORITY = [
    "missing",
    "invalid_json",
    "not_an_array",
    "empty_conversation",
    "bad_role",
    "empty_content",
    "system_not_first",
    "not_user_first",
    "no_alternation",
    "not_assistant_last",
]

MESSAGES_SCHEMA = "array<struct<role:string,content:string>>"


def _bound(expr: Column, fn) -> Column:
    """Bind ``expr`` ONCE as a higher-order-function lambda variable
    and hand it to ``fn`` — interpreted HOFs get no subexpression
    elimination, so a heavy expression referenced N times would run N
    times; through the binding every reference is a variable lookup
    (see functions/text.array_shingles for the measured case)."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def chat_lint(
    df: DataFrame,
    id_cols: list[str],
    conv_col: str,
    *,
    roles: tuple[str, ...] = ("system", "user", "assistant"),
) -> DataFrame:
    """Per-conversation format audit: ``(ids..., n_turns, n_system,
    n_user, n_assistant, n_empty, first_error, keep)``.

    ``first_error`` is the highest-priority failing check from
    :data:`ERROR_PRIORITY` (or ``'ok'``); ``keep = 1`` iff ok.  Turn
    stats are 0 for rows failing a structural check (missing /
    invalid_json / not_an_array) — there is no parsed array to count.
    ``roles`` is the allowed role vocabulary; alternation is enforced
    over the non-system body, so a vocabulary that adds e.g. ``tool``
    should expect ``no_alternation`` unless tool turns are stripped
    upstream.
    """
    for c in ("_p", "_roles", "_body"):
        if c in df.columns:
            raise ValueError(f"reserved temp column {c!r} present in input")
    if not roles:
        raise ValueError("empty role vocabulary")
    out_cols = ["n_turns", "n_system", "n_user", "n_assistant",
                "n_empty", "first_error", "keep"]
    clash = [c for c in out_cols if c in id_cols]
    if clash:
        raise ValueError(f"id_cols collide with output column(s) {clash}")
    raw = F.col(conv_col)

    # first non-whitespace char must open an array: the JSON parser
    # (and the oracle's json_type) skips ALL whitespace, while trim()
    # strips spaces only — a leading tab/newline before '[' must not
    # flip a valid conversation to not_an_array
    def _is_array_shaped(col: Column) -> Column:
        return F.regexp_extract(col, r"^\s*(.)", 1) == "["

    def build(p: Column, rl: Column, body: Column) -> Column:
        """All outputs from ONE binding of (parsed, roles, body)."""
        n = F.size(p)
        nb = F.size(body)
        structural_ok = (
            raw.isNotNull()
            & (F.trim(raw) != "")
            & p.isNotNull()
            & _is_array_shaped(raw)
        )
        bad_role = F.exists(rl, lambda r: r.isNull() | ~r.isin(*roles))
        empty_content = F.exists(
            p,
            lambda m: m["content"].isNull() | (F.trim(m["content"]) == ""),
        )
        system_not_first = F.exists(body, lambda r: r == "system")
        not_user_first = (nb > 0) & (F.element_at(body, 1) != "user")
        no_alternation = F.when(
            nb >= 2,
            F.exists(
                F.sequence(F.lit(2), nb),
                lambda i: F.element_at(body, i)
                == F.element_at(body, i - 1),
            ),
        ).otherwise(F.lit(False))
        not_assistant_last = F.element_at(rl, -1) != "assistant"

        first_error = (
            F.when(raw.isNull() | (F.trim(raw) == ""), F.lit("missing"))
            .when(p.isNull(), F.lit("invalid_json"))
            .when(~_is_array_shaped(raw), F.lit("not_an_array"))
            .when(n == 0, F.lit("empty_conversation"))
            .when(bad_role, F.lit("bad_role"))
            .when(empty_content, F.lit("empty_content"))
            .when(system_not_first, F.lit("system_not_first"))
            .when(not_user_first, F.lit("not_user_first"))
            .when(no_alternation, F.lit("no_alternation"))
            .when(not_assistant_last, F.lit("not_assistant_last"))
            .otherwise(F.lit("ok"))
        )

        def role_count(name: str) -> Column:
            return F.when(
                structural_ok, F.size(F.filter(rl, lambda r: r == name))
            ).otherwise(F.lit(0))

        n_empty = F.when(
            structural_ok,
            F.size(
                F.filter(
                    p,
                    lambda m: m["content"].isNull()
                    | (F.trim(m["content"]) == ""),
                )
            ),
        ).otherwise(F.lit(0))

        # first_error feeds two outputs; bind it once too
        return _bound(
            first_error,
            lambda fe: F.struct(
                F.when(structural_ok, n).otherwise(F.lit(0))
                .alias("n_turns"),
                role_count("system").alias("n_system"),
                role_count("user").alias("n_user"),
                role_count("assistant").alias("n_assistant"),
                n_empty.alias("n_empty"),
                fe.alias("first_error"),
                (fe == "ok").cast("int").alias("keep"),
            ),
        )

    # from_json is interpreted (CodegenFallback) and referenced by ~10
    # downstream checks: bind the parse — and the role/body derivations
    # — ONCE each as lambda variables (the array_shingles pattern), so
    # every reference is a bound-variable lookup, not a re-parse.
    verdict = _bound(
        F.from_json(raw, MESSAGES_SCHEMA),
        lambda p: _bound(
            F.transform(p, lambda m: m["role"]),
            lambda rl: _bound(
                F.when(
                    (F.size(rl) > 0)
                    & (F.element_at(rl, 1) == "system"),
                    F.slice(rl, 2, F.size(rl) - 1),
                ).otherwise(rl),
                lambda body: build(p, rl, body),
            ),
        ),
    )
    # inline = a Generate barrier: CollapseProject cannot inline the
    # verdict expression past it, so the struct is evaluated ONCE per
    # row even though seven output columns read from it.
    return df.select(*[F.col(c) for c in id_cols], F.inline(F.array(verdict)))


def filter_valid_chats(
    df: DataFrame,
    id_cols: list[str],
    conv_col: str,
    *,
    roles: tuple[str, ...] = ("system", "user", "assistant"),
) -> DataFrame:
    """Gate form: input rows whose conversation passes every check
    (same semantics as ``chat_lint().keep == 1``), all original
    columns preserved."""
    extra = ["n_turns", "n_system", "n_user", "n_assistant", "n_empty",
             "first_error", "keep"]
    clash = [c for c in extra if c in df.columns]
    if clash:
        raise ValueError(f"reserved lint column(s) {clash} present in input")
    lint = chat_lint(df, df.columns, conv_col, roles=roles)
    return lint.filter(F.col("keep") == 1).drop(*extra)
