"""Driver-contract queries + oracle SQL: .

Split from the monolithic __spark_entry__.py (round 5); the contract is
byte-pinned by tests/test_contract_pin.py."""

from __future__ import annotations

from ._shared import _duck_lit, _duck_splice, _esc_sq, _kw_case_sql
from .seg02 import (
    _CLONE_TMPL,
    _CONTAM_CLEAN,
    _CONTAM_TAIL,
    _CONTAM_TMPL,
    _CPLX_SNIPPETS,
    _DEBT_TMPL,
    _EMBED_TMPL,
    _NEARDUP_BODY,
    _NEARDUP_BODY2,
    _NEARDUP_HDR_GPL,
    _NEARDUP_HDR_MIT,
    _NEARDUP_TAIL,
    _STRIP_TMPL,
    _UNUSED_TMPL,
)
from .seg04 import (
    _API_TMPL,
    _CMTLANG_TMPL,
    _LANGDET_TMPL,
    _NLPL_TAIL,
    _NLPL_TMPL,
    _UNSAFE_TMPL,
)
from .seg05 import _type2_chain_sql




def _maintainability_oracle_sql() -> str:
    """Replay q_maintainability by composing the two INDEPENDENT
    component derivations over the same _CPLX_SNIPPETS synthesis:
    Halstead volume via the unnest + filtered-aggregate form (the
    _halstead_oracle_sql derivation, not Spark's array HOFs), the
    McCabe proxy via per-lang regexp counts + &&/|| replace-length
    deltas, then the MI_COEFFS arithmetic with the same greatest(V, 1)
    ln-guard and 0-floor."""
    from schema_validator_spark.operators.complexity import (
        DECISION_SYNTAX,
        decision_pattern,
    )
    from schema_validator_spark.operators.dobf import TOKEN_RE
    from schema_validator_spark.operators.halstead import OPERATOR_CHAR_RE
    from schema_validator_spark.operators.maintainability import MI_COEFFS

    def _stripe(lg: str) -> str:
        head, mid, tail = _CPLX_SNIPPETS[lg]
        if not mid:
            return _duck_lit(head)
        return (
            f"{_duck_lit(head)} || repeat({_duck_lit(mid)},"
            f" doc_id % 5 + 1) || {_duck_lit(tail)}"
        )

    kw_case = _kw_case_sql("t")
    dec_whens = "\n                 ".join(
        "when '{lg}' then len(regexp_extract_all(content, '{pat}'))"
        .format(lg=lg, pat=_esc_sq(decision_pattern(words)))
        for lg, (words, _) in sorted(DECISION_SYNTAX.items())
    )
    op_langs = ", ".join(
        f"'{lg}'"
        for lg, (_, ops) in sorted(DECISION_SYNTAX.items())
        if ops
    )
    a0, av, ac, al = MI_COEFFS
    return f"""
      with synth as (
        select doc_id,
               case when doc_id % 31 = 0 then null
                    when doc_id % 4 = 0 then 'py'
                    when doc_id % 4 = 1 then 'go'
                    when doc_id % 4 = 2 then 'js'
                    else 'cobol' end as lang,
               coalesce(case when doc_id % 29 = 0 then null
                    when doc_id % 4 = 0 then {_stripe("py")}
                    when doc_id % 4 = 1 then {_stripe("go")}
                    when doc_id % 4 = 2 then {_stripe("js")}
                    else {_stripe("cobol")} end, '') as content
        from documents
      ), tl as (
        select doc_id, lang, content,
               regexp_extract_all(content, '{_esc_sq(TOKEN_RE)}') as toks,
               regexp_extract_all(content,
                                  '{_esc_sq(OPERATOR_CHAR_RE)}') as ops
        from synth
      ), tok as (
        select doc_id, lang, unnest(toks) as t from tl
      ), wordc as (
        select doc_id,
               count(*) filter (where regexp_matches(t, '^[A-Za-z0-9_]')
                                and not ({kw_case})) as opnd_total,
               count(distinct t) filter (
                 where regexp_matches(t, '^[A-Za-z0-9_]')
                 and not ({kw_case})) as opnd_distinct,
               count(*) filter (where regexp_matches(t, '^[A-Za-z_]')
                                and ({kw_case})) as kw_total,
               count(distinct t) filter (
                 where regexp_matches(t, '^[A-Za-z_]')
                 and ({kw_case})) as kw_distinct
        from tok group by doc_id, lang
      ), opc as (
        select doc_id, count(*) as op_total,
               count(distinct c) as op_distinct
        from (select doc_id, unnest(ops) as c from tl) group by doc_id
      ), vol as (
        select tl.doc_id,
               coalesce(w.kw_distinct, 0)
                 + coalesce(o.op_distinct, 0) as n1,
               coalesce(w.opnd_distinct, 0) as n2,
               coalesce(w.kw_total, 0) + coalesce(o.op_total, 0) as big_n1,
               coalesce(w.opnd_total, 0) as big_n2
        from tl
        left join wordc w using (doc_id)
        left join opc o using (doc_id)
      ), cc as (
        select doc_id,
               len(string_split(content, chr(10))) as n_lines,
               cast(case coalesce(lower(lang), '')
                 {dec_whens}
                 else 0 end as int) as n_decisions,
               cast(case when coalesce(lower(lang), '') in ({op_langs})
                 then (length(content)
                       - length(replace(content, '&&', ''))
                       + length(content)
                       - length(replace(content, '||', ''))) / 2
                 else 0 end as int) as n_bool_ops
        from synth
      ), m as (
        select s.doc_id, s.lang,
               case when v.n1 + v.n2 > 0
                    then (v.big_n1 + v.big_n2) * log2(v.n1 + v.n2)
                    else 0.0 end as volume,
               c.n_decisions + c.n_bool_ops + 1 as cyclomatic,
               c.n_lines
        from synth s
        join vol v using (doc_id)
        join cc c using (doc_id)
      )
      select doc_id, lang, volume, cyclomatic, n_lines,
             greatest(0.0, 100.0 * ({a0} - {av} * ln(greatest(volume, 1.0))
                                    - {ac} * cyclomatic
                                    - {al} * ln(n_lines)) / {a0}) as mi
      from m
    """


_FILE_HISTORY_ORACLE_SQL = """
      with synth as (
        select 'r' || cast(doc_id % 7 as varchar) as repo,
               'p' || cast(doc_id % 31 as varchar) as path,
               doc_id as commit_v,
               sha256(coalesce(
                 case when doc_id % 41 = 0 then null
                      else 'c' || cast(doc_id % 217 as varchar) || '-'
                           || cast((doc_id // 217) % 2 as varchar)
                 end, '')) as sha
        from documents
      )
      select repo, path,
             count(*) as n_versions,
             count(distinct sha) as n_distinct_versions,
             min(commit_v) as first_version,
             max(commit_v) as last_version,
             arg_max(sha, commit_v) as head_sha,
             round(1 - count(distinct sha) / cast(count(*) as double), 6)
               as churn_ratio
      from synth
      group by repo, path
"""


def _dead_symbols_oracle_sql() -> str:
    """Independent anti-join replay of q_dead_symbols from the SAME
    regex constants (publicapi.API_PATTERNS['py'], imports.IDENT_SCAN):
    defs and per-file distinct identifier mentions, mentions restricted
    to the repo's symbol dim, external use = mention at a non-defining
    file, dead = defs with no external use."""
    from schema_validator_spark.functions.imports import IDENT_SCAN
    from schema_validator_spark.functions.publicapi import API_PATTERNS

    py_pat = _esc_sq(API_PATTERNS["py"])
    ident = _esc_sq(IDENT_SCAN)
    return f"""
      with synth as (
        select 'r' || cast(doc_id % 13 as varchar) as repo,
               'p' || cast(doc_id as varchar) as path,
               'def s' || cast(doc_id % 29 as varchar) || '():'
                 || chr(10) || '    return 0' || chr(10)
                 || case when ((doc_id % 29 + 1) % 29) % 4 <> 0
                    then 'x = s'
                         || cast((doc_id % 29 + 1) % 29 as varchar)
                         || chr(10)
                    else '' end as content
        from documents
      ), defs as (
        select distinct * from (
          select repo, path,
                 unnest(regexp_extract_all(content, '{py_pat}', 1))
                   as symbol
          from synth)
      ), symdim as (
        select distinct repo, symbol from defs
      ), ment as (
        select distinct * from (
          select repo, path,
                 unnest(list_distinct(
                   regexp_extract_all(content, '{ident}'))) as symbol
          from synth)
      ), ext as (
        select distinct m.repo, m.symbol
        from ment m
        join symdim sd on sd.repo = m.repo and sd.symbol = m.symbol
        where not exists (
          select 1 from defs d
          where d.repo = m.repo and d.path = m.path
            and d.symbol = m.symbol)
      )
      select d.repo, 'py' as lang, d.symbol,
             cast(count(distinct d.path) as bigint) as n_def_files
      from defs d
      where not exists (
        select 1 from ext e
        where e.repo = d.repo and e.symbol = d.symbol)
      group by d.repo, d.symbol
    """


#: independent lag-window replay of q_edit_pairs (same synthesis
#: arithmetic; the diff is derived with DuckDB list ops, not Spark's)
_EDIT_PAIRS_ORACLE_SQL = """
      with synth as (
        select 'r' || cast(doc_id % 7 as varchar) as repo,
               'p' || cast(doc_id % 31 as varchar) as path,
               doc_id as commit_v,
               case when doc_id % 41 = 0 then null
                    else 'h' || cast(doc_id % 217 as varchar) || chr(10)
                         || 's' || cast((doc_id // 217 // 2) % 2
                                        as varchar) || chr(10)
                         || 't' || cast((doc_id // 217 // 2) % 3
                                        as varchar)
               end as content
        from documents
      ), base as (
        select repo, path, commit_v,
               list_distinct(string_split(coalesce(content, ''),
                                          chr(10))) as ln,
               sha256(coalesce(content, '')) as sha
        from synth
      ), lagged as (
        select repo, path, commit_v, ln, sha,
               lag(commit_v) over w as pv,
               lag(ln) over w as pl,
               lag(sha) over w as ps,
               row_number() over w as rn
        from base
        window w as (partition by repo, path
                     order by commit_v asc, sha asc)
      ), d as (
        select repo, path, pv, commit_v, sha, ps,
               len(list_filter(ln, x -> not list_contains(pl, x)))
                 as n_added,
               len(list_filter(pl, x -> not list_contains(ln, x)))
                 as n_removed,
               len(list_intersect(ln, pl)) as n_common
        from lagged where rn >= 2
      )
      select repo, path, pv as from_version, commit_v as to_version,
             cast(n_added as bigint) as n_added,
             cast(n_removed as bigint) as n_removed,
             cast(n_common as bigint) as n_common,
             round(n_common / cast(n_added + n_removed + n_common
                                   as double), 6) as line_jaccard,
             sha <> ps as changed
      from d
"""


#: independent replay of q_commit_pairs: same lag-window diff as the
#: edit_pairs oracle plus the message-quality verdict (subject = first
#: line trimmed; reject regex identical byte-for-byte to
#: history.MSG_REJECT_RE — ASCII classes only, so RE2 == Java)
_COMMIT_PAIRS_REJECT_RE = (
    "(?i)(^(merge[sd]?|merging|revert(ed|ing|s)?|rollback|"
    "cherry.?pick(ed|ing|s)?|bump(ed|ing|s)?|wip|auto|automated|"
    "automatic)([^a-z0-9_]|$))"
    "|(?i)(co-authored-by|signed-off-by|dependabot|renovate|\\[bot\\]|"
    "\\[skip ci\\])"
)

_COMMIT_PAIRS_ORACLE_SQL = f"""
      with synth as (
        select 'r' || cast(doc_id % 5 as varchar) as repo,
               'p' || cast(doc_id % 17 as varchar) as path,
               doc_id as commit_v,
               'h' || chr(10) || 'c'
                 || cast((doc_id // 170) % 3 as varchar) as content,
               case doc_id % 7
                 when 0 then 'Fix the parser state machine'
                 when 1 then 'Merge branch ''main'' into dev'
                 when 2 then 'fix'
                 when 3 then null
                 when 4 then 'Improve error reporting' || chr(10)
                             || chr(10) || 'Co-authored-by: bot <b@x>'
                 when 5 then 'Bumped version to 2.0'
                 else 'Add handling for empty import lists'
               end as message
        from documents
      ), base as (
        select repo, path, commit_v, message,
               list_distinct(string_split(coalesce(content, ''),
                                          chr(10))) as ln,
               sha256(coalesce(content, '')) as sha
        from synth
      ), lagged as (
        select repo, path, commit_v, message, ln, sha,
               lag(commit_v) over w as pv,
               lag(ln) over w as pl,
               lag(sha) over w as ps,
               row_number() over w as rn
        from base
        window w as (partition by repo, path
                     order by commit_v asc, sha asc)
      ), scored as (
        select repo, path, pv as from_version, commit_v as to_version,
               trim(string_split(coalesce(message, ''), chr(10))[1])
                 as subject,
               coalesce(message, '') as raw,
               len(list_filter(ln, x -> not list_contains(pl, x)))
                 as n_added,
               len(list_filter(pl, x -> not list_contains(ln, x)))
                 as n_removed,
               len(list_intersect(ln, pl)) as n_common
        from lagged where rn >= 2 and sha <> ps
      )
      select repo, path, from_version, to_version,
             subject as message,
             cast(n_added as bigint) as n_added,
             cast(n_removed as bigint) as n_removed,
             cast(n_common as bigint) as n_common,
             round(n_common / cast(n_added + n_removed + n_common
                                   as double), 6) as line_jaccard,
             ((length(subject) between 10 and 200)
              and regexp_matches(subject, '[A-Za-z]')
              and not regexp_matches(raw,
                    '{_COMMIT_PAIRS_REJECT_RE}')) as msg_ok
      from scored
"""


#: full-outer-join replay of q_mixture_plan's mixture arithmetic
#: (weights normalized to exact decimals 0.1/0.2/0.5/0.2, budget 10^6)
_MIXTURE_PLAN_ORACLE_SQL = """
      with synth as (
        select case when doc_id % 4 = 3 then 'extra'
                    else 'src' || cast(doc_id % 4 as varchar)
               end as source,
               strlen(text) as n_tokens
        from documents
      ), counted as (
        select source, count(*) as n_docs,
               sum(greatest(coalesce(n_tokens, 0), 0)) as n_tokens
        from synth group by 1
      ), plan as (
        select * from (values
          ('ghost', cast(0.2 as double)),
          ('src0', cast(0.1 as double)),
          ('src1', cast(0.2 as double)),
          ('src2', cast(0.5 as double))) t(source, weight)
      ), joined as (
        select coalesce(c.source, p.source) as source,
               coalesce(c.n_docs, 0) as n_docs,
               coalesce(c.n_tokens, 0) as n_tokens,
               p.weight,
               round(1000000.0 * p.weight) as target
        from counted c full outer join plan p on c.source = p.source
      )
      select source,
             cast(n_docs as bigint) as n_docs,
             cast(n_tokens as bigint) as n_tokens,
             coalesce(round(weight, 6), -1.0) as weight,
             coalesce(cast(target as bigint), -1) as target_tokens,
             coalesce(case when n_tokens > 0
                           then round(target / cast(n_tokens as double), 6)
                      end, -1.0) as sample_rate,
             coalesce(cast(ceil(case when n_tokens > 0
                                     then round(target
                                                / cast(n_tokens as double),
                                                6)
                                end) as int), -1) as epochs
      from joined
"""


def _nlpl_oracle_sql() -> str:
    """Replay q_nlpl_pairs from the SAME constants: rebuild the lead
    chunk per stripe (_NLPL_TMPL unit minus its trailing newline — the
    tail's def line follows it), sha256 it (pins the chunker
    byte-exactly), and apply the SAME anchored regexes
    (docpairs.PY_NAME_RE / PY_SIG_RE / py_doc_re) in RE2.  Only
    stripes 0-2 pair: 3 has no docstring, 4 is lang-filtered."""
    from schema_validator_spark.operators.docpairs import (
        PY_NAME_RE,
        PY_SIG_RE,
        py_doc_re,
    )

    def _chunk0(i: int) -> str:
        p, s = _NLPL_TMPL[i]
        return (
            f"{_duck_lit(p)} || cast(doc_id as varchar)"
            f" || {_duck_lit(s[:-1])}"
        )

    d1, d2 = _esc_sq(py_doc_re('"')), _esc_sq(py_doc_re("'"))
    return f"""
      with chunk0 as (
        select doc_id,
               case when doc_id % 5 = 0 then {_chunk0(0)}
                    when doc_id % 5 = 1 then {_chunk0(1)}
                    else {_chunk0(2)} end as chunk_text
        from documents where doc_id % 5 in (0, 1, 2)
      )
      select doc_id, 0 as chunk_idx,
             sha256(chunk_text) as chunk_sha,
             regexp_extract(chunk_text, '{_esc_sq(PY_NAME_RE)}', 1)
               as func_name,
             regexp_extract(chunk_text, '{_esc_sq(PY_SIG_RE)}', 1)
               as signature,
             case when regexp_matches(chunk_text, '{d1}')
                    then regexp_extract(chunk_text, '{d1}', 1)
                  when regexp_matches(chunk_text, '{d2}')
                    then regexp_extract(chunk_text, '{d2}', 1)
             end as docstring
      from chunk0
    """


def _docstring_coverage_oracle_sql() -> str:
    """Replay q_docstring_coverage: rebuild BOTH chunks per py doc
    (the striped unit minus its trailing newline + the tail — same
    chunk reconstruction as _nlpl_oracle_sql), apply the SAME anchored
    regexes (is-function head probe, both docstring styles), aggregate
    per repo."""
    from schema_validator_spark.operators.docpairs import (
        _PY_HEAD,
        py_doc_re,
    )

    def _chunk0(i: int) -> str:
        p, s = _NLPL_TMPL[i]
        return (
            f"{_duck_lit(p)} || cast(doc_id as varchar)"
            f" || {_duck_lit(s[:-1])}"
        )

    head = _esc_sq(_PY_HEAD)
    d1, d2 = _esc_sq(py_doc_re('"')), _esc_sq(py_doc_re("'"))
    return f"""
      with chunks as (
        select doc_id,
               case when doc_id % 5 = 0 then {_chunk0(0)}
                    when doc_id % 5 = 1 then {_chunk0(1)}
                    when doc_id % 5 = 2 then {_chunk0(2)}
                    else {_chunk0(3)} end as chunk
        from documents where doc_id % 5 in (0, 1, 2, 3)
        union all
        select doc_id, {_duck_lit(_NLPL_TAIL)} as chunk
        from documents where doc_id % 5 in (0, 1, 2, 3)
      ), flags as (
        select 'r' || cast(doc_id % 10 as varchar) as repo,
               case when regexp_matches(chunk, '{head}')
                    then 1 else 0 end as fn,
               case when regexp_matches(chunk, '{d1}')
                      or regexp_matches(chunk, '{d2}')
                    then 1 else 0 end as doc
        from chunks
      )
      select repo,
             cast(sum(fn) as bigint) as n_functions,
             cast(sum(fn * doc) as bigint) as n_documented,
             round(sum(fn * doc) / cast(sum(fn) as double), 6)
               as doc_coverage
      from flags group by repo having sum(fn) > 0
    """


def _test_mapping_oracle_sql() -> str:
    """Replay q_test_mapping: same path synthesis, same basename/ext/
    stem parsing regexes, the tested-stem CASE generated from the SAME
    module constants (_TEST_PREFIX/_TEST_SUFFIXES), the collapsed
    (repo, ext, stem) key aggregation, repo rollup."""
    from schema_validator_spark.operators.testmap import (
        _TEST_PREFIX,
        _TEST_SUFFIXES,
    )

    np = len(_TEST_PREFIX)
    whens = [
        f"when starts_with(stem, '{_TEST_PREFIX}')"
        f" and length(stem) > {np} then substr(stem, {np + 1})"
    ]
    for suf in _TEST_SUFFIXES:
        ns = len(suf)
        whens.append(
            f"when ends_with(stem, '{suf}') and length(stem) > {ns}"
            f" then substr(stem, 1, length(stem) - {ns})"
        )
    tstem_case = "\n                 ".join(whens)
    return rf"""
      with synth as (
        select 'r' || cast((doc_id // 5) % 7 as varchar) as repo,
               case when doc_id % 5 = 0 then
                      'src/m' || cast((doc_id // 5) % 50 as varchar)
                      || '.py'
                    when doc_id % 5 = 1 then
                      case when (doc_id // 5) % 3 = 0 then
                        'src/extra'
                        || cast((doc_id // 5) % 50 as varchar) || '.py'
                      else
                        'tests/test_m'
                        || cast((doc_id // 5) % 50 as varchar) || '.py'
                      end
                    when doc_id % 5 = 2 then
                      'pkg/n' || cast((doc_id // 5) % 50 as varchar)
                      || '.go'
                    when doc_id % 5 = 3 then
                      case when (doc_id // 5) % 4 = 0 then
                        'tests/orphan'
                        || cast((doc_id // 5) % 50 as varchar)
                        || '_test.go'
                      else
                        'pkg/n' || cast((doc_id // 5) % 50 as varchar)
                        || '_test.go'
                      end
                    else
                      'web/c' || cast((doc_id // 5) % 50 as varchar)
                      || '.test.js'
               end as path
        from documents
      ), parts as (
        select repo,
               lower(regexp_extract(b, '\.([A-Za-z0-9]+)$', 1)) as ext,
               regexp_replace(b, '\.([A-Za-z0-9]+)$', '') as stem
        from (select repo,
                     regexp_extract(path, '([^/]+)$', 1) as b
              from synth)
      ), cls as (
        select repo, ext, stem,
               case {tstem_case}
                    else null end as tstem
        from parts
      ), keyed as (
        select repo, ext, coalesce(tstem, stem) as k,
               sum(case when tstem is null then 1 else 0 end) as n_src,
               sum(case when tstem is not null then 1 else 0 end)
                 as n_tst
        from cls group by 1, 2, 3
      )
      select repo,
             cast(sum(n_src) as bigint) as n_source_files,
             cast(sum(n_tst) as bigint) as n_test_files,
             cast(sum(case when n_src > 0 and n_tst > 0
                           then n_src else 0 end) as bigint)
               as n_tested_sources,
             cast(sum(case when n_src = 0 then n_tst else 0 end)
                  as bigint) as n_orphan_tests,
             case when sum(n_src) > 0 then
               round(sum(case when n_src > 0 and n_tst > 0
                              then n_src else 0 end)
                     / cast(sum(n_src) as double), 6)
             end as test_coverage
      from keyed group by repo
    """


def _type2_clones_oracle_sql() -> str:
    """Replay q_type2_clones from the SAME constants (_CLONE_TMPL via
    _duck_lit; clones.STRING_PATTERNS / COMMENT_SYNTAX /
    NUMBER_PATTERN / IDENT_PATTERN / class tokens): synthesize the
    striped corpus, apply the identical ordered regexp_replace chain
    ('g' = replace-all, matching Spark's default), md5-group, filter
    empty normal forms and singletons."""

    _splice = _duck_splice

    synth_lang = "\n                 ".join(
        f"when doc_id % 5 = {i} then '{lg}'"
        for i, (lg, _, _, _) in sorted(_CLONE_TMPL.items())
    )
    synth_content = "\n                 ".join(
        f"when doc_id % 5 = {i} then ({_splice(h)})"
        f" || repeat({_splice(ln)}, cast(1 + doc_id % 3 as int))"
        f" || ({_splice(ft)})"
        for i, (_, h, ln, ft) in sorted(_CLONE_TMPL.items())
    )
    s1, comment_case, norm = _type2_chain_sql("content")
    return f"""
      with synth as (
        select doc_id,
               'repo_' || cast(doc_id % 10 as varchar) as repo,
               case {synth_lang} end as lang,
               case {synth_content} end as content
        from documents
      ), st1 as (
        select doc_id, repo, lang, {s1} as s1 from synth
      ), st2 as (
        select doc_id, repo, {comment_case} as s2 from st1
      ), nf as (
        select doc_id, repo, {norm} as norm from st2
      )
      select md5(norm) as clone_key,
             count(*) as n_files,
             count(distinct repo) as n_repos,
             min(doc_id) as representative
      from nf
      where length(norm) > 0
      group by md5(norm)
      having count(*) >= 2
    """


def _code_contamination_oracle_sql() -> str:
    """Replay q_code_contamination from the SAME constants
    (_CONTAM_TMPL / _CONTAM_TAIL / _CONTAM_CLEAN via _duck_lit; the
    shared _type2_chain_sql): synthesize both sides, normalize, build
    distinct token 6-grams (inclusive-slice arithmetic: w[i:i+5] is 6
    tokens, starts range(1, len(w)-4) — same convention as the green
    `contamination` oracle), join train grams against the distinct
    eval gram set, aggregate per doc."""

    _splice = _duck_splice

    ev_lang = "\n                 ".join(
        f"when doc_id = {i} then '{lg}'"
        for i, (lg, _) in sorted(_CONTAM_TMPL.items())
    )
    ev_content = "\n                 ".join(
        f"when doc_id = {i} then ({_splice(tmpl, chr(39) + '0' + chr(39))})"
        for i, (_, tmpl) in sorted(_CONTAM_TMPL.items())
    )
    t = "cast(floor(doc_id / 4) as bigint) % 5"
    k = "cast(doc_id as varchar)"
    tr_tmpl_lang = "\n                 ".join(
        f"when {t} = {i} then '{lg}'"
        for i, (lg, _) in sorted(_CONTAM_TMPL.items())
    )
    tr_tmpl_content = "\n                 ".join(
        f"when {t} = {i} then ({_splice(tmpl, k)})"
        for i, (_, tmpl) in sorted(_CONTAM_TMPL.items())
    )
    tr_lang = f"""case when doc_id % 4 <= 1 then (case {tr_tmpl_lang} end)
                 when doc_id % 4 = 2 then '{_CONTAM_CLEAN[2][0]}'
                 else '{_CONTAM_CLEAN[3][0]}' end"""
    tr_content = f"""case
                 when doc_id % 4 = 0 then (case {tr_tmpl_content} end)
                 when doc_id % 4 = 1 then (case {tr_tmpl_content} end)
                   || {_duck_lit(_CONTAM_TAIL)}
                 when doc_id % 4 = 2 then {_duck_lit(_CONTAM_CLEAN[2][1])}
                 else {_duck_lit(_CONTAM_CLEAN[3][1])} end"""
    s1, comment_case, norm = _type2_chain_sql("content")
    shingle = r"""
        select {ids} list_filter(string_split_regex(trim(norm), '\s+'),
                                 t -> t <> '') as w
        from {src} where length(norm) > 0"""
    grams = """
        select {ids} case when len(w) >= 6
                 then list_distinct(list_transform(range(1, len(w) - 4),
                        i -> array_to_string(w[i:i+5], ' ')))
                 else [array_to_string(w, ' ')] end as g_all
        from {src}"""
    return f"""
      with ev_synth as (
        select doc_id, case {ev_lang} end as lang,
               case {ev_content} end as content
        from documents where doc_id < 5
      ), ev1 as (select lang, {s1} as s1 from ev_synth
      ), ev2 as (select {comment_case} as s2 from ev1
      ), evn as (select {norm} as norm from ev2
      ), evw as ({shingle.format(ids="", src="evn")}
      ), evga as ({grams.format(ids="", src="evw")}
      ), evg as (select distinct unnest(g_all) as g from evga
      ), tr_synth as (
        select doc_id, {tr_lang} as lang, {tr_content} as content
        from documents
      ), tr1 as (select doc_id, lang, {s1} as s1 from tr_synth
      ), tr2 as (select doc_id, {comment_case} as s2 from tr1
      ), trn as (select doc_id, {norm} as norm from tr2
      ), trw as ({shingle.format(ids="doc_id,", src="trn")}
      ), trga as ({grams.format(ids="doc_id,", src="trw")}
      ), trg as (
        select doc_id, cast(len(g_all) as int) as n_grams,
               unnest(g_all) as g
        from trga
      )
      select doc_id, max(n_grams) as n_grams,
             cast(count(*) as bigint) as n_shared,
             round(cast(count(*) as double) / max(n_grams), 6) as share
      from trg join evg using (g)
      group by doc_id
    """


def _strip_headers_oracle_sql() -> str:
    """Replay q_strip_headers from the SAME constants (_STRIP_TMPL via
    _duck_splice; licenses SHEBANG_RE / CODING_RE / _LINE_RUN_HEAD /
    BLOCK_HEAD_RE / HEADER_MARKER_RE): per-stripe head detection,
    marker gate, substring rebuild, md5."""
    from schema_validator_spark.operators.licenses import (
        BLOCK_HEAD_RE,
        CODING_RE,
        HEADER_MARKER_RE,
        SHEBANG_RE,
        _HEADER_SYNTAX,
        _LINE_RUN_HEAD,
    )

    synth_lang = "\n                 ".join(
        f"when doc_id % 4 = {i} then '{lg}'"
        for i, (lg, _) in sorted(_STRIP_TMPL.items())
    )
    synth_content = "\n                 ".join(
        f"when doc_id % 4 = {i} then ({_duck_splice(tmpl)})"
        for i, (_, tmpl) in sorted(_STRIP_TMPL.items())
    )
    mk = _esc_sq(HEADER_MARKER_RE)

    def head_expr(lg: str) -> str:
        prefix, has_block = _HEADER_SYNTAX[lg]
        run = f"regexp_extract(rest, '{_esc_sq(_LINE_RUN_HEAD[prefix])}')"
        e = (
            f"case when {run} <> '' and regexp_matches({run}, '{mk}')"
            f" then {run} else '' end"
        )
        if has_block:
            blk = f"regexp_extract(rest, '{_esc_sq(BLOCK_HEAD_RE)}')"
            e = (
                f"case when {blk} <> '' and"
                f" regexp_matches({blk}, '{mk}') then {blk} else ({e}) end"
            )
        return e

    head_case = "\n               ".join(
        f"when lang = '{lg}' then ({head_expr(lg)})"
        for lg in sorted({lg for lg, _ in _STRIP_TMPL.values()})
    )
    return f"""
      with synth as (
        select doc_id,
               case {synth_lang} end as lang,
               case {synth_content} end as content
        from documents
      ), sh as (
        select doc_id, lang,
               regexp_extract(content, '{_esc_sq(SHEBANG_RE)}') as she,
               content
        from synth
      ), r0 as (
        select doc_id, lang, she,
               case when lang = 'py' then regexp_extract(
                 substring(content, length(she) + 1),
                 '{_esc_sq(CODING_RE)}')
               else '' end as cod,
               content
        from sh
      ), r as (
        select doc_id, lang, she || cod as she,
               substring(content, length(she) + length(cod) + 1) as rest
        from r0
      ), h as (
        select doc_id, she, rest,
               case {head_case} else '' end as head
        from r
      )
      select doc_id,
             length(head) > 0 as header_removed,
             cast(length(head)
                  - length(replace(head, chr(10), '')) as int)
               as header_lines,
             md5(she || substring(rest, length(head) + 1)) as clean_md5
      from h
    """


def _code_neardup_oracle_sql() -> str:
    """Replay q_code_neardup as EXACT all-pairs (the ground truth the
    LSH-blocked plan must equal): synthesize the striped corpus from
    the SAME constants, replay the py header strip
    (licenses SHEBANG_RE / CODING_RE / _LINE_RUN_HEAD['#'] /
    HEADER_MARKER_RE), the codedup lexer + bigram shingles, then every
    (a < b) pair's exact Jaccard at the 0.8 threshold."""
    from schema_validator_spark.operators.codedup import (
        CODE_TOKEN_SPLIT_RE,
    )
    from schema_validator_spark.operators.licenses import (
        CODING_RE,
        HEADER_MARKER_RE,
        SHEBANG_RE,
        _LINE_RUN_HEAD,
    )

    pid = "cast(floor(doc_id / 2) as bigint)"
    k0 = f"'0' || cast({pid} as varchar)"
    k1 = "'1' || cast(doc_id as varchar)"
    k2 = f"'2' || cast({pid} as varchar)"
    gpl = _duck_lit(_NEARDUP_HDR_GPL)
    mit = _duck_lit(_NEARDUP_HDR_MIT)
    body0 = _duck_splice(_NEARDUP_BODY, k0)
    tail0 = _duck_splice(_NEARDUP_TAIL, k0)
    body1 = _duck_splice(_NEARDUP_BODY, k1)
    body2 = _duck_splice(_NEARDUP_BODY2, k2)
    run = f"regexp_extract(rest, '{_esc_sq(_LINE_RUN_HEAD['#'])}')"
    mk = _esc_sq(HEADER_MARKER_RE)
    split = _esc_sq(CODE_TOKEN_SPLIT_RE)
    return f"""
      with synth as (
        select doc_id,
               case
                 when {pid} % 3 = 0 and doc_id % 2 = 0
                   then {gpl} || ({body0})
                 when {pid} % 3 = 0
                   then {mit} || ({body0}) || ({tail0})
                 when {pid} % 3 = 1 then {gpl} || ({body1})
                 when doc_id % 2 = 0 then {gpl} || ({body2})
                 else ({body2})
               end as content
        from documents
      ), shb as (
        select doc_id,
               regexp_extract(content, '{_esc_sq(SHEBANG_RE)}') as she,
               content
        from synth
      ), r0 as (
        select doc_id, she,
               regexp_extract(substring(content, length(she) + 1),
                              '{_esc_sq(CODING_RE)}') as cod,
               content
        from shb
      ), r as (
        select doc_id, she || cod as she,
               substring(content, length(she) + length(cod) + 1) as rest
        from r0
      ), cl as (
        select doc_id,
               she || substring(rest,
                 length(case when {run} <> ''
                              and regexp_matches({run}, '{mk}')
                        then {run} else '' end) + 1) as c
        from r
      ), t as (
        select doc_id,
               list_filter(string_split_regex(lower(c), '{split}'),
                           x -> x <> '') as tk
        from cl
      ), g as (
        select doc_id,
               list_distinct(
                 case when len(tk) >= 2
                   then list_transform(range(1, len(tk)),
                                       i -> tk[i] || ' ' || tk[i + 1])
                   else [array_to_string(tk, ' ')]
                 end) as sh
        from t
      )
      select id_a, id_b, jaccard from (
        select a.doc_id as id_a, b.doc_id as id_b,
               round(len(list_intersect(a.sh, b.sh))::double
                     / len(list_distinct(list_concat(a.sh, b.sh))), 6)
                 as jaccard
        from g a join g b on a.doc_id < b.doc_id
      ) where jaccard >= 0.8
    """


def _embedded_text_oracle_sql() -> str:
    """Replay q_embedded_text from the SAME constants (_EMBED_TMPL via
    _duck_splice; clones.STRING_PATTERNS / S_TOK /
    codequality.COMMENT_SYNTAX): the staged extract-and-mask string
    chain (e0..e4 CTE columns), then per-stripe comment extraction
    from the masked residue, block before line."""
    from schema_validator_spark.operators.clones import (
        S_TOK,
        STRING_PATTERNS,
    )
    from schema_validator_spark.operators.codequality import (
        COMMENT_SYNTAX,
    )

    synth_lang = "\n                 ".join(
        f"when doc_id % 4 = {i} then '{lg}'"
        for i, (lg, _) in sorted(_EMBED_TMPL.items())
    )
    synth_content = "\n                 ".join(
        f"when doc_id % 4 = {i} then ({_duck_splice(tmpl)})"
        for i, (_, tmpl) in sorted(_EMBED_TMPL.items())
    )
    stages = []
    for i, pat in enumerate(STRING_PATTERNS):
        stages.append(
            f"st{i + 1} as (select doc_id, lang,"
            f" regexp_extract_all(e{i}, '{_esc_sq(pat)}') as x{i + 1},"
            f" regexp_replace(e{i}, '{_esc_sq(pat)}', '{S_TOK}', 'g')"
            f" as e{i + 1}"
            + (", " + ", ".join(f"x{j}" for j in range(1, i + 1))
               if i else "")
            + f" from st{i})"
        )
    n = len(STRING_PATTERNS)
    strings_arr = " || ".join(f"x{j}" for j in range(1, n + 1))
    comment_whens = []
    for lg, (line_pat, blk_pat) in sorted(COMMENT_SYNTAX.items()):
        if blk_pat:
            e = (
                f"list_concat("
                f"regexp_extract_all(e{n}, '{_esc_sq(blk_pat)}'), "
                f"regexp_extract_all(regexp_replace(e{n},"
                f" '{_esc_sq(blk_pat)}', '', 'g'),"
                f" '{_esc_sq(line_pat)}'))"
            )
        else:
            e = f"regexp_extract_all(e{n}, '{_esc_sq(line_pat)}')"
        comment_whens.append(f"when lang = '{lg}' then {e}")
    comment_case = (
        "case " + "\n                 ".join(comment_whens)
        + " else [] end"
    )
    return f"""
      with st0 as (
        select doc_id,
               case {synth_lang} end as lang,
               case {synth_content} end as e0
        from documents
      ), {", ".join(stages)}
      select doc_id, 'string' as kind,
             unnest({strings_arr}) as text
      from st{n}
      union all
      select doc_id, 'comment' as kind,
             unnest({comment_case}) as text
      from st{n}
    """


def _comment_lang_oracle_sql() -> str:
    """Replay q_comment_lang from the SAME constants (_CMTLANG_TMPL via
    _duck_splice; clones.STRING_PATTERNS / S_TOK /
    codequality.COMMENT_SYNTAX; text._LANG_MARKERS): staged
    string-mask chain, per-lang comment extraction (block before
    line), per-file comment blob, the lang_id stopword cascade
    (sequential strict-greater argmax in _LANG_MARKERS order, CJK
    override), then the per-repo mix with a window share."""
    from schema_validator_spark.functions.text import _LANG_MARKERS
    from schema_validator_spark.operators.clones import (
        S_TOK,
        STRING_PATTERNS,
    )
    from schema_validator_spark.operators.codequality import (
        COMMENT_SYNTAX,
    )

    synth_lang = "\n                 ".join(
        f"when doc_id % 5 = {i} then '{lg}'"
        for i, (lg, _) in sorted(_CMTLANG_TMPL.items())
    )
    synth_content = "\n                 ".join(
        f"when doc_id % 5 = {i} then ({_duck_splice(tmpl)})"
        for i, (_, tmpl) in sorted(_CMTLANG_TMPL.items())
    )
    stages = []
    for i, pat in enumerate(STRING_PATTERNS):
        stages.append(
            f"st{i + 1} as (select repo, lang,"
            f" regexp_replace(e{i}, '{_esc_sq(pat)}', '{S_TOK}', 'g')"
            f" as e{i + 1} from st{i})"
        )
    n = len(STRING_PATTERNS)
    comment_whens = []
    for lg, (line_pat, blk_pat) in sorted(COMMENT_SYNTAX.items()):
        if blk_pat:
            e = (
                f"list_concat("
                f"regexp_extract_all(e{n}, '{_esc_sq(blk_pat)}'), "
                f"regexp_extract_all(regexp_replace(e{n},"
                f" '{_esc_sq(blk_pat)}', '', 'g'),"
                f" '{_esc_sq(line_pat)}'))"
            )
        else:
            e = f"regexp_extract_all(e{n}, '{_esc_sq(line_pat)}')"
        comment_whens.append(f"when lang = '{lg}' then {e}")
    comment_case = (
        "case " + "\n                 ".join(comment_whens)
        + " else [] end"
    )
    langs = list(_LANG_MARKERS)
    score_exprs = ",\n               ".join(
        f"len(list_intersect(toks, ["
        + ", ".join(f"'{w}'" for w in _LANG_MARKERS[lg])
        + f"])) as s_{lg}"
        for lg in langs
    )
    cascade = []
    for idx in range(len(langs) - 1, -1, -1):
        lg = langs[idx]
        conds = [f"s_{lg} > s_{e}" for e in langs[:idx]]
        conds.append(f"s_{lg} > 0")
        cascade.append(f"when {' and '.join(conds)} then '{lg}'")
    lid_case = (
        "case when cjk * 4 > nb then 'zh'\n                  "
        + "\n                  ".join(cascade)
        + " else 'unknown' end"
    )
    return f"""
      with st0 as (
        select 'r' || cast(doc_id % 7 as varchar) as repo,
               case {synth_lang} end as lang,
               case {synth_content} end as e0
        from documents
      ), {", ".join(stages)}, blobs as (
        select repo,
               array_to_string({comment_case}, chr(10)) as b,
               len({comment_case}) as nc
        from st{n}
      ), scored as (
        select repo,
               list_distinct(list_transform(
                 list_filter(string_split_regex(trim(b), '\\s+'),
                             t -> t <> ''),
                 t -> lower(t))) as toks,
               length(regexp_replace(b, '[^一-鿿]', '', 'g')) as cjk,
               length(b) as nb
        from blobs where nc > 0
      ), hits as (
        select repo, cjk, nb,
               {score_exprs}
        from scored
      ), lid as (
        select repo, {lid_case} as comment_lang from hits
      ), counts as (
        select repo, comment_lang, count(*) as n_files
        from lid group by repo, comment_lang
      )
      select repo, comment_lang, n_files,
             round(n_files / cast(sum(n_files) over
               (partition by repo) as double), 6) as share
      from counts
    """


def _repo_debt_oracle_sql() -> str:
    """Replay q_repo_debt from the SAME constants (_DEBT_TMPL via
    _duck_splice; codequality._marker_line_re / DEBT_MARKERS): split
    lines, full-match each against the identical per-line pattern,
    roll up per repo."""
    from schema_validator_spark.operators.codequality import (
        DEBT_MARKERS,
        _marker_line_re,
    )

    synth_content = "\n                 ".join(
        f"when doc_id % 4 = {i} then ({_duck_splice(tmpl)})"
        for i, (_, tmpl) in sorted(_DEBT_TMPL.items())
    )
    union = _marker_line_re("(?:" + "|".join(DEBT_MARKERS) + ")")
    marker_counts = ",\n               ".join(
        f"len(list_filter(ls, l -> regexp_matches(l,"
        f" '{_esc_sq(_marker_line_re(m))}'))) as n_{m.lower()}"
        for m in DEBT_MARKERS
    )
    marker_sums = ",\n             ".join(
        f"cast(sum(n_{m.lower()}) as bigint) as n_{m.lower()}"
        for m in DEBT_MARKERS
    )
    return f"""
      with synth as (
        select 'r' || cast(doc_id % 7 as varchar) as repo,
               case {synth_content} end as content
        from documents
      ), ln as (
        select repo, string_split(content, chr(10)) as ls from synth
      ), per as (
        select repo, len(ls) as n_lines,
               {marker_counts},
               len(list_filter(ls, l -> regexp_matches(l,
                 '{_esc_sq(union)}'))) as n_debt
        from ln
      )
      select repo, cast(count(*) as bigint) as n_files,
             cast(sum(n_lines) as bigint) as n_lines,
             {marker_sums},
             cast(sum(n_debt) as bigint) as n_debt_lines,
             round(1000 * cast(sum(n_debt) as double) / sum(n_lines), 6)
               as debt_per_kline
      from per group by repo
    """


def _unused_imports_oracle_sql() -> str:
    """Replay q_unused_imports from the SAME constants (_UNUSED_TMPL
    via _duck_splice; the binding/strip/scan regexes from
    functions/imports.py): synthesize the striped corpus, strip import
    lines, scan used identifiers, parse per-lang bindings with the
    identical list pipeline, and emit valid-distinct-unused bindings."""
    from schema_validator_spark.functions.imports import (
        GO_BLOCK_RE,
        GO_LINE_RE,
        GO_SINGLE_RE,
        IDENT_FULL,
        IDENT_SCAN,
        JAVA_BIND_RE,
        JS_BRACES_RE,
        JS_DEFAULT_RE,
        JS_NS_RE,
        JS_REQUIRE_RE,
        PY_FROM_RE,
        PY_IMPORT_RE,
        PY_TRIPLE_RE,
        STRIP_RES,
    )

    def strip(src: str, lg: str) -> str:
        e = src
        for pat in STRIP_RES[lg]:
            e = f"regexp_replace({e}, '{_esc_sq(pat)}', '', 'g')"
        return e

    def after_as(x: str) -> str:
        return (
            f"trim(string_split_regex(trim({x}),"
            r" '[ \t]+as[ \t]+')[-1])"
        )

    def items(src: str, pat: str) -> str:
        return (
            f"flatten(list_transform(regexp_extract_all({src},"
            f" '{_esc_sq(pat)}', 1), x -> string_split(x, ',')))"
        )

    synth_lang = "\n                 ".join(
        f"when doc_id % 5 = {i} then '{lg}'"
        for i, (lg, _) in sorted(_UNUSED_TMPL.items())
    )
    synth_content = "\n                 ".join(
        f"when doc_id % 5 = {i} then ({_duck_splice(tmpl)})"
        for i, (_, tmpl) in sorted(_UNUSED_TMPL.items())
    )
    py_bind = (
        f"list_concat("
        f"list_transform({items('mc', PY_FROM_RE)},"
        f" it -> {after_as('it')}), "
        f"list_transform({items('mc', PY_IMPORT_RE)},"
        f" it -> regexp_extract({after_as('it')},"
        f" '^([A-Za-z_][A-Za-z0-9_]*)', 1)))"
    )
    go_bind = (
        "list_filter(list_transform(range(1, len(pt) + 1),"
        " i -> case when coalesce(al[i], '') = ''"
        " then string_split(pt[i], '/')[-1]"
        " else al[i] end), b -> b <> '_')"
    )
    js_bind = (
        f"list_concat(list_concat("
        f"regexp_extract_all(content, '{_esc_sq(JS_DEFAULT_RE)}', 1), "
        f"regexp_extract_all(content, '{_esc_sq(JS_NS_RE)}', 1)), "
        f"list_concat("
        f"regexp_extract_all(content, '{_esc_sq(JS_REQUIRE_RE)}', 1), "
        f"list_transform({items('content', JS_BRACES_RE)},"
        f" it -> {after_as('it')})))"
    )
    jv_bind = (
        f"list_transform(regexp_extract_all(content,"
        f" '{_esc_sq(JAVA_BIND_RE)}', 1),"
        f" p -> string_split(p, '.')[-1])"
    )
    used = (
        "list_distinct(regexp_extract_all(rest,"
        f" '{_esc_sq(IDENT_SCAN)}'))"
    )
    return f"""
      with synth as (
        select doc_id,
               case {synth_lang} end as lang,
               case {synth_content} end as content
        from documents
      ), py as (
        select doc_id, lang,
               regexp_replace(content, '{_esc_sq(PY_TRIPLE_RE)}', '', 'g')
                 as mc,
               {strip('content', 'py')} as rest
        from synth where doc_id % 5 in (0, 1)
      ), pyb as (
        select doc_id, lang, {py_bind} as bind, {used} as used from py
      ), go1 as (
        select doc_id, lang, content, {strip('content', 'go')} as rest
        from synth where doc_id % 5 = 2
      ), go2 as (
        select doc_id, lang, rest,
               list_concat(
                 regexp_extract_all(content,
                   '{_esc_sq(GO_SINGLE_RE)}', 1),
                 regexp_extract_all(
                   array_to_string(regexp_extract_all(content,
                     '{_esc_sq(GO_BLOCK_RE)}', 1), chr(10)),
                   '{_esc_sq(GO_LINE_RE)}', 1)) as al,
               list_concat(
                 regexp_extract_all(content,
                   '{_esc_sq(GO_SINGLE_RE)}', 2),
                 regexp_extract_all(
                   array_to_string(regexp_extract_all(content,
                     '{_esc_sq(GO_BLOCK_RE)}', 1), chr(10)),
                   '{_esc_sq(GO_LINE_RE)}', 2)) as pt
        from go1
      ), gob as (
        select doc_id, lang, {go_bind} as bind, {used} as used from go2
      ), js as (
        select doc_id, lang, content, {strip('content', 'js')} as rest
        from synth where doc_id % 5 = 3
      ), jsb as (
        select doc_id, lang, {js_bind} as bind, {used} as used from js
      ), jv as (
        select doc_id, lang, content, {strip('content', 'java')} as rest
        from synth where doc_id % 5 = 4
      ), jvb as (
        select doc_id, lang, {jv_bind} as bind, {used} as used from jv
      ), allb as (
        select * from pyb union all select * from gob
        union all select * from jsb union all select * from jvb
      )
      select doc_id, lang,
             unnest(list_filter(
               list_distinct(list_filter(bind,
                 b -> regexp_matches(b, '{_esc_sq(IDENT_FULL)}'))),
               b -> not list_contains(used, b))) as binding
      from allb
    """


def _lang_detect_oracle_sql() -> str:
    """Replay q_lang_detect from the SAME constants (_LANGDET_TMPL via
    _duck_lit; langdetect.KEYWORD_SIGNALS / SHEBANG_RULES): per-lang
    merged-alternation keyword scores (the same merge_signal_patterns
    string Spark counts) as one union branch per lang, arg-max via
    row_number (score desc, lang desc — the struct-max tiebreak),
    shebang CASE in rule order on top, vocabulary + unknown filters."""
    from schema_validator_spark.operators.langdetect import (
        KEYWORD_SIGNALS,
        SHEBANG_RULES,
    )

    synth_lang = "\n                 ".join(
        f"when doc_id % 7 = {i} then '{lg}'"
        for i, (lg, _, _) in sorted(_LANGDET_TMPL.items())
    )
    synth_content = "\n                 ".join(
        f"when doc_id % 7 = {i} then"
        f" {_duck_lit(p)} || cast(doc_id as varchar) || {_duck_lit(s)}"
        for i, (_, p, s) in sorted(_LANGDET_TMPL.items())
    )
    from schema_validator_spark.operators.langdetect import (
        merge_signal_patterns,
    )

    score_branches = "\n            union all\n".join(
        """
            select doc_id, declared, content, '{lg}' as lang,
                   len(regexp_extract_all(content, '{alt}')) as score
            from synth""".format(
            lg=lg, alt=_esc_sq(merge_signal_patterns(pats))
        )
        for lg, pats in sorted(KEYWORD_SIGNALS.items())
    )
    shebang_whens = "\n                 ".join(
        f"when regexp_matches(content, '{_esc_sq(pat)}') then '{lg}'"
        for lg, pat in SHEBANG_RULES
    )
    vocab = ", ".join(
        f"'{lg}'"
        for lg in sorted(set(KEYWORD_SIGNALS) | {l for l, _ in SHEBANG_RULES})
    )
    return f"""
      with synth as (
        select doc_id,
               case {synth_lang} end as declared,
               case {synth_content} end as content
        from documents
      ), scores as ({score_branches}
      ), best as (
        select doc_id, declared, content, lang, score,
               row_number() over (partition by doc_id
                                  order by score desc, lang desc) as rn
        from scores
      ), det as (
        select doc_id, declared,
               case {shebang_whens}
                    when score > 0 then lang
                    else 'unknown' end as detected
        from best where rn = 1
      )
      select doc_id, declared as declared_lang,
             detected as detected_lang
      from det
      where detected <> 'unknown'
        and declared in ({vocab})
        and detected <> declared
    """


def _unsafe_oracle_sql() -> str:
    """Replay q_unsafe_apis from the SAME constants (_UNSAFE_TMPL
    synthesis via _duck_lit; operators/unsafe.UNSAFE_PATTERNS
    patterns): one union branch per (lang, class) pattern slot,
    len(regexp_extract_all) span counts, lang-scoped, zero-span rows
    filtered — the stack-unpivot's relational form."""
    from schema_validator_spark.operators.unsafe import (
        UNSAFE_PATTERNS,
        _flat,
    )

    synth_whens = "\n                 ".join(
        f"when doc_id % 6 = {i} then"
        f" {_duck_lit(p)} || cast(doc_id as varchar) || {_duck_lit(s)}"
        for i, (_, p, s) in sorted(_UNSAFE_TMPL.items())
    )
    lang_whens = "\n                 ".join(
        f"when doc_id % 6 = {i} then '{lg}'"
        for i, (lg, _, _) in sorted(_UNSAFE_TMPL.items())
    )
    branches = "\n            union all\n".join(
        f"""
            select doc_id, lang, '{name}' as api_class,
                   case when lang = '{lg}'
                        then len(regexp_extract_all(content,
                                 '{_esc_sq(pat)}'))
                        else 0 end as n_spans
            from synth"""
        for lg, name, pat in _flat(UNSAFE_PATTERNS)
    )
    return f"""
      with synth as (
        select doc_id,
               case {lang_whens} end as lang,
               case {synth_whens} end as content
        from documents
      )
      select doc_id, lang, api_class, cast(n_spans as int) as n_spans
      from ({branches})
      where n_spans > 0
    """


def _manifest_oracle_sql() -> str:
    """Replay q_manifest_deps from the SAME module regexes
    (operators/manifests.PIP_DEP_RE / GO_DEP_RE) and DuckDB's JSON
    reader for the npm stripe (json_valid guard mirrors from_json's
    null-on-malformed)."""
    from schema_validator_spark.operators.manifests import (
        GO_BLOCK_STRIP_RE,
        GO_DEP_RE,
        PIP_DEP_RE,
    )

    return f"""
      with synth as (
        select doc_id,
               case when doc_id % 4 = 0 then
                      'pkg' || cast(doc_id as varchar)
                      || '>=1.0' || chr(10) || '# c' || chr(10)
                      || 'numpy' || chr(10) || '-r base.txt' || chr(10)
                    when doc_id % 4 = 1 then
                      'module m' || cast(doc_id as varchar) || chr(10)
                      || 'require (' || chr(10) || chr(9)
                      || 'github.com/a/b' || cast(doc_id as varchar)
                      || ' v1.2.3' || chr(10) || ')' || chr(10)
                    when doc_id % 37 = 0 then '{{bad'
                    else '{{"dependencies": {{"react": "^18", "p'
                         || cast(doc_id as varchar)
                         || '": "1"}}, "devDependencies":'
                         || ' {{"jest": "^29"}}}}'
               end as content
        from documents where doc_id % 4 in (0, 1, 2)
      )
      select doc_id, 'pip_requirements' as manifest_type,
             unnest(regexp_extract_all(content,
                    '{_esc_sq(PIP_DEP_RE)}', 1)) as dep,
             'runtime' as kind
      from synth where doc_id % 4 = 0
      union all
      select doc_id, 'go_mod',
             unnest(regexp_extract_all(
                    regexp_replace(content,
                      '{_esc_sq(GO_BLOCK_STRIP_RE)}', '', 'g'),
                    '{_esc_sq(GO_DEP_RE)}', 1)), 'runtime'
      from synth where doc_id % 4 = 1
      union all
      select doc_id, 'npm_package',
             unnest(coalesce(case when json_valid(content)
               then json_keys(content, '$.dependencies') end,
               [])), 'runtime'
      from synth where doc_id % 4 = 2
      union all
      select doc_id, 'npm_package',
             unnest(coalesce(case when json_valid(content)
               then json_keys(content, '$.devDependencies') end,
               [])), 'dev'
      from synth where doc_id % 4 = 2
    """


def _public_api_oracle_sql() -> str:
    """Replay q_public_api from the SAME constants (_API_TMPL via
    _duck_lit; functions/publicapi.API_PATTERNS regexes in RE2): one
    union branch per registered-lang stripe (the cobol stripe exports
    nothing and has no branch)."""
    from schema_validator_spark.functions.publicapi import API_PATTERNS

    branches = []
    for i, (lg, p, s) in sorted(_API_TMPL.items()):
        if lg not in API_PATTERNS:
            continue
        content = (
            f"{_duck_lit(p)} || cast(doc_id as varchar)"
            f" || {_duck_lit(s)}"
        )
        branches.append(f"""
            select doc_id, '{lg}' as lang,
                   unnest(regexp_extract_all({content},
                          '{_esc_sq(API_PATTERNS[lg])}', 1)) as symbol
            from documents where doc_id % 5 = {i}""")
    return "\n            union all\n".join(branches)


def _license_oracle_sql() -> str:
    """Replay q_license_scan: identical header synthesis + the SAME
    marker phrases in the SAME priority order (single source of truth:
    operators/licenses.LICENSE_MARKERS)."""
    from schema_validator_spark.operators.licenses import LICENSE_MARKERS

    whens = "\n                    ".join(
        f"when contains(low, '{m}') then '{lic}'"
        for lic, m in LICENSE_MARKERS
    )
    return f"""
      with c as (
        select source as repo,
               case when doc_id % 9 = 0 then
                      'Permission is hereby granted, free of charge, to deal'
                      || chr(10)
                    when doc_id % 9 = 1 then
                      'Licensed under the Apache License, Version 2.0'
                      || chr(10)
                    when doc_id % 9 = 2 then
                      'GNU Lesser General Public License v2.1' || chr(10)
                    when doc_id % 9 = 3 then
                      'GNU General Public License v3' || chr(10)
                    when doc_id % 9 = 4 then
                      'Redistribution and use in source and binary forms'
                      || chr(10)
                    when doc_id % 9 = 5 then
                      'subject to the terms of the Mozilla Public License'
                      || chr(10)
                    when doc_id % 9 = 6 then
                      'GNU Affero General Public License as published'
                      || chr(10)
                    when doc_id % 9 = 7 then
                      'This is free and unencumbered software released'
                      || chr(10)
                    when doc_id % 31 = 0 then
                      'Copyright (c) 2024 synth authors' || chr(10)
                    else '' end || text as content
        from documents
      ), lic as (
        select repo, lower(coalesce(content, '')) as low from c
      ), d as (
        select repo,
               case {whens}
                    when contains(low, 'copyright') then 'UNKNOWN'
                    else 'NONE' end as license
        from lic
      ), counts as (
        select repo, license, count(*) as n_files from d group by 1, 2
      )
      select repo, license, n_files,
             round(cast(n_files as double) /
                   sum(n_files) over (partition by repo), 6) as share
      from counts
    """


def _codequality_oracle_sql() -> str:
    """Replay q_code_quality with the SAME autogen regex, head window,
    and keep thresholds (single source of truth:
    operators/codequality module constants — the integer keep
    arithmetic is re-derived from the same Fraction)."""
    from fractions import Fraction

    from schema_validator_spark.operators import codequality as cq

    r = Fraction(cq.DEFAULT_MIN_ALNUM_FRAC)
    autogen = cq.AUTOGEN_RE.replace("'", "''")
    return f"""
    with c0 as (
      select doc_id,
             case when doc_id % 11 = 0 then repeat(replace(text, ' ', ''), 8)
                  when doc_id % 7 = 0 then
                    '// DO NOT EDIT. generated by synth' || chr(10)
                    || replace(text, ' a ', chr(10))
                  else replace(text, ' a ', chr(10)) || chr(10) end as content
      from documents
    ), c as (select doc_id, coalesce(content, '') as content from c0),
    s as (
      select doc_id, content,
             cast(length(content) as int) as n_chars,
             cast(len(string_split(content, chr(10))) as int) as n_lines,
             cast(list_max(list_transform(string_split(content, chr(10)),
                  x -> length(x))) as int) as max_line_len,
             cast(length(content) - length(regexp_replace(content,
                  '[0-9A-Za-z]', '', 'g')) as int) as n_alnum,
             cast(length(content) - length(regexp_replace(content,
                  '[A-Za-z]', '', 'g')) as int) as n_alpha,
             regexp_matches(substr(content, 1, {cq.AUTOGEN_HEAD_CHARS}),
                  '{autogen}') as autogen
      from c
    )
    select doc_id, n_chars, n_lines, max_line_len,
           round(cast(n_chars - (n_lines - 1) as double) / n_lines, 6)
             as avg_line_len,
           case when n_chars > 0
                then round(cast(n_alnum as double) / n_chars, 6) end
             as alnum_frac,
           case when n_chars > 0
                then round(cast(n_alpha as double) / n_chars, 6) end
             as alpha_frac,
           autogen,
           ends_with(content, chr(10)) as ends_newline,
           cast( (length(content) - length(replace(content, '{{', '')))
               + (length(content) - length(replace(content, '[', '')))
               + (length(content) - length(replace(content, '(', '')))
               - (length(content) - length(replace(content, '}}', '')))
               - (length(content) - length(replace(content, ']', '')))
               - (length(content) - length(replace(content, ')', '')))
             as int) as bracket_balance,
           (n_chars between {cq.DEFAULT_MIN_CHARS} and {cq.DEFAULT_MAX_CHARS}
            and max_line_len <= {cq.DEFAULT_MAX_LINE}
            and (n_chars - (n_lines - 1)) <= {cq.DEFAULT_MAX_AVG_LINE} * n_lines
            and n_alnum * {r.denominator} >= n_chars * {r.numerator}
            and not autogen) as keep
    from s
    """


_LANG_MISMATCH_ORACLE_SQL = r"""
    with base as (
      select doc_id,
             case doc_id % 4 when 0 then '.py' when 1 then '.js'
                  when 2 then '.go' else '.rs' end as extn,
             case doc_id % 4 when 0 then 'python' when 1 then 'javascript'
                  when 2 then 'go' else 'rust' end as expected
      from documents
    ), t as (
      select doc_id,
             'src/f' || cast(doc_id as varchar) || extn as path,
             case when doc_id % 23 = 0 then 'cobol'
                  when doc_id % 97 = 0 then null
                  else expected end as lang,
             expected
      from base
    )
    select doc_id, path, lang,
           lower(regexp_extract(path, '\.([0-9A-Za-z]+)$', 1)) as ext,
           expected as expected_lang
    from t
    where expected <> lower(coalesce(lang, ''))
"""


_NOTEBOOK_ORACLE_SQL = r"""
    with nb as (
      select doc_id,
             case when doc_id % 29 = 0 then 'not a notebook {'
                  when doc_id % 3 = 0 then
                    '{"cells": [{"cell_type": "markdown", "source": ["# t'
                    || cast(doc_id % 50 as varchar)
                    || '"]}, {"cell_type": "code", "source": ["import m'
                    || cast(doc_id % 50 as varchar)
                    || '\n", "print(' || cast(doc_id % 50 as varchar)
                    || ')\n"]}, {"cell_type": "code", "source": ["x = '
                    || cast(doc_id % 50 as varchar) || '"]}]}'
                  when doc_id % 3 = 1 then
                    '{"cells": [{"cell_type": "markdown", "source": ["prose"]}]}'
                  else
                    '{"cells": [{"cell_type": "code", "source": ["y = '
                    || cast(doc_id % 50 as varchar)
                    || '\n"]}, {"cell_type": "markdown", "source": ["end"]}]}'
             end as js
      from documents
    ), good as (
      select doc_id, js from nb where json_valid(js)
    ), cells as (
      select doc_id, cast(g.i as int) as cell_index,
             json_extract_string(js,
               '$.cells[' || g.i || '].cell_type') as cell_type,
             json_transform(json_extract(js,
               '$.cells[' || g.i || '].source'), '["VARCHAR"]') as src
      from good
           -- lateral generate_series is unsupported here; the synth
           -- shapes have <= 3 cells, 8 is defensive headroom
           cross join (values (0),(1),(2),(3),(4),(5),(6),(7)) as g(i)
      where g.i < json_array_length(js, '$.cells')
    )
    select doc_id, cell_index, cell_type,
           array_to_string(src, '') as code, cast(len(src) as int) as n_lines
    from cells
    where cell_type = 'code' and src is not null
"""


#: independent pairing replay of q_notebook_pairs: reparse the JSON,
#: gaps-and-islands over markdown cells, join each code cell to the
#: island ending at its predecessor index
_NB_PAIRS_ORACLE_SQL = r"""
    with nb as (
      select doc_id,
             case when doc_id % 29 = 0 then 'not a notebook {'
                  when doc_id % 3 = 0 then
                    '{"cells": [{"cell_type": "markdown", "source": ["# t'
                    || cast(doc_id % 50 as varchar)
                    || '\n"]}, {"cell_type": "markdown", "source": ["ctx'
                    || cast(doc_id % 50 as varchar)
                    || '"]}, {"cell_type": "code", "source": ["x = '
                    || cast(doc_id % 50 as varchar)
                    || '\n", "y = ' || cast(doc_id % 50 as varchar)
                    || '"]}, {"cell_type": "code", "source": ["z = '
                    || cast(doc_id % 50 as varchar) || '"]}]}'
                  when doc_id % 3 = 1 then
                    '{"cells": [{"cell_type": "code", "source": ["a = '
                    || cast(doc_id % 50 as varchar) || '"]}]}'
                  else
                    '{"cells": [{"cell_type": "markdown", "source": ["ctx'
                    || cast(doc_id % 50 as varchar)
                    || '"]}, {"cell_type": "raw", "source": ["r"]}, '
                    || '{"cell_type": "code", "source": ["b = '
                    || cast(doc_id % 50 as varchar) || '"]}]}'
             end as js
      from documents
    ), good as (
      select doc_id, js from nb where json_valid(js)
    ), cells as (
      select doc_id, cast(g.i as int) as cell_index,
             json_extract_string(js,
               '$.cells[' || g.i || '].cell_type') as cell_type,
             json_transform(json_extract(js,
               '$.cells[' || g.i || '].source'), '["VARCHAR"]') as src
      from good
           cross join (values (0),(1),(2),(3),(4),(5),(6),(7)) as g(i)
      where g.i < json_array_length(js, '$.cells')
    ), runs as (
      select doc_id, cell_index,
             cell_index - row_number() over
               (partition by doc_id order by cell_index) as isl
      from cells where cell_type = 'markdown' and src is not null
    ), mdr as (
      select c.doc_id, r.isl,
             max(c.cell_index) as end_idx,
             cast(count(*) as int) as n_md_cells,
             string_agg(array_to_string(c.src, ''), chr(10)
                        order by c.cell_index) as markdown
      from runs r
      join cells c on c.doc_id = r.doc_id
                  and c.cell_index = r.cell_index
      group by c.doc_id, r.isl
    )
    select c.doc_id, c.cell_index, m.n_md_cells, m.markdown,
           array_to_string(c.src, '') as code
    from cells c
    join mdr m on m.doc_id = c.doc_id
              and m.end_idx = c.cell_index - 1
    where c.cell_type = 'code' and c.src is not null
"""


def _imports_oracle_sql() -> str:
    """Replay q_code_imports: identical content synthesis + the SAME
    per-language regexes (single source of truth:
    functions/imports.IMPORT_PATTERNS) via regexp_extract_all +
    unnest."""
    from schema_validator_spark.functions.imports import IMPORT_PATTERNS

    esc = _esc_sq

    py, pyg = IMPORT_PATTERNS["py"]
    go, gog = IMPORT_PATTERNS["go"]
    js, jsg = IMPORT_PATTERNS["js"]
    return f"""
        with c as (
          select doc_id,
                 cast(doc_id % 20 as varchar) as k,
                 doc_id % 3 as m3,
                 (doc_id % 31 = 0) as is_cobol,
                 text
          from documents
        ), synth as (
          select doc_id, is_cobol, m3,
                 case when m3 = 0 then
                        'import mod' || k || chr(10) || 'from pkg' || k
                        || '.sub import x' || chr(10) || text
                      when m3 = 1 then
                        'import "lib/p' || k || '"' || chr(10) || text
                      else
                        'const a = require(''m' || k || ''');' || chr(10)
                        || text
                 end as content
          from c
        )
        select doc_id,
               unnest(regexp_extract_all(content,
                 case when m3 = 0 then '{esc(py)}'
                      when m3 = 1 then '{esc(go)}'
                      else '{esc(js)}' end,
                 case when m3 = 0 then {pyg}
                      when m3 = 1 then {gog} else {jsg} end)) as module
        from synth
        where not is_cobol
    """
