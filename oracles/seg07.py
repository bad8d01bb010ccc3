"""Driver-contract queries + oracle SQL: .

Split from the monolithic __spark_entry__.py (round 5); the contract is
byte-pinned by tests/test_contract_pin.py."""

from __future__ import annotations

from ._shared import _CORR_COLS, _duck_lit, _duck_splice, _esc_sq
from .seg02 import _DEPGRAPH_IMPORTS
from .seg04 import _BM25_TERMS, _FCPLX_TMPL
from .seg05 import (
    _BLOB_STRIPES,
    _SCRIPT_STRIPES,
    _STRIP_STRIPES,
    _UNI_STRIPES,
    _chunks_cte_sql,
)




def _comment_stats_oracle_sql() -> str:
    """Replay q_comment_stats: identical synthesis + the SAME comment
    regexes (single source of truth:
    operators/codequality.COMMENT_SYNTAX) as length-delta arithmetic
    in DuckDB (regexp_replace 'g', counts via regexp_extract_all)."""
    from schema_validator_spark.operators.codequality import COMMENT_SYNTAX

    py_line, _ = COMMENT_SYNTAX["py"]
    go_line, go_blk = COMMENT_SYNTAX["go"]

    esc = _esc_sq

    return f"""
        with c as (
          select doc_id,
                 cast(doc_id % 20 as varchar) as k,
                 (doc_id % 2 = 0) as is_py,
                 (doc_id % 5 = 0) as has_tail,
                 text
          from documents
        ), synth as (
          select doc_id, is_py,
                 coalesce(
                   case when is_py then '# c' || k else '// c' || k end
                   || chr(10) || replace(text, ' a ', chr(10))
                   || case when has_tail and is_py
                           then chr(10) || 'x = 1 # tail' || k
                           when has_tail
                           then chr(10) || '/* b' || k || chr(10)
                                || 'more */'
                           else '' end,
                   '') as content
          from c
        ), noblk as (
          select doc_id, is_py, content,
                 case when is_py then content
                      else regexp_replace(content, '{esc(go_blk)}', '', 'g')
                 end as nb
          from synth
        )
        select doc_id,
               cast(length(content) as int) as n_chars,
               cast((length(content) - length(nb))
                    + (length(nb) - length(regexp_replace(nb,
                        case when is_py then '{esc(py_line)}'
                             else '{esc(go_line)}' end, '', 'g')))
                 as int) as comment_chars,
               cast(len(regexp_extract_all(nb,
                        case when is_py then '{esc(py_line)}'
                             else '{esc(go_line)}' end)) as int)
                 as n_line_comments,
               cast(case when is_py then 0
                    else len(regexp_extract_all(content, '{esc(go_blk)}'))
                    end as int) as n_block_comments,
               case when length(content) > 0 then
                 round(cast((length(content) - length(nb))
                       + (length(nb) - length(regexp_replace(nb,
                           case when is_py then '{esc(py_line)}'
                                else '{esc(go_line)}' end, '', 'g')))
                   as double) / length(content), 6) end as comment_frac
        from noblk
    """


def _pathclass_oracle_sql() -> str:
    """Replay q_path_classes: identical path synthesis + the SAME
    priority-ordered rule regexes (single source of truth:
    operators/pathclass.PATH_RULES)."""
    from schema_validator_spark.operators.pathclass import PATH_RULES, SOURCE

    whens = "\n                    ".join(
        f"when regexp_matches(path, '{_esc_sq(pat)}') then '{cls}'"
        for cls, pat in PATH_RULES
    )
    return f"""
      with p as (
        select case doc_id % 6
                 when 0 then 'vendor/lib/f' || cast(doc_id % 50 as varchar)
                             || '.py'
                 when 1 then 'build/gen/f' || cast(doc_id % 50 as varchar)
                             || '.js'
                 when 2 then 'tests/test_f' || cast(doc_id % 50 as varchar)
                             || '.py'
                 when 3 then 'docs/readme' || cast(doc_id % 50 as varchar)
                             || '.md'
                 when 4 then 'conf/app' || cast(doc_id % 50 as varchar)
                             || '.yaml'
                 else 'src/main/f' || cast(doc_id % 50 as varchar) || '.go'
               end as path
        from documents
      ), d as (
        select case {whens}
                    else '{SOURCE}' end as path_class
        from p
      ), counts as (
        select path_class, count(*) as n_files from d group by 1
      )
      select path_class, n_files,
             round(cast(n_files as double) / sum(n_files) over (), 6)
               as share
      from counts
    """


def _encoding_oracle_sql() -> str:
    """Replay q_encoding_stats: identical stripes rebuilt with chr()
    codepoints + the SAME control-char class (single source of truth:
    operators/codequality.CONTROL_CHAR_RE) as length-delta
    arithmetic."""
    from schema_validator_spark.operators.codequality import CONTROL_CHAR_RE

    ctrl = CONTROL_CHAR_RE.replace("'", "''")
    return f"""
      with c0 as (
        select doc_id,
               case doc_id % 5
                 when 0 then replace(text, ' a ', chr(13) || chr(10))
                 when 1 then replace(text, ' a ', chr(10))
                 when 2 then replace(text, ' a ', chr(10))
                             || chr(13) || chr(10)
                 when 3 then text || chr(7) || chr(65533) || chr(65533)
                 else chr(65279) || text
               end as content
        from documents
      ), c as (
        select doc_id, coalesce(content, '') as content from c0
      ), s as (
        select doc_id,
               cast(length(content) as int) as n_chars,
               cast(len(regexp_extract_all(content, '{ctrl}')) as int)
                 as n_control,
               starts_with(content, chr(65279)) as has_bom,
               cast(length(content)
                    - length(replace(content, chr(65533), '')) as int)
                 as n_replacement,
               cast((length(content) - length(replace(content,
                    chr(13) || chr(10), ''))) / 2 as int) as n_crlf,
               cast(length(content)
                    - length(replace(content, chr(10), '')) as int) as nl,
               cast(length(content)
                    - length(replace(content, chr(13), '')) as int) as cr
        from c
      )
      select doc_id, n_chars, n_control, has_bom, n_replacement, n_crlf,
             (nl - n_crlf) as n_lone_lf,
             (cr - n_crlf) as n_lone_cr,
             case when n_crlf = 0 and nl - n_crlf = 0 and cr - n_crlf = 0
                    then 'none'
                  when n_crlf > 0 and nl - n_crlf = 0 and cr - n_crlf = 0
                    then 'crlf'
                  when n_crlf = 0 and nl - n_crlf > 0 and cr - n_crlf = 0
                    then 'lf'
                  when n_crlf = 0 and nl - n_crlf = 0 and cr - n_crlf > 0
                    then 'cr'
                  else 'mixed' end as line_ending
      from s
    """


def _strip_comments_oracle_sql() -> str:
    """Replay q_strip_comments: identical stripes from _STRIP_STRIPES
    + the SAME per-lang alternation patterns
    (functions/embedded.strip_comment_pattern over
    clones.STRING_PATTERNS / codequality.COMMENT_SYNTAX) applied with
    regexp_replace(..., '\\1', 'g') — RE2 also substitutes '' for a
    non-participating capture group."""
    from schema_validator_spark.functions.embedded import (
        strip_comment_pattern,
    )
    from schema_validator_spark.operators.codequality import COMMENT_SYNTAX

    t = {key: _esc_sq(v).replace("\n", "' || chr(10) || '")
         for key, v in _STRIP_STRIPES.items()}
    whens = "\n                 ".join(
        f"when '{lg}' then regexp_replace(content, "
        f"'{_esc_sq(strip_comment_pattern(lp, bp))}', '\\1', 'g')"
        for lg, (lp, bp) in sorted(COMMENT_SYNTAX.items())
    )
    return f"""
      with c0 as (
        select doc_id,
               case doc_id % 5
                 when 0 then 'py' when 1 then 'js' when 2 then 'go'
                 when 3 then 'rs' else 'py' end as lang,
               case when doc_id % 29 = 0 then NULL
                    when doc_id % 5 = 0 then
                      '{t["s0a"]}' || cast(doc_id as varchar) || chr(10)
                    when doc_id % 5 = 1 then
                      '{t["s1a"]}' || cast(doc_id as varchar) || chr(10)
                    when doc_id % 5 = 2 then
                      '{t["s2a"]}' || cast(doc_id as varchar)
                      || '{t["s2b"]}'
                    when doc_id % 5 = 3 then
                      '{t["s3a"]}' || cast(doc_id as varchar) || chr(10)
                    else
                      '{t["s4a"]}' || cast(doc_id as varchar) || chr(10)
               end as content
        from documents
      ), c as (
        select doc_id, lang, coalesce(content, '') as content from c0
      ), s as (
        select doc_id, lang, content,
               case lang
                 {whens}
                 else content end as content_stripped
        from c
      )
      select doc_id, lang, content_stripped,
             cast(length(content) - length(content_stripped) as int)
               as n_comment_chars
      from s
    """


def _license_conflicts_oracle_sql() -> str:
    """Replay q_license_conflicts from the SAME module constants
    (LICENSE_FILE_RE, LICENSE_MARKERS, LICENSE_RANK): verdict dim via
    rank arg-max (row_number), header detection on non-license files
    only, conflict = header rank strictly above the verdict's, repos
    with verdict NONE collect undeclared headers instead."""
    from schema_validator_spark.operators.licenses import (
        LICENSE_FILE_RE,
        LICENSE_MARKERS,
        LICENSE_RANK,
    )

    whens = "\n                 ".join(
        f"when contains(low, '{_esc_sq(m)}') then '{lic}'"
        for lic, m in LICENSE_MARKERS
    )
    rank_whens = "\n                 ".join(
        f"when '{lic}' then {r}" for lic, r in LICENSE_RANK.items()
    )
    fre = _esc_sq(LICENSE_FILE_RE)
    return f"""
      with synth as (
        select 'r' || cast(doc_id % 12 as varchar) as repo,
               case when doc_id < 12 and doc_id % 4 <> 3 then 'LICENSE'
                    else 'src/f' || cast(doc_id as varchar) || '.go'
               end as path,
               case when doc_id < 12 and doc_id % 4 <> 3 then
                      case doc_id % 4
                        when 0 then
                          'Permission is hereby granted, free of charge'
                        when 1 then 'GNU General Public License'
                        else 'all mine' end
                    when doc_id % 29 = 0 then NULL
                    else
                      case doc_id % 5
                        when 0 then
                          '// Licensed under the Apache License' || chr(10)
                        when 1 then
                          '// Permission is hereby granted, free of charge'
                          || chr(10)
                        when 2 then
                          '// GNU General Public License' || chr(10)
                        when 3 then
                          '// Copyright 2020 Someone' || chr(10)
                        else '' end
                      || 'package p' || cast(doc_id as varchar)
               end as content
        from documents
      ), lic as (
        select repo,
               case {whens}
                    else 'UNKNOWN' end as flic
        from (select repo, lower(coalesce(content, '')) as low
              from synth
              where regexp_matches(path, '{fre}'))
      ), dim as (
        select repo, flic as verdict from (
          select repo, flic,
                 row_number() over (
                   partition by repo
                   order by (case flic {rank_whens} else 8 end) desc,
                            flic desc) as rn
          from lic) where rn = 1
      ), rows_ as (
        select s.repo,
               case when regexp_matches(s.path, '{fre}') then NULL
                    else (case {whens} else NULL end)
               end as hlic,
               coalesce(d.verdict, 'NONE') as verdict
        from (select repo, path,
                     lower(coalesce(content, '')) as low
              from synth) s
        left join dim d using (repo)
      ), ranked as (
        select repo, hlic, verdict,
               case hlic {rank_whens} else NULL end as hrank,
               case when verdict = 'NONE' then NULL
                    else case verdict {rank_whens} else 8 end
               end as vrank
        from rows_
      ), strongest as (
        select repo, hlic as strictest_header from (
          select repo, hlic,
                 row_number() over (
                   partition by repo
                   order by hrank desc, hlic desc) as rn
          from ranked where hlic is not null) where rn = 1
      ), agg as (
        select repo,
               max(verdict) as repo_license,
               count(*) as n_files,
               count(hlic) as n_header_files,
               cast(sum(case when hlic is not null and vrank is not null
                             and hrank > vrank then 1 else 0 end)
                    as bigint) as n_conflicts,
               cast(sum(case when hlic is not null and verdict = 'NONE'
                             then 1 else 0 end) as bigint)
                 as n_undeclared
        from ranked group by repo
      )
      select a.repo, a.repo_license, a.n_files, a.n_header_files,
             s.strictest_header, a.n_conflicts, a.n_undeclared,
             (a.n_conflicts > 0) as has_conflict
      from agg a left join strongest s using (repo)
    """


_DATASET_CARD_ORACLE_SQL = """
      with synth as (
        select case doc_id % 4
                 when 0 then 'py' when 1 then 'go' when 2 then 'js'
                 else NULL end as lang,
               'r' || cast(doc_id % 20 as varchar) as repo,
               case when doc_id % 29 = 0 then NULL
                    when doc_id % 10 >= 8 then 'shared dup body'
                    else text || ' ' || cast(doc_id as varchar)
               end as content
        from documents
      ), base as (
        select coalesce(lang, 'unknown') as lang, repo,
               md5(coalesce(content, '')) as sha,
               length(coalesce(content, '')) as len
        from synth
      ), agg as (
        select lang,
               count(*) as n_files,
               count(distinct repo) as n_repos,
               cast(sum(len) as bigint) as n_chars,
               count(distinct sha) as n_distinct
        from base group by lang
      )
      select lang, n_files, n_repos, n_chars, n_distinct,
             round(1 - n_distinct / (1.0 * n_files), 6) as dup_frac,
             round(n_files / (1.0 * sum(n_files) over ()), 6)
               as file_share,
             round(n_chars / (1.0 * sum(n_chars) over ()), 6)
               as char_share
      from agg
    """


def _blob_stats_oracle_sql() -> str:
    """Replay q_blob_stats: identical stripes from _BLOB_STRIPES + the
    SAME run patterns (codequality.BASE64_RUN_RE / HEX_RUN_RE /
    UNICODE_ESC_RE) summed via list_transform(length), keep decision
    as the same integer cross-multiplication against
    DEFAULT_MAX_BLOB_FRAC."""
    from fractions import Fraction

    from schema_validator_spark.operators.codequality import (
        BASE64_RUN_RE,
        DEFAULT_MAX_BLOB_FRAC,
        HEX_RUN_RE,
        UNICODE_ESC_RE,
    )

    fr = Fraction(DEFAULT_MAX_BLOB_FRAC)
    num, den = fr.numerator, fr.denominator
    t = {key: _esc_sq(v).replace("\n", "' || chr(10) || '")
         for key, v in _BLOB_STRIPES.items()}

    def runsum(pat: str) -> str:
        return (
            "cast(coalesce(list_sum(list_transform(regexp_extract_all("
            f"content, '{_esc_sq(pat)}'), x -> length(x))), 0) as int)"
        )

    return f"""
      with c0 as (
        select doc_id,
               case when doc_id % 29 = 0 then NULL
                    when doc_id % 5 = 0 then
                      '{t["b64"]}' || cast(doc_id as varchar)
                    when doc_id % 5 = 1 then
                      '{t["hex"]}' || cast(doc_id as varchar)
                    when doc_id % 5 = 2 then
                      '{t["uesc"]}' || cast(doc_id as varchar)
                    when doc_id % 5 = 3 then
                      '{t["clean"]}' || cast(doc_id as varchar)
                    else '{t["under"]}' || cast(doc_id as varchar)
               end as content
        from documents
      ), c as (
        select doc_id, coalesce(content, '') as content from c0
      ), s as (
        select doc_id,
               cast(length(content) as int) as n_chars,
               {runsum(BASE64_RUN_RE)} as n_base64,
               {runsum(HEX_RUN_RE)} as n_hex,
               {runsum(UNICODE_ESC_RE)} as n_uescape
        from c
      )
      select doc_id, n_chars, n_base64, n_hex, n_uescape,
             (n_base64 * {den} <= {num} * n_chars
              and n_hex * {den} <= {num} * n_chars
              and n_uescape * {den} <= {num} * n_chars) as keep
      from s
    """


def _script_mix_oracle_sql() -> str:
    """Replay q_script_mix: identical stripes from _SCRIPT_STRIPES +
    the SAME literal-range classes (functions/text.SCRIPT_CLASSES)
    counted via regexp_extract_all, dominant script by the same
    greatest + class-order CASE chain."""
    from schema_validator_spark.functions.text import SCRIPT_CLASSES

    t = {key: _esc_sq(v) for key, v in _SCRIPT_STRIPES.items()}
    counts = ",\n               ".join(
        f"cast(len(regexp_extract_all(content, '[{body}]')) as int)"
        f" as n_{n}"
        for n, body in SCRIPT_CLASSES.items()
    )
    names = list(SCRIPT_CLASSES)
    mx = "greatest(" + ", ".join(f"n_{n}" for n in names) + ")"
    dom = "case when " + mx + " = 0 then 'none'\n" + "\n".join(
        f"                  when n_{n} = {mx} then '{n}'"
        for n in names
    ) + " end"
    return f"""
      with c0 as (
        select doc_id,
               case when doc_id % 29 = 0 then NULL
                    when doc_id % 7 = 0 then
                      '{t["ascii"]}' || cast(doc_id as varchar)
                    when doc_id % 7 = 1 then
                      '{t["cjk"]}' || cast(doc_id as varchar)
                    when doc_id % 7 = 2 then
                      '{t["cyrillic"]}' || cast(doc_id as varchar)
                    when doc_id % 7 = 3 then
                      '{t["arabic"]}' || cast(doc_id as varchar)
                    when doc_id % 7 = 4 then
                      '{t["hangul"]}' || cast(doc_id as varchar)
                    when doc_id % 7 = 5 then
                      '{t["tie"]}' || cast(doc_id as varchar)
                    else '{t["digits"]}' || cast(doc_id as varchar)
               end as content
        from documents
      ), c as (
        select doc_id, coalesce(content, '') as content from c0
      ), s as (
        select doc_id,
               {counts}
        from c
      )
      select doc_id, {", ".join(f"n_{n}" for n in names)},
             {dom} as dominant_script
      from s
    """


def _unicode_oracle_sql() -> str:
    """Replay q_unicode_audit: identical stripes from the SAME
    _UNI_STRIPES templates + the SAME char classes (single source:
    operators/codequality.BIDI_CONTROL_CHARS / ZERO_WIDTH_CHARS /
    CONFUSABLE_CHARS) counted with regexp_extract_all, verdict by the
    same priority chain."""
    from schema_validator_spark.operators.codequality import (
        BIDI_CONTROL_CHARS,
        CONFUSABLE_CHARS,
        ZERO_WIDTH_CHARS,
    )

    t = {key: _esc_sq(v) for key, v in _UNI_STRIPES.items()}
    conf = CONFUSABLE_CHARS
    mixed = f"[{conf}][A-Za-z]|[A-Za-z][{conf}]"
    return f"""
      with c0 as (
        select doc_id,
               case when doc_id % 29 = 0 then NULL
                    when doc_id % 6 = 0 then
                      '{t["s0"]}' || cast(doc_id as varchar)
                    when doc_id % 6 = 1 then
                      '{t["s1a"]}' || cast(doc_id as varchar)
                      || '{t["s12b"]}'
                    when doc_id % 6 = 2 then
                      '{t["s2a"]}' || cast(doc_id as varchar)
                      || '{t["s12b"]}'
                    when doc_id % 6 = 3 then
                      'x = ' || cast(doc_id as varchar) || '{t["s3b"]}'
                    when doc_id % 6 = 4 then
                      'total = ' || cast(doc_id as varchar)
                      || ' + 1' || chr(10)
                    else '{t["s5"]}' || cast(doc_id as varchar)
               end as content
        from documents
      ), c as (
        select doc_id, coalesce(content, '') as content from c0
      ), s as (
        select doc_id,
               cast(len(regexp_extract_all(content,
                    '[{BIDI_CONTROL_CHARS}]')) as int) as n_bidi,
               cast(len(regexp_extract_all(content,
                    '[{ZERO_WIDTH_CHARS}]')) as int) as n_zero_width,
               cast(len(regexp_extract_all(content,
                    '[{conf}]')) as int) as n_confusable,
               cast(len(regexp_extract_all(content,
                    '{mixed}')) as int) as n_mixed_script
        from c
      )
      select doc_id, n_bidi, n_zero_width, n_confusable, n_mixed_script,
             case when n_bidi > 0 then 'bidi'
                  when n_zero_width > 0 then 'invisible'
                  when n_mixed_script > 0 then 'mixed_script'
                  else 'clean' end as verdict
      from s
    """


#: SQL replay of _code_curation_synth — shared by the code_curation
#: and curation_verdicts oracles (single source for the striped corpus)
_CODE_CURATION_SYNTH_SQL = """
        select source as repo,
               case doc_id % 6
                 when 0 then 'vendor/lib/f' || cast(doc_id as varchar)
                             || '.go'
                 when 1 then 'build/gen/f' || cast(doc_id as varchar)
                             || '.go'
                 when 2 then 'tests/f_test' || cast(doc_id as varchar)
                             || '.go'
                 when 3 then 'docs/readme' || cast(doc_id as varchar)
                             || '.md'
                 when 4 then 'conf/app' || cast(doc_id as varchar)
                             || '.yaml'
                 else 'src/main/f' || cast(doc_id as varchar) || '.go'
               end as path,
               coalesce(
                 case when doc_id % 10 >= 8 then
                        'package fixed' || chr(10) || chr(10)
                        || 'func f() int ' || chr(123) || chr(10) || chr(9)
                        || 'return 1' || chr(10) || chr(125) || chr(10)
                      when doc_id % 11 = 0 then
                        repeat(replace(text, ' ', ''), 8)
                      else
                        case when doc_id % 9 = 2 then
                               '// GNU Lesser General Public License'
                               || chr(10)
                             when doc_id % 9 = 3 then
                               '// GNU General Public License' || chr(10)
                             when doc_id % 9 = 4 then
                               '// Permission is hereby granted, free of charge'
                               || chr(10)
                             else '' end
                        || case when doc_id % 7 = 0
                                then '// do not edit' || chr(10)
                                else '' end
                        || replace(text, ' a ', chr(10))
                        || case when doc_id % 13 = 0
                                then chr(10) || 'key = AKIA'
                                     || lpad(cast(doc_id as varchar), 16, '0')
                                else '' end
                        || case when doc_id % 17 = 0 then chr(7)
                                else '' end
                 end, '') as content
        from documents"""


def _code_curation_oracle_sql() -> str:
    """Replay q_code_curation's ENTIRE funnel relationally — every
    stage derived from the SAME module constants the operators use
    (PATH_RULES, CONTROL_CHAR_RE, codequality thresholds,
    LICENSE_MARKERS, SECRET_PATTERNS, DEFAULT_ALLOWED_LICENSES), ending
    in the identical (repo, path)-minimal sha256 dedup."""
    from fractions import Fraction

    from schema_validator_spark.operators import codequality as cq
    from schema_validator_spark.operators.curatecode import (
        DEFAULT_ALLOWED_LICENSES,
    )
    from schema_validator_spark.operators.licenses import LICENSE_MARKERS
    from schema_validator_spark.operators.pathclass import PATH_RULES
    from schema_validator_spark.operators.secrets import SECRET_PATTERNS

    esc = _esc_sq

    path_miss = " and ".join(
        f"not regexp_matches(path, '{esc(pat)}')" for _, pat in PATH_RULES
    )
    lic_whens = "\n                 ".join(
        f"when contains(low, '{m}') then '{lic}'"
        for lic, m in LICENSE_MARKERS
    )
    allowed = ", ".join(f"'{x}'" for x in DEFAULT_ALLOWED_LICENSES)
    no_secret = " and ".join(
        f"not regexp_matches(content, '{esc(p)}')"
        for _, p in SECRET_PATTERNS
    )
    r = Fraction(cq.DEFAULT_MIN_ALNUM_FRAC)
    ctrl = esc(cq.CONTROL_CHAR_RE)
    autogen = esc(cq.AUTOGEN_RE)
    return f"""
      with synth as ({_CODE_CURATION_SYNTH_SQL}
      ), p1 as (
        select * from synth where {path_miss}
      ), e0 as (
        select *,
               cast((length(content) - length(replace(content,
                    chr(13) || chr(10), ''))) / 2 as int) as crlf,
               cast(length(content)
                    - length(replace(content, chr(10), '')) as int) as nl,
               cast(length(content)
                    - length(replace(content, chr(13), '')) as int) as cr
        from p1
      ), p2 as (
        select repo, path, content from e0
        where len(regexp_extract_all(content, '{ctrl}')) = 0
          and length(content) = length(replace(content, chr(65533), ''))
          and not (   (crlf > 0 and (nl - crlf > 0 or cr - crlf > 0))
                   or (nl - crlf > 0 and cr - crlf > 0))
      ), q0 as (
        select *,
               length(content) as n_chars,
               len(string_split(content, chr(10))) as n_lines,
               list_max(list_transform(string_split(content, chr(10)),
                    x -> length(x))) as max_line_len,
               length(content) - length(regexp_replace(content,
                    '[0-9A-Za-z]', '', 'g')) as n_alnum,
               regexp_matches(substr(content, 1, {cq.AUTOGEN_HEAD_CHARS}),
                    '{autogen}') as autogen
        from p2
      ), p3 as (
        select repo, path, content from q0
        where n_chars between {cq.DEFAULT_MIN_CHARS}
                          and {cq.DEFAULT_MAX_CHARS}
          and max_line_len <= {cq.DEFAULT_MAX_LINE}
          and (n_chars - (n_lines - 1)) <= {cq.DEFAULT_MAX_AVG_LINE} * n_lines
          and n_alnum * {r.denominator} >= n_chars * {r.numerator}
          and not autogen
      ), l0 as (
        select *, lower(content) as low from p3
      ), p4 as (
        select repo, path, content from l0
        where (case {lic_whens}
                    when contains(low, 'copyright') then 'UNKNOWN'
                    else 'NONE' end) in ({allowed})
      ), p5 as (
        select repo, path, content from p4 where {no_secret}
      ), d as (
        select repo, path, sha256(content) as content_sha,
               row_number() over (partition by sha256(content)
                                  order by repo nulls first,
                                           path nulls first) as rn
        from p5
      )
      select repo, path, content_sha from d where rn = 1
    """


def _curation_verdicts_oracle_sql() -> str:
    """Replay q_curation_verdicts: the SAME constant-derived stage
    predicates as _code_curation_oracle_sql, restructured as a
    first-failing CASE; passed rows split kept/duplicate by the same
    per-sha row_number the dedup oracle uses."""
    from fractions import Fraction

    from schema_validator_spark.operators import codequality as cq
    from schema_validator_spark.operators.curatecode import (
        DEFAULT_ALLOWED_LICENSES,
    )
    from schema_validator_spark.operators.licenses import LICENSE_MARKERS
    from schema_validator_spark.operators.pathclass import PATH_RULES
    from schema_validator_spark.operators.secrets import SECRET_PATTERNS

    esc = _esc_sq
    path_ok = " and ".join(
        f"not regexp_matches(path, '{esc(pat)}')" for _, pat in PATH_RULES
    )
    lic_whens = "\n                 ".join(
        f"when contains(low, '{m}') then '{lic}'"
        for lic, m in LICENSE_MARKERS
    )
    allowed = ", ".join(f"'{x}'" for x in DEFAULT_ALLOWED_LICENSES)
    has_secret = " or ".join(
        f"regexp_matches(content, '{esc(p)}')" for _, p in SECRET_PATTERNS
    )
    r = Fraction(cq.DEFAULT_MIN_ALNUM_FRAC)
    ctrl = esc(cq.CONTROL_CHAR_RE)
    autogen = esc(cq.AUTOGEN_RE)
    return f"""
      with synth as ({_CODE_CURATION_SYNTH_SQL}
      ), e0 as (
        select *,
               cast((length(content) - length(replace(content,
                    chr(13) || chr(10), ''))) / 2 as int) as crlf,
               cast(length(content)
                    - length(replace(content, chr(10), '')) as int) as nl,
               cast(length(content)
                    - length(replace(content, chr(13), '')) as int) as cr,
               ({path_ok}) as path_ok
        from synth
      ), q0 as (
        select *,
               (len(regexp_extract_all(content, '{ctrl}')) = 0
                and length(content)
                    = length(replace(content, chr(65533), ''))
                and not (   (crlf > 0 and (nl - crlf > 0 or cr - crlf > 0))
                         or (nl - crlf > 0 and cr - crlf > 0))) as enc_ok,
               length(content) as n_chars,
               len(string_split(content, chr(10))) as n_lines,
               list_max(list_transform(string_split(content, chr(10)),
                    x -> length(x))) as max_line_len,
               length(content) - length(regexp_replace(content,
                    '[0-9A-Za-z]', '', 'g')) as n_alnum,
               regexp_matches(substr(content, 1, {cq.AUTOGEN_HEAD_CHARS}),
                    '{autogen}') as autogen
        from e0
      ), s0 as (
        select *,
               (n_chars between {cq.DEFAULT_MIN_CHARS}
                            and {cq.DEFAULT_MAX_CHARS}
                and max_line_len <= {cq.DEFAULT_MAX_LINE}
                and (n_chars - (n_lines - 1))
                    <= {cq.DEFAULT_MAX_AVG_LINE} * n_lines
                and n_alnum * {r.denominator} >= n_chars * {r.numerator}
                and not autogen) as qual_ok,
               (case {lic_whens}
                     when contains(lower(content), 'copyright')
                       then 'UNKNOWN'
                     else 'NONE' end) in ({allowed}) as lic_ok,
               not ({has_secret}) as sec_ok
        from (select *, lower(content) as low from q0)
      ), fl as (
        select repo, path, content,
               case when not path_ok then 'path'
                    when not enc_ok then 'encoding'
                    when not qual_ok then 'quality'
                    when not lic_ok then 'license'
                    when not sec_ok then 'secrets' end as pre
        from s0
      ), failed as (
        select repo, path, pre as verdict from fl where pre is not null
      ), passed as (
        -- min-ROW equality, not row_number: every copy of an exact
        -- full-row duplicate is 'kept', mirroring the engine's
        -- struct-equality rule (curatecode.curation_verdicts docstring)
        select repo, path,
               case when row(repo, path, content) is not distinct from
                         first_value(row(repo, path, content)) over (
                           partition by sha256(content)
                           order by repo nulls first, path nulls first,
                                    content nulls first)
                    then 'kept' else 'duplicate' end as verdict
        from fl where pre is null
      )
      select repo, path, verdict from failed
      union all
      select repo, path, verdict from passed
    """


def _fd_discovery_oracle_sql() -> str:
    """Replay q_fd_discovery's exact verdicts: a -> b holds iff
    |distinct(a)| = |distinct(a, b)| over the same derived frame."""
    from itertools import permutations

    cols = ["lang", "up", "source", "bucket"]
    parts = []
    for a, b in permutations(cols, 2):
        parts.append(f"""
          select '{a}' as determinant, '{b}' as dependent,
                 (count(distinct ({a})) = count(distinct ({a}, {b})))
                   as holds
          from (select lang, upper(lang) as up, source,
                       doc_id % 7 as bucket
                from documents)""")
    return " union all ".join(parts)


def _semantic_oracle_sql() -> str:
    """Replay q_semantic_types per (column, detector) with the SAME
    regexes (imported from operators/semantic.py)."""
    from schema_validator_spark.operators.semantic import DETECTORS

    cols = {
        "lang": "lang",
        "source": "source",
        "hash": "md5(coalesce(text, ''))",
        "num": "cast(n_chars as varchar)",
    }
    parts = []
    for alias, expr in cols.items():
        for name, pat in DETECTORS:
            p = pat.replace("'", "''")
            parts.append(f"""
              select '{alias}' as "column", '{name}' as sem_type,
                     count({expr}) as n_nonnull,
                     count(*) filter (
                       where regexp_matches({expr}, '{p}')) as n_match,
                     round(cast(count(*) filter (
                       where regexp_matches({expr}, '{p}')) as double)
                       / count({expr}), 6) as match_rate
              from documents""")
    return " union all ".join(parts)


def _corr_oracle_sql() -> str:
    """Replay q_correlation_matrix pair-by-pair with the same
    covar_samp / (stddev * stddev) form (NULL for constant columns)."""
    from itertools import combinations

    parts = []
    for a, b in combinations(_CORR_COLS, 2):
        parts.append(f"""
          select '{a}' as col_a, '{b}' as col_b,
                 count(*) as n_rows,
                 round(covar_samp({a}, {b})
                       / nullif(stddev_samp({a}) * stddev_samp({b}), 0), 6)
                   as corr
          from lineitem""")
    return " union all ".join(parts)


def _html_oracle_sql() -> str:
    """Replay q_html_extract: rebuild html_to_text's exact ordered
    regexp_replace/replace chain from html.pipeline_spec()."""
    from schema_validator_spark.functions.html import pipeline_spec

    def q(s: str) -> str:
        return s.replace("'", "''")

    expr = "h"
    for kind, pat, rep in pipeline_spec():
        r = "chr(10)" if rep == "\n" else f"'{q(rep)}'"
        if kind == "re":
            expr = f"regexp_replace({expr}, '{q(pat)}', {r}, 'g')"
        else:
            expr = f"replace({expr}, '{q(pat)}', {r})"
    return f"""
        with synth as (
          select doc_id,
                 '<html><head><title>Doc ' || cast(doc_id as varchar)
                 || '</title><script>var t=''</p>'';</script></head><body><h1>'
                 || source || '</h1><p>'
                 || replace(text, chr(10), '</p><p>')
                 || '</p><a href="https://ex.org/' || cast(doc_id as varchar)
                 || '">l</a><!-- c --></body></html>' as h
          from documents
        )
        select doc_id,
               trim(regexp_replace(
                 regexp_extract(h, '(?is)<title\\b[^>]*>(.*?)</title\\s*>', 1),
                 '\\s+', ' ', 'g')) as title,
               cast(len(regexp_extract_all(
                 h, '(?is)<a\\b[^>]*\\bhref\\s*=')) as int) as n_links,
               md5({expr}) as text_md5
        from synth
    """


def _pagerank_unroll_sql(edges_cte: str, iters: int) -> str:
    """Unroll operators/graph.pagerank's recurrence over ``edges_cte``
    (the body of a CTE named ``e`` emitting distinct self-loop-free
    (src, dst) rows): same per-iteration 6dp rounding, same float op
    order for the base term.  Shared by the pagerank and module_rank
    oracles."""
    parts = [f"""
      with e as ({edges_cte}),
      nodes as (select src as node from e union select dst from e),
      nd as (
        select n.node, coalesce(d.deg, 0) as deg
        from nodes n
        left join (select src, count(*) as deg from e group by src) d
          on n.node = d.src
      ),
      c as (select count(*) as n from nd),
      r0 as (select node, deg, round(1.0 / c.n, 6) as rank from nd, c)"""]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(f"""
      d{k} as (select coalesce(sum(rank), 0.0) as dang
               from r{p} where deg = 0),
      i{k} as (select e.dst as node, sum(r.rank / r.deg) as inc
               from r{p} r join e on r.node = e.src
               where r.deg > 0 group by e.dst),
      r{k} as (select nd.node, nd.deg,
                      round((((1.0 - 0.85) / c.n) + ((0.85 * d{k}.dang) / c.n))
                            + (0.85 * coalesce(i{k}.inc, 0.0)), 6) as rank
               from nd cross join c cross join d{k}
               left join i{k} on nd.node = i{k}.node)""")
    return ",".join(parts) + f"\n      select node, rank from r{iters}"


def _pagerank_oracle_sql(iters: int = 5) -> str:
    """q_pagerank's recurrence: its edge derivation fed to the shared
    unroller."""
    return _pagerank_unroll_sql(
        """
        select distinct (doc_id % 60) as src, ((doc_id // 7) % 60) as dst
        from documents
        where (doc_id % 60) <> ((doc_id // 7) % 60)
      """,
        iters,
    )


def _depgraph_edges_sql() -> str:
    """DuckDB replay of _depgraph_edges (shared by the import_cycles
    and module_rank oracles): synthesize the striped module corpus,
    replay functions/imports' py pattern via regexp_extract_all +
    unnest, keep intra-repo non-self edges, distinct."""
    from schema_validator_spark.functions.imports import IMPORT_PATTERNS

    synth_content = "\n                 ".join(
        f"when doc_id % 6 = {i} then {_duck_lit(body)}"
        for i, body in sorted(_DEPGRAPH_IMPORTS.items())
    )
    pat, grp = IMPORT_PATTERNS["py"]
    return f"""
      with synth as (
        select 'r' || cast((doc_id // 6) % 10 as varchar) as repo,
               'm' || cast(doc_id % 6 as varchar) as module,
               case {synth_content} end as content
        from documents
      ), ex as (
        select repo, module as src_module,
               unnest(regexp_extract_all(content,
                                         '{_esc_sq(pat)}', {grp}))
                 as dst_module
        from synth
      )
      select distinct x.repo, x.src_module, x.dst_module
      from ex x
      where x.src_module <> x.dst_module
        and exists (select 1 from synth s
                    where s.repo = x.repo and s.module = x.dst_module)
    """


#: fim_transform replay: the operator's INTEGER-only md5 recipe
#: verbatim — hex-prefix draws, pmod rate gates, char cut points,
#: PSM/SPM sentinel assembly (operators/fim.py docstring).
_FIM_ORACLE_SQL = """
  with d as (
    select doc_id, text, cast(doc_id as varchar) as sid,
           length(text) as ln
    from documents
  ), h as (
    select doc_id, text, ln,
      ('0x' || substr(md5(sid || 'fim-v1' || '-apply'), 1, 8))::bigint
        % 1000000 as g_apply,
      ('0x' || substr(md5(sid || 'fim-v1' || '-mode'), 1, 8))::bigint
        % 1000000 as g_mode,
      ('0x' || substr(md5(sid || 'fim-v1' || '-a'), 1, 8))::bigint
        % (ln + 1) as ca,
      ('0x' || substr(md5(sid || 'fim-v1' || '-b'), 1, 8))::bigint
        % (ln + 1) as cb
    from d
  ), c as (
    select doc_id, text, ln, g_apply, g_mode,
           least(ca, cb) as c1, greatest(ca, cb) as c2
    from h
  )
  select doc_id,
    case when text is null or g_apply >= 500000 then 'none'
         when g_mode < 500000 then 'spm' else 'psm' end as fim_mode,
    case when text is null or g_apply >= 500000 then text
         when g_mode < 500000 then
           '<fim_suffix>' || substr(text, c2 + 1)
           || '<fim_prefix>' || substr(text, 1, c1)
           || '<fim_middle>' || substr(text, c1 + 1, c2 - c1)
         else
           '<fim_prefix>' || substr(text, 1, c1)
           || '<fim_suffix>' || substr(text, c2 + 1)
           || '<fim_middle>' || substr(text, c1 + 1, c2 - c1)
    end as fim_text
  from c
"""


def _repo_context_oracle_sql() -> str:
    """Replay q_repo_context: the striped import synthesis with
    unique paths, the intra-repo edge derivation (same pattern source
    as _depgraph_edges_sql), fan-in per defined module, and the
    (fan_in DESC, path ASC) row_number manifest."""
    from schema_validator_spark.functions.imports import IMPORT_PATTERNS

    synth_content = "\n                 ".join(
        f"when doc_id % 6 = {i} then {_duck_lit(body)}"
        for i, body in sorted(_DEPGRAPH_IMPORTS.items())
    )
    pat, grp = IMPORT_PATTERNS["py"]
    return f"""
      with synth as (
        select 'r' || cast((doc_id // 6) % 10 as varchar) as repo,
               'f' || cast(doc_id as varchar) || '.py' as path,
               'm' || cast(doc_id % 6 as varchar) as module,
               case {synth_content} end as content
        from documents
      ), ex as (
        select repo, module as src_module,
               unnest(regexp_extract_all(content,
                                         '{_esc_sq(pat)}', {grp}))
                 as dst_module
        from synth
      ), edges as (
        select distinct x.repo, x.src_module, x.dst_module
        from ex x
        where x.src_module <> x.dst_module
          and exists (select 1 from synth s
                      where s.repo = x.repo and s.module = x.dst_module)
      ), fi as (
        select repo, dst_module as module,
               cast(count(*) as bigint) as fan_in
        from edges group by repo, dst_module
      )
      select s.repo, s.path, s.module,
             coalesce(fi.fan_in, 0) as fan_in,
             cast(row_number() over (
               partition by s.repo
               order by coalesce(fi.fan_in, 0) desc, s.path asc
             ) as int) as seq
      from synth s
      left join fi on fi.repo = s.repo and fi.module = s.module
    """


def _import_cycles_oracle_sql() -> str:
    """Replay q_import_cycles: the shared edge derivation + the 2-cycle
    mutual join and the smallest-start-rotation 3-cycle joins."""
    return f"""
      with edges as ({_depgraph_edges_sql()})
      select a.repo,
             a.src_module || '->' || a.dst_module || '->' || a.src_module
               as cycle_path,
             2 as length
      from edges a
      join edges b on a.repo = b.repo
                  and a.dst_module = b.src_module
                  and b.dst_module = a.src_module
      where a.src_module < a.dst_module
      union all
      select a.repo,
             a.src_module || '->' || a.dst_module || '->' || b.dst_module
               || '->' || a.src_module as cycle_path,
             3 as length
      from edges a
      join edges b on a.repo = b.repo and a.dst_module = b.src_module
      join edges c on b.repo = c.repo and b.dst_module = c.src_module
                  and c.dst_module = a.src_module
      where a.src_module < a.dst_module
        and a.src_module < b.dst_module
        and a.dst_module <> b.dst_module
    """


def _function_complexity_oracle_sql() -> str:
    """Replay q_function_complexity by COMPOSITION: synth from the
    shared _FCPLX_TMPL constants, the chunker's independent
    line-window derivation (_chunks_cte_sql), then the complexity
    arithmetic from the SAME module constants (DECISION_SYNTAX /
    decision_pattern / TAB_WIDTH) over each chunk."""
    from schema_validator_spark.operators.complexity import (
        DECISION_SYNTAX,
        TAB_WIDTH,
        decision_pattern,
    )

    synth_lang = "\n                 ".join(
        f"when doc_id % 3 = {i} then '{lg}'"
        for i, (lg, _, _, _) in sorted(_FCPLX_TMPL.items())
    )
    synth_content = "\n                 ".join(
        f"when doc_id % 3 = {i} then ({_duck_splice(h)})"
        f" || repeat({_duck_splice(m)}, cast(doc_id % 3 + 1 as int))"
        f" || ({_duck_splice(t)})"
        for i, (_, h, m, t) in sorted(_FCPLX_TMPL.items())
    )
    kw_whens = "\n                 ".join(
        "when '{lg}' then len(regexp_extract_all(chunk_text, '{pat}'))"
        .format(lg=lg, pat=_esc_sq(decision_pattern(words)))
        for lg, (words, _) in sorted(DECISION_SYNTAX.items())
    )
    op_langs = ", ".join(
        f"'{lg}'"
        for lg, (_, ops) in sorted(DECISION_SYNTAX.items())
        if ops
    )
    return f"""
      with synth as (
        select doc_id,
               case {synth_lang} end as lang,
               case {synth_content} end as content
        from documents
      ), {_chunks_cte_sql()}
      , st as (
        select doc_id, chunk_idx,
               len(string_split(chunk_text, chr(10))) as n_lines,
               cast(case coalesce(lower(lang), '')
                 {kw_whens}
                 else 0 end as int) as n_decisions,
               cast(case when coalesce(lower(lang), '') in ({op_langs})
                 then (length(chunk_text)
                       - length(replace(chunk_text, '&&', ''))
                       + length(chunk_text)
                       - length(replace(chunk_text, '||', ''))) / 2
                 else 0 end as int) as n_bool_ops,
               list_max(list_transform(
                 string_split(replace(chunk_text, chr(9),
                                      '{" " * TAB_WIDTH}'), chr(10)),
                 l -> case when ltrim(l) = '' then 0
                           else length(l) - length(ltrim(l)) end))
                 as max_indent
        from chunks
      )
      select doc_id, chunk_idx, n_lines, n_decisions, n_bool_ops,
             n_decisions + n_bool_ops + 1 as cyclomatic,
             max_indent,
             round((n_decisions + n_bool_ops) / n_lines, 6)
               as decision_density
      from st
    """


def _bm25_oracle_sql() -> str:
    """Replay q_bm25_search from the SAME constants (_BM25_TERMS;
    codedup.CODE_TOKEN_SPLIT_RE): synthesis, lexer, per-term tf via
    list filters, one corpus-stats row, the identical float op order
    per contribution (each rounded to a 6dp-scaled bigint BEFORE the
    order-independent integer sum), top-50 by (score_e6 desc, id)."""
    from schema_validator_spark.operators.codedup import (
        CODE_TOKEN_SPLIT_RE,
    )

    split = _esc_sq(CODE_TOKEN_SPLIT_RE)
    tf_cols = ",\n               ".join(
        f"len(list_filter(t, x -> x = '{term}')) as tf{i}"
        for i, term in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"cast(sum(case when tf{i} > 0 then 1 else 0 end) as double)"
        f" as df{i}"
        for i in range(len(_BM25_TERMS))
    )
    contribs = " + ".join(
        f"""(case when tf{i} > 0 then cast(round(
             ((ln((N - df{i} + 0.5) / (df{i} + 0.5) + 1.0)
               * cast(tf{i} as double)) * (1.2 + 1.0))
             / (cast(tf{i} as double)
                + 1.2 * ((1.0 - 0.75)
                         + (0.75 * cast(dl as double)) / (sumdl / N)))
             * 1e6) as bigint) else 0 end)"""
        for i in range(len(_BM25_TERMS))
    )
    matched = " + ".join(
        f"(case when tf{i} > 0 then 1 else 0 end)"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
      with synth as (
        select doc_id,
               text
               || case when doc_id % 7 = 0
                       then ' serialize_v2 serialize_v2' else '' end
               || case when doc_id % 11 = 0
                       then ' mutex_guard' else '' end
               || case when doc_id % 13 = 0
                       then ' qsort_3way qsort_3way qsort_3way'
                       else '' end as content
        from documents
      ), tk as (
        select doc_id,
               list_filter(string_split_regex(lower(content), '{split}'),
                           x -> x <> '') as t
        from synth
      ), d as (
        select doc_id, len(t) as dl,
               {tf_cols}
        from tk
      ), s as (
        select cast(count(*) as double) as N,
               cast(sum(dl) as double) as sumdl,
               {df_cols}
        from d
      ), c as (
        select doc_id,
               {matched} as matched_terms,
               {contribs} as score_e6
        from d, s
      )
      select doc_id, matched_terms, score_e6, rank from (
        select *, row_number() over (order by score_e6 desc, doc_id)
                 as rank
        from c where matched_terms > 0
      ) where rank <= 50
    """


def _module_rank_oracle_sql(iters: int = 3) -> str:
    """Replay q_module_rank: the shared edge derivation keyed
    repo␟module, the shared pagerank unroller, then the key split."""
    keyed = f"""
        select repo || chr(31) || src_module as src,
               repo || chr(31) || dst_module as dst
        from ({_depgraph_edges_sql()})
      """
    return f"""
      select split_part(node, chr(31), 1) as repo,
             split_part(node, chr(31), 2) as module,
             rank
      from ({_pagerank_unroll_sql(keyed, iters)})
    """
