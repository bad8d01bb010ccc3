"""Driver-contract queries + oracle SQL: repo_context, dobf_pairs, halstead, ownership, blocked_terms, boilerplate, ....

Split from the monolithic __spark_entry__.py (round 5); the contract is
byte-pinned by tests/test_contract_pin.py."""

from __future__ import annotations

from ._shared import DataFrame, F, X, _esc_sq, _t
from .seg02 import _DEPGRAPH_IMPORTS




def q_repo_context(spark, sf_dir):
    """Repo-context ordering manifest
    (operators/repocontext.repo_context_order — the StarCoder2 /
    DeepSeek-Coder repo-level training format): files sort
    dependency-first by the intra-repo FAN-IN of the module they
    define (depgraph edges, external imports excluded), ties on path.
    Same striped import synthesis as the depgraph queries, with a
    globally-unique path per file."""
    from schema_validator_spark.operators.repocontext import (
        repo_context_order,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    chain = None
    for i, body in sorted(_DEPGRAPH_IMPORTS.items()):
        cond = did % 6 == i
        lit = F.lit(body)
        chain = F.when(cond, lit) if chain is None else chain.when(cond, lit)
    df = docs.select(
        F.concat(
            F.lit("r"), F.expr("(doc_id div 6) % 10").cast("string")
        ).alias("repo"),
        F.concat(F.lit("f"), did.cast("string"), F.lit(".py")).alias("path"),
        F.concat(F.lit("m"), (did % 6).cast("string")).alias("module"),
        F.lit("py").alias("lang"),
        chain.alias("content"),
    )
    return repo_context_order(
        df, "repo", "path", "module", "content", "lang"
    )


def _code_lang_synth(docs):
    """Shared striped (doc_id, lang, content) code synthesis for the
    dobf_pairs and halstead_metrics queries: all three keyword lists +
    an unregistered lang (rust), repeated identifiers, digit tokens,
    and a py stripe with 6 eligible identifiers.  The oracles replay
    it from _CODE_SYNTH_SQL."""
    did = F.col("doc_id")
    k = did.cast("string")
    m3 = did % 3
    lang = F.when(did % 13 == 0, F.lit("rust")).otherwise(
        F.when(m3 == 0, F.lit("py"))
        .when(m3 == 1, F.lit("go"))
        .otherwise(F.lit("js"))
    )
    py = F.concat(
        F.lit("def handler(req):\n    data = req.load(limit"),
        k,
        F.lit(")\n    return data, cache_key\n"),
    )
    go = F.concat(
        F.lit("func Process"), k,
        F.lit("(in chan int) int\n\tout := in\n\tsend(out, in)\n"
              "\treturn out\n"),
    )
    js = F.concat(
        F.lit("const fooBar = (x) => x * count"), k,
        F.lit(" + window.count"), k, F.lit("\n"),
    )
    rust = F.concat(
        F.lit("fn run"), k, F.lit("() -> i32 = v + 1\n"),
    )
    content = F.when(did % 13 == 0, rust).otherwise(
        F.when(m3 == 0, py).when(m3 == 1, go).otherwise(js)
    )
    return docs.select(
        "doc_id", lang.alias("lang"), content.alias("content")
    )


def q_dobf_pairs(spark, sf_dir):
    """DOBF identifier-obfuscation pairs
    (operators/dobf.obfuscate_identifiers — Lachaux et al. 2021): every
    non-keyword identifier renamed to VAR_k in first-appearance order;
    the (obfuscated source, name mapping) pair is the deobfuscation
    training example.  Stripes cover all three keyword lists plus an
    unregistered lang (everything renames), repeated identifiers (one
    placeholder), digit tokens (never renamed), and a py stripe with 6
    eligible identifiers so max_ids=4 truncation binds and the cap
    semantics are oracle-checked."""
    from schema_validator_spark.operators.dobf import (
        obfuscate_identifiers,
    )

    df = _code_lang_synth(_t(spark, sf_dir, "documents"))
    out = obfuscate_identifiers(
        df, ["doc_id"], "content", "lang", max_ids=4
    )
    return out.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_ids").cast("long").alias("n_ids"),
        F.col("n_ids_total").cast("long").alias("n_ids_total"),
        F.concat_ws(
            ",",
            F.transform(
                "id_names",
                lambda x, i: F.concat(
                    x, F.lit("=VAR_"), i.cast("string")
                ),
            ),
        ).alias("mapping"),
        F.md5("obf_content").alias("obf_sha"),
    )


def q_halstead(spark, sf_dir):
    """Halstead software-science metrics
    (operators/halstead.halstead_metrics): distinct/total operators
    (keywords + punctuation operator chars) and operands (non-keyword
    identifiers + number runs) -> vocabulary/length/volume/difficulty/
    effort, the classic maintainability-index inputs beside the McCabe
    proxy.  Same striped synthesis as dobf_pairs (shared keyword
    lists); doubles compare as 6dp-scaled longs per the float-oracle
    contract."""
    from schema_validator_spark.operators.halstead import (
        halstead_metrics,
    )

    df = _code_lang_synth(_t(spark, sf_dir, "documents"))
    out = halstead_metrics(df, ["doc_id"], "content", "lang")
    return out.select(
        "doc_id", "lang", "n1", "n2", "big_n1", "big_n2",
        "volume", "difficulty", "effort",
    )


def q_ownership(spark, sf_dir):
    """Code ownership / bus factor
    (operators/ownership.ownership_stats): per-file author
    concentration over a commit-grain table — top author + share,
    Herfindahl index, and the smallest author set strictly exceeding
    half the commits.  Synthesis: (repo=did%7, path=did%13) file grid;
    even-numbered paths get a skewed 'alice owns 2/3' stripe, odd
    paths a uniform 5-author mix, and did%17==0 commits a NULL author
    (must collapse to one real '<unknown>' author, not drop).  Oracle:
    independent window replay (rank by count desc/author asc, running
    cumsum vs strict majority)."""
    from schema_validator_spark.operators.ownership import (
        ownership_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    author = (
        F.when(did % 17 == 0, F.lit(None).cast("string"))
        .when(
            (did % 13) % 2 == 0,
            F.when(did % 3 > 0, F.lit("alice")).otherwise(
                F.concat(F.lit("a"), (did % 4).cast("string"))
            ),
        )
        .otherwise(F.concat(F.lit("a"), (did % 5).cast("string")))
    )
    df = docs.select(
        F.concat(F.lit("r"), (did % 7).cast("string")).alias("repo"),
        F.concat(F.lit("p"), (did % 13).cast("string")).alias("path"),
        author.alias("author"),
    )
    out = ownership_stats(df, ["repo", "path"], "author")
    return out.select(
        "repo", "path", "n_commits", "n_authors", "top_author",
        F.col("bus_factor").cast("long").alias("bus_factor"),
        "top_share", "hhi",
    )


_OWNERSHIP_ORACLE_SQL = """
    with synth as (
      select 'r' || cast(doc_id % 7 as varchar) as repo,
             'p' || cast(doc_id % 13 as varchar) as path,
             case when doc_id % 17 = 0 then '<unknown>'
                  when (doc_id % 13) % 2 = 0 then
                       case when doc_id % 3 > 0 then 'alice'
                            else 'a' || cast(doc_id % 4 as varchar) end
                  else 'a' || cast(doc_id % 5 as varchar) end as author
      from documents
    ), pa as (
      select repo, path, author, count(*) as n
      from synth group by 1, 2, 3
    ), ranked as (
      select repo, path, author, n,
             row_number() over (partition by repo, path
                                order by n desc, author asc) as rn,
             cast(sum(n) over (partition by repo, path
                               order by n desc, author asc
                               rows between unbounded preceding
                               and current row) as bigint) as cum,
             cast(sum(n) over (partition by repo, path) as bigint)
               as total
      from pa
    )
    select repo, path,
           max(total) as n_commits,
           count(*) as n_authors,
           min(case when rn = 1 then author end) as top_author,
           cast(min(case when cum > 0.5 * total then rn end) as bigint)
             as bus_factor,
           round(max(case when rn = 1 then n end)
                 / cast(max(total) as double), 6) as top_share,
           round(sum((n / cast(total as double))
                     * (n / cast(total as double))), 6) as hhi
    from ranked
    group by repo, path
"""


#: blocked_terms synthesis blocklist — invented words the natural
#: vocabulary of documents.text cannot collide with; NASTYBIT
#: deliberately uppercase to exercise list-side lowercasing
_WORDLIST_TERMS = ["vileword", "scumterm", "NASTYBIT"]


def q_blocked_terms(spark, sf_dir):
    """C4 word-list content gate (functions/wordlist.blocked_term_stats):
    per-document blocklist hit statistics + keep verdict under the
    RefinedWeb soft threshold (max_hit_rate=0.02 — a single hit keeps
    only if the doc has >= 50 tokens, so the verdict is data-dependent,
    not stripe-constant).  Matching is exact lowercase whitespace-token
    membership (C4 semantics: no substring matches).  Stripes: 1-hit
    tail append, 3-occurrence/2-distinct mix, a case+boundary stripe
    ('Vileword' hits after lowering, 'vilewords' never), clean rows,
    and NULL text (0 tokens, keeps).  ZERO shuffles — one codegen
    projection; the blocklist compiles to an InSet hash probe."""
    from schema_validator_spark.functions.wordlist import (
        blocked_term_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    m = did % 5
    text = F.col("text")
    content = (
        F.when(did % 29 == 0, F.lit(None).cast("string"))
        .when(m == 0, F.concat(text, F.lit(" vileword")))
        .when(
            m == 1,
            F.concat(
                F.lit("scumterm "), text, F.lit(" NASTYBIT scumterm")
            ),
        )
        .when(m == 2, F.concat(text, F.lit(" Vileword and vilewords")))
        .otherwise(text)
    )
    return blocked_term_stats(
        docs.select("doc_id", content.alias("text")),
        ["doc_id"],
        "text",
        _WORDLIST_TERMS,
        max_hit_rate=0.02,
    )


_BLOCKED_TERMS_ORACLE_SQL = """
    with c0 as (
      select doc_id,
             case when doc_id % 29 = 0 then NULL
                  when doc_id % 5 = 0 then text || ' vileword'
                  when doc_id % 5 = 1 then
                       'scumterm ' || text || ' NASTYBIT scumterm'
                  when doc_id % 5 = 2 then
                       text || ' Vileword and vilewords'
                  else text end as text
      from documents
    ), tk as (
      select doc_id,
             list_filter(
               regexp_split_to_array(
                 trim(lower(coalesce(text, ''))), '\\s+'),
               t -> t <> '') as toks
      from c0
    ), h as (
      select doc_id, toks,
             list_filter(
               toks,
               t -> t in ('nastybit', 'scumterm', 'vileword')) as hits
      from tk
    )
    select doc_id,
           cast(len(toks) as int) as n_tokens,
           cast(len(hits) as int) as n_blocked,
           cast(len(list_distinct(hits)) as int) as n_blocked_distinct,
           coalesce(array_to_string(list_sort(list_distinct(hits)), ','),
                    '') as blocked_found,
           cast(case when len(hits) * 1000000 <= 20000 * len(toks)
                     then 1 else 0 end as int) as keep
    from h
"""


def q_boilerplate(spark, sf_dir):
    """Corpus-frequency boilerplate line removal
    (operators/boilerplate.remove_boilerplate_lines — the CCNet /
    RefinedWeb data-driven line filter): lines whose DOCUMENT
    frequency reaches max(min_df=2, ceil(0.2 * n_docs)) are removed
    from every document, including the first occurrence (the exact
    opposite keep-rule of global_line_dedup).  Stripes: a footer
    planted on ~half the docs (m in 0,1 — and TWICE on m==0 to pin
    all-occurrence removal), a nav banner on ~quarter (above the 0.2
    threshold), a rare footer on doc_id%97 (below threshold — must
    survive), NULL text.  Detection = one map-side-combined groupBy
    over per-doc DISTINCT lines; the detected set is bounded by
    L_avg/frac, collected under a loud guard, and removal is one
    codegen projection with an InSet line probe."""
    from schema_validator_spark.operators.boilerplate import (
        remove_boilerplate_lines,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    m = did % 4
    text = F.col("text")
    nl = F.lit("\n")
    foot = F.lit("// generated by makedocs")
    nav = F.lit("### nav: home | about")
    rare = F.lit("// rare footer")
    content = (
        F.when(did % 29 == 0, F.lit(None).cast("string"))
        .when(m == 0, F.concat(foot, nl, text, nl, foot))
        .when(m == 1, F.concat(nav, nl, text, nl, foot))
        .when(did % 97 == 0, F.concat(text, nl, rare))
        .otherwise(text)
    )
    return remove_boilerplate_lines(
        docs.select("doc_id", content.alias("text")),
        ["doc_id"],
        "text",
        min_df=2,
        max_df_frac=0.2,
    )


_BOILERPLATE_ORACLE_SQL = """
    with docs as (
      select doc_id,
             case when doc_id % 29 = 0 then NULL
                  when doc_id % 4 = 0 then
                       '// generated by makedocs' || chr(10) || text
                       || chr(10) || '// generated by makedocs'
                  when doc_id % 4 = 1 then
                       '### nav: home | about' || chr(10) || text
                       || chr(10) || '// generated by makedocs'
                  when doc_id % 97 = 0 then
                       text || chr(10) || '// rare footer'
                  else text end as text
      from documents
    ), ls as (
      select doc_id, str_split(coalesce(text, ''), chr(10)) as ls
      from docs
    ), dl as (
      select distinct doc_id, line
      from (select doc_id, unnest(ls) as line from ls)
      where trim(line) <> ''
    ), bp as (
      select line from dl group by line
      having count(*) >= greatest(
        2, ceil(0.2 * (select count(*) from docs)))
    ), bl as (
      select coalesce(list(line), cast([] as varchar[])) as bls from bp
    ), out as (
      select doc_id, ls,
             list_filter(ls, l -> not list_contains(bls, l)) as kept
      from ls, bl
    )
    select doc_id,
           cast(len(ls) as int) as n_lines,
           cast(len(ls) - len(kept) as int) as n_removed,
           array_to_string(kept, chr(10)) as text_clean
    from out
"""


def q_chat_lint(spark, sf_dir):
    """SFT conversation-format lint (operators/chatlint.chat_lint):
    structural validation of chat-JSONL training rows — role
    vocabulary, at-most-one LEADING system, user-first, strict
    user/assistant alternation, assistant-last, no empty turns; the
    conversation-grain analog of the reference's struct validation.
    Nine stripes hit every first_error code (valid-with-system,
    valid-without, invalid JSON, top-level object, [], bad role,
    empty content, broken alternation, wrong last role) + NULL rows;
    contents are doc-unique so nothing is constant-folded away.  One
    codegen projection (from_json + array HOFs), zero shuffles; the
    oracle re-derives every verdict with DuckDB's OWN JSON functions
    over the same raw strings."""
    from schema_validator_spark.operators.chatlint import chat_lint

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    k = did.cast("string")
    m = did % 9

    def turn(role, prefix):
        return F.concat(
            F.lit('{"role":"' + role + '","content":"' + prefix),
            k,
            F.lit('"}'),
        )

    def arr(*cols):
        parts = [F.lit("[")]
        for i, c in enumerate(cols):
            if i:
                parts.append(F.lit(","))
            parts.append(c)
        parts.append(F.lit("]"))
        return F.concat(*parts)

    conv = (
        F.when(did % 29 == 0, F.lit(None).cast("string"))
        .when(m == 0, arr(turn("system", "s"), turn("user", "u"),
                          turn("assistant", "a"), turn("user", "u2"),
                          turn("assistant", "a2")))
        .when(m == 1, arr(turn("user", "u"), turn("assistant", "a")))
        .when(m == 2, F.concat(F.lit('{"oops": '), k))
        .when(m == 3, turn("user", "solo"))
        .when(m == 4, F.lit("[]"))
        .when(m == 5, arr(turn("robot", "r"), turn("assistant", "a")))
        .when(m == 6, arr(turn("user", "u"),
                          F.lit('{"role":"assistant","content":""}')))
        .when(m == 7, arr(turn("user", "u"), turn("user", "u2"),
                          turn("assistant", "a")))
        .otherwise(arr(turn("user", "u"), turn("assistant", "a"),
                       turn("user", "tail")))
    )
    return chat_lint(
        docs.select("doc_id", conv.alias("conv")), ["doc_id"], "conv"
    )


_CHAT_LINT_ORACLE_SQL = """
    with docs as (
      select doc_id,
             case when doc_id % 29 = 0 then NULL
                  when doc_id % 9 = 0 then
                    '[{"role":"system","content":"s' || doc_id || '"},'
                    || '{"role":"user","content":"u' || doc_id || '"},'
                    || '{"role":"assistant","content":"a' || doc_id
                    || '"},{"role":"user","content":"u2' || doc_id
                    || '"},{"role":"assistant","content":"a2' || doc_id
                    || '"}]'
                  when doc_id % 9 = 1 then
                    '[{"role":"user","content":"u' || doc_id || '"},'
                    || '{"role":"assistant","content":"a' || doc_id
                    || '"}]'
                  when doc_id % 9 = 2 then '{"oops": ' || doc_id
                  when doc_id % 9 = 3 then
                    '{"role":"user","content":"solo' || doc_id || '"}'
                  when doc_id % 9 = 4 then '[]'
                  when doc_id % 9 = 5 then
                    '[{"role":"robot","content":"r' || doc_id || '"},'
                    || '{"role":"assistant","content":"a' || doc_id
                    || '"}]'
                  when doc_id % 9 = 6 then
                    '[{"role":"user","content":"u' || doc_id || '"},'
                    || '{"role":"assistant","content":""}]'
                  when doc_id % 9 = 7 then
                    '[{"role":"user","content":"u' || doc_id || '"},'
                    || '{"role":"user","content":"u2' || doc_id || '"},'
                    || '{"role":"assistant","content":"a' || doc_id
                    || '"}]'
                  else
                    '[{"role":"user","content":"u' || doc_id || '"},'
                    || '{"role":"assistant","content":"a' || doc_id
                    || '"},{"role":"user","content":"tail' || doc_id
                    || '"}]'
             end as conv
      from documents
    ), u as (
      select doc_id, conv,
             (conv is null or trim(conv) = '') as missing,
             (conv is not null and trim(conv) <> ''
              and json_valid(conv)) as parsed_ok
      from docs
    ), a0 as (
      select doc_id, conv, missing, parsed_ok,
             case when parsed_ok then json_type(conv) end as jtype
      from u
    ), a as (
      select doc_id, conv, missing, parsed_ok,
             coalesce(jtype = 'ARRAY', false) as is_arr,
             case when coalesce(jtype = 'ARRAY', false)
                  then cast(json_array_length(conv) as int)
                  else 0 end as n
      from a0
    ), v as (
      select doc_id, missing, parsed_ok, is_arr, n,
             case when is_arr then list_transform(range(n),
               i -> json_extract_string(conv, '$[' || i || '].role'))
               else cast([] as varchar[]) end as roles,
             case when is_arr then list_transform(range(n),
               i -> json_extract_string(conv, '$[' || i || '].content'))
               else cast([] as varchar[]) end as conts
      from a
    ), w as (
      select *,
             case when len(roles) > 0 and roles[1] = 'system'
                  then roles[2:] else roles end as body
      from v
    ), x as (
      select *,
             len(list_filter(roles, r -> r is null
                 or r not in ('system', 'user', 'assistant'))) > 0
               as bad_role,
             len(list_filter(conts, c -> c is null or trim(c) = '')) > 0
               as empty_content,
             list_contains(body, 'system') as system_not_first,
             (len(body) > 0 and body[1] <> 'user') as not_user_first,
             (len(body) >= 2 and len(list_filter(
                 range(2, len(body) + 1),
                 i -> body[i] = body[i - 1])) > 0) as no_alternation,
             (n > 0 and roles[n] <> 'assistant') as not_assistant_last
      from w
    ), y as (
      select doc_id, n, roles, conts,
             case when missing then 'missing'
                  when not parsed_ok then 'invalid_json'
                  when not is_arr then 'not_an_array'
                  when n = 0 then 'empty_conversation'
                  when bad_role then 'bad_role'
                  when empty_content then 'empty_content'
                  when system_not_first then 'system_not_first'
                  when not_user_first then 'not_user_first'
                  when no_alternation then 'no_alternation'
                  when not_assistant_last then 'not_assistant_last'
                  else 'ok' end as first_error
      from x
    )
    select doc_id,
           cast(n as int) as n_turns,
           cast(len(list_filter(roles, r -> r = 'system')) as int)
             as n_system,
           cast(len(list_filter(roles, r -> r = 'user')) as int)
             as n_user,
           cast(len(list_filter(roles, r -> r = 'assistant')) as int)
             as n_assistant,
           cast(len(list_filter(conts, c -> c is null or trim(c) = ''))
                as int) as n_empty,
           first_error,
           cast(case when first_error = 'ok' then 1 else 0 end as int)
             as keep
    from y
"""


def q_split_assign(spark, sf_dir):
    """Leakage-safe train/val/test split
    (operators/split.leakage_safe_split): documents are assigned by
    their duplicate-CLUSTER representative, so no near-dup pair can
    straddle the train/eval fence — the constructive fix for the
    contamination shard_leakage audits.  Pairs: (i, i+1) for i%4==0
    plus (i+1, i+2) for i%20==0 — every 20-block is a TRANSITIVE
    3-chain, pinning that components (not just pairs) share a split.
    Assignment = md5(cluster_id, salt) against precomputed hex-string
    thresholds (split_thresholds — single source with this oracle):
    fixed-width lowercase hex compares like its numeric value, zero
    floats, bit-exact on any engine.  CC runs at pair scale; the
    corpus pays one left join + a codegen projection."""
    from schema_validator_spark.operators.split import (
        leakage_safe_split,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    pairs = (
        docs.filter(did % 4 == 0)
        .select(did.alias("id_a"), (did + 1).alias("id_b"))
        .unionByName(
            docs.filter(did % 20 == 0).select(
                (did + 1).alias("id_a"), (did + 2).alias("id_b")
            )
        )
    )
    return leakage_safe_split(
        docs.select("doc_id"),
        "doc_id",
        pairs,
        ratios={"train": 0.8, "val": 0.1, "test": 0.1},
        salt="v1",
    )


def _split_assign_oracle_sql() -> str:
    """Replay q_split_assign: identical pair construction, components
    via a recursive-CTE min-label closure, and the SAME hex-string
    thresholds from split_thresholds (single source)."""
    from schema_validator_spark.operators.split import split_thresholds

    b = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    h = "substr(md5(cast(cluster_id as varchar) || 'v1'), 1, 15)"
    case = (
        f"case when {h} < '{b[0][1]}' then '{b[0][0]}'\n"
        f"     when {h} < '{b[1][1]}' then '{b[1][0]}'\n"
        f"     else '{b[2][0]}' end"
    )
    return f"""
      with recursive pairs as (
        select doc_id as id_a, doc_id + 1 as id_b
        from documents where doc_id % 4 = 0
        union all
        select doc_id + 1, doc_id + 2
        from documents where doc_id % 20 = 0
      ), edges as (
        select id_a as a, id_b as b from pairs
        union
        select id_b, id_a from pairs
      ), reach(node, label) as (
        select a, a from (select distinct a from edges)
        union
        select e.a, r.label from edges e join reach r on r.node = e.b
      ), comp as (
        select node, min(label) as cluster_id from reach group by node
      ), asg as (
        select d.doc_id,
               coalesce(c.cluster_id, d.doc_id) as cluster_id
        from documents d left join comp c on c.node = d.doc_id
      )
      select doc_id, cluster_id, {case} as split
      from asg
    """


#: chat_render stripe turn lists — single source for the Spark JSON
#: synthesis AND the oracle's turns CTE (content = prefix || doc_id,
#: or '' when the prefix is empty — the must-stay-total edge)
_RENDER_STRIPES = {
    0: [("system", "s"), ("user", "u"), ("assistant", "a"),
        ("user", "u2"), ("assistant", "a2")],
    1: [("user", "u"), ("assistant", "a")],
    2: [("user", "uo")],          # no assistant turn -> no rows
    3: [("assistant", "")],       # empty content -> empty span
}


def q_chat_render(spark, sf_dir):
    """Chat-template rendering + assistant loss-mask spans
    (operators/chatrender.render_chat — the step after chat_lint in
    an SFT pipeline): one row per assistant turn with the rendered
    text's md5, total chars, 0-based [start, end) character offsets,
    and span_text sliced BACK OUT of the rendered string at those
    offsets — so the oracle's independent derivation (window cumsum
    over per-turn piece lengths; span_text taken from the CONTENT,
    never sliced) cross-verifies the offsets byte-for-byte.  Stripes:
    two-span, one-span, zero-span, and empty-content conversations +
    NULL rows.  from_json bound once, one O(n_turns) aggregate pass,
    zero shuffles."""
    from schema_validator_spark.operators.chatrender import render_chat

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    k = did.cast("string")

    def jturn(role, prefix):
        if prefix:
            return F.concat(
                F.lit('{"role":"' + role + '","content":"' + prefix),
                k,
                F.lit('"}'),
            )
        return F.lit('{"role":"' + role + '","content":""}')

    def jarr(turns):
        parts = [F.lit("[")]
        for i, (role, prefix) in enumerate(turns):
            if i:
                parts.append(F.lit(","))
            parts.append(jturn(role, prefix))
        parts.append(F.lit("]"))
        return F.concat(*parts)

    conv = F.when(did % 29 == 0, F.lit(None).cast("string"))
    for m, turns in _RENDER_STRIPES.items():
        conv = conv.when(did % 4 == m, jarr(turns))
    return render_chat(
        docs.select("doc_id", conv.alias("conv")), ["doc_id"], "conv"
    )


def _chat_render_oracle_sql() -> str:
    """Replay q_chat_render independently: turns CTE from the SAME
    _RENDER_STRIPES, offsets via window cumsum of piece lengths,
    span_text from the turn CONTENT (the renderer slices it from the
    rendered string — agreement pins the offsets)."""
    unions = []
    for m, turns in _RENDER_STRIPES.items():
        for i, (role, prefix) in enumerate(turns):
            content = (
                f"'{prefix}' || cast(doc_id as varchar)" if prefix
                else "''"
            )
            unions.append(
                f"select doc_id, {i} as i, '{role}' as role, "
                f"{content} as content from documents "
                f"where doc_id % 29 <> 0 and doc_id % 4 = {m}"
            )
    turns_sql = "\n        union all\n        ".join(unions)
    return f"""
      with turns as (
        {turns_sql}
      ), pieces as (
        select doc_id, i, role, content,
               5 + length(role) + length(content) + 1 as plen,
               length(role) + 5 as header
        from turns
      ), pos as (
        select *,
               coalesce(sum(plen) over (
                 partition by doc_id order by i
                 rows between unbounded preceding and 1 preceding), 0)
                 as pstart
        from pieces
      ), rend as (
        select doc_id,
               string_agg('<|' || role || '|>' || chr(10) || content
                          || chr(10), '' order by i) as rendered
        from pieces group by doc_id
      )
      select p.doc_id,
             md5(r.rendered) as rendered_md5,
             cast(length(r.rendered) as int) as n_chars,
             cast(row_number() over (partition by p.doc_id
                                     order by p.i) - 1 as bigint)
               as span_idx,
             cast(p.pstart + p.header as bigint) as start_char,
             cast(p.pstart + p.header + length(p.content) as bigint)
               as end_char,
             p.content as span_text
      from pos p join rend r on r.doc_id = p.doc_id
      where p.role = 'assistant'
    """


#: normalize stripe templates — single source for Spark + oracle;
#: note stripe 0 is DECOMPOSED (e + U+0301), stripe 4 precomposed
_NORM_STRIPES = {
    0: "nfd café text ",
    1: "“q” – ‘x’ — ",
    2: "a​b\r\nc ",
    3: "plain ascii ",
    4: "nfc café ",
    5: "nb sp ",
}


def q_normalize(spark, sf_dir):
    """Unicode text normalization (operators/normalize.normalize_text):
    punctuation/whitespace unification in pure codegen (curly->ASCII
    quotes, dashes->'-', NBSP->space, zero-width removed, CRLF->LF)
    composed with NFC via the documented Arrow-batched Python tier
    (Spark SQL has no UCD normalizer; ASCII rows skip the table via a
    C-level isascii check).  Stripes: decomposed NFD accents (shrink
    by 1 char), curly punctuation, zero-width+CRLF, plain ASCII
    (identity), precomposed NFC (identity), NBSP, NULL.  The oracle
    replays tier 1 from the SAME PUNCT_MAP/ZW_DELETE constants and
    tier 2 with DuckDB's OWN nfc_normalize — two independent UCD
    implementations must agree byte-for-byte."""
    from schema_validator_spark.operators.normalize import normalize_text

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    k = did.cast("string")
    conv = F.when(did % 29 == 0, F.lit(None).cast("string"))
    for m, tpl in _NORM_STRIPES.items():
        conv = conv.when(did % 6 == m, F.concat(F.lit(tpl), k))
    return normalize_text(
        docs.select("doc_id", conv.alias("text")), ["doc_id"], "text"
    )


def _normalize_oracle_sql() -> str:
    """Replay q_normalize: identical stripes, tier 1 from the SAME
    PUNCT_MAP/ZW_DELETE/line-ending chain, tier 2 = nfc_normalize."""
    from schema_validator_spark.operators.normalize import (
        PUNCT_MAP,
        ZW_DELETE,
    )

    src = "".join(PUNCT_MAP)
    dst = "".join(PUNCT_MAP.values())
    def tpl_sql(t: str) -> str:
        return (
            _esc_sq(t)
            .replace("\r", "' || chr(13) || '")
            .replace("\n", "' || chr(10) || '")
        )

    cases = "\n".join(
        f"                  when doc_id % 6 = {m} then "
        f"'{tpl_sql(tpl)}' || cast(doc_id as varchar)"
        for m, tpl in _NORM_STRIPES.items()
    )
    return f"""
      with docs as (
        select doc_id,
               case when doc_id % 29 = 0 then NULL
{cases}
               end as text
        from documents
      ), t1 as (
        select doc_id, text,
               regexp_replace(
                 regexp_replace(
                   translate(text, '{_esc_sq(src)}', '{_esc_sq(dst)}'),
                   '[{ZW_DELETE}]', '', 'g'),
                 '\r\n|\r', chr(10), 'g') as s1
        from docs
      ), t2 as (
        select doc_id, text, nfc_normalize(s1) as text_norm from t1
      )
      select doc_id, text_norm,
             cast(case when text is null or text = text_norm
                  then 0 else 1 end as int) as changed,
             cast(coalesce(length(text), 0) as int) as n_chars_before,
             cast(coalesce(length(text_norm), 0) as int)
               as n_chars_after
      from t2
    """


def q_preference_lint(spark, sf_dir):
    """DPO/RLHF preference-pair gate
    (operators/preference.preference_lint): (prompt, chosen, rejected)
    triples carry signal only when complete and actually DIFFERENT —
    byte-identical or fold-identical (trim + whitespace collapse +
    lower) completions are zero-gradient comparisons.  The reference's
    nefield cross-field rule lifted to a priority chain.  Stripes:
    valid, byte-identical, fold-identical ('X  Y' vs ' x y '), NULL
    prompt, empty chosen, blank rejected.  One codegen projection,
    zero shuffles."""
    from schema_validator_spark.operators.preference import (
        preference_lint,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    k = did.cast("string")
    m = did % 6
    prompt = F.when(m == 3, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("why "), k, F.lit("?"))
    )
    chosen = (
        F.when(m == 1, F.concat(F.lit("Same ans "), k))
        .when(m == 2, F.concat(F.lit("X  Y "), k))
        .when(m == 4, F.lit(""))
        .otherwise(F.concat(F.lit("good answer "), k))
    )
    rejected = (
        F.when(m == 1, F.concat(F.lit("Same ans "), k))
        .when(m == 2, F.concat(F.lit(" x y "), k))
        .when(m == 5, F.lit("   "))
        .otherwise(F.concat(F.lit("bad answer "), k))
    )
    return preference_lint(
        docs.select(
            "doc_id",
            prompt.alias("prompt"),
            chosen.alias("chosen"),
            rejected.alias("rejected"),
        ),
        ["doc_id"],
        "prompt",
        "chosen",
        "rejected",
    )


_PREFERENCE_ORACLE_SQL = r"""
    with docs as (
      select doc_id,
             case when doc_id % 6 = 3 then NULL
                  else 'why ' || cast(doc_id as varchar) || '?'
             end as prompt,
             case when doc_id % 6 = 1 then
                    'Same ans ' || cast(doc_id as varchar)
                  when doc_id % 6 = 2 then
                    'X  Y ' || cast(doc_id as varchar)
                  when doc_id % 6 = 4 then ''
                  else 'good answer ' || cast(doc_id as varchar)
             end as chosen,
             case when doc_id % 6 = 1 then
                    'Same ans ' || cast(doc_id as varchar)
                  when doc_id % 6 = 2 then
                    ' x y ' || cast(doc_id as varchar)
                  when doc_id % 6 = 5 then '   '
                  else 'bad answer ' || cast(doc_id as varchar)
             end as rejected
      from documents
    ), v as (
      select doc_id, prompt, chosen, rejected,
             lower(regexp_replace(trim(chosen), '\s+', ' ', 'g'))
               as fc,
             lower(regexp_replace(trim(rejected), '\s+', ' ', 'g'))
               as fr
      from docs
    ), e as (
      select doc_id, prompt, chosen, rejected,
             case when prompt is null or trim(prompt) = ''
                    then 'missing_prompt'
                  when chosen is null or trim(chosen) = ''
                    then 'missing_chosen'
                  when rejected is null or trim(rejected) = ''
                    then 'missing_rejected'
                  when chosen = rejected then 'identical'
                  when fc = fr then 'identical_folded'
                  else 'ok' end as first_error
      from v
    )
    select doc_id,
           cast(coalesce(length(prompt), 0) as int) as n_chars_prompt,
           cast(coalesce(length(chosen), 0) as int) as n_chars_chosen,
           cast(coalesce(length(rejected), 0) as int)
             as n_chars_rejected,
           first_error,
           cast(case when first_error = 'ok' then 1 else 0 end as int)
             as keep
    from e
"""


def q_rank_buckets(spark, sf_dir):
    """CCNet head/middle/tail bucketing
    (operators/rankbucket.rank_buckets): per-group EXACT rank by
    (score, id) cut into thirds by integer cross-multiplication —
    the quality-bucket stage LLaMA-class corpora select data with.
    Distributed rank: monotone 256-way range key + per-(group, range)
    count offsets + local row_number — the dominant group sorts as up
    to 256 parallel tasks, never one (plan-pinned in tests).  Stripes
    plant NULL scores (rank FIRST, nulls-first semantics) and a NULL
    group (a legitimate group, null-safe joins).  Oracle = the serial
    window definition the distributed form is row-identical to."""
    from schema_validator_spark.operators.rankbucket import rank_buckets

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    d = docs.select(
        "doc_id",
        F.when(did % 31 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("lang")).alias("lang"),
        F.when(did % 29 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("n_chars")).alias("score"),
    )
    out = rank_buckets(d, ["lang"], "score", "doc_id")
    # NULL stays NULL through the RANKING (nulls-first pinned); only
    # the emitted column is coalesced — a NULL bigint would ride back
    # from DuckDB as pandas float64 and hash as '171.000000'/nan
    return out.select(
        "doc_id",
        "lang",
        F.coalesce(F.col("score"), F.lit(-1)).alias("score"),
        "rank",
        "group_n",
        "bucket",
    )


_RANK_BUCKETS_ORACLE_SQL = """
    with d as (
      select doc_id,
             case when doc_id % 31 = 0 then NULL else lang end as lang,
             case when doc_id % 29 = 0 then NULL
                  else cast(n_chars as bigint) end as score
      from documents
    ), r as (
      select doc_id, lang, score,
             cast(row_number() over (
               partition by lang
               order by score asc nulls first, doc_id asc) as bigint)
               as rank,
             cast(count(*) over (partition by lang) as bigint)
               as group_n
      from d
    )
    select doc_id, lang, coalesce(score, -1) as score, rank, group_n,
           case when rank * 3 <= group_n then 'head'
                when rank * 3 <= 2 * group_n then 'middle'
                else 'tail' end as bucket
    from r
"""


#: dsir query parameters — single source for Spark + oracle
_DSIR_NB = 512
_DSIR_SALT = "v1"


def q_dsir(spark, sf_dir):
    """DSIR importance weighting (operators/dsir.dsir_weights — Xie
    et al. 2023): score raw docs by ln p_target - ln p_raw under two
    hashed-n-gram bag models (unigrams + bigrams, md5 buckets,
    add-one smoothing) — the label-free 'select web data that looks
    like the target' recipe.  Target = every 10th document (its lang
    mix differs from the corpus, so weights are non-trivial).  The
    corpus never shuffles for scoring: bucket-grain model aggs ->
    driver-built literal weight array of 6dp-scaled longs ->
    constant-folded array probe inside one aggregate HOF.  The oracle
    recomputes counts, ln-weights, and the per-doc integer sum
    entirely in SQL — bucketing replayed via the same md5 prefix."""
    from schema_validator_spark.operators.dsir import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    raw = docs.select("doc_id", "text")
    tgt = docs.filter(F.col("doc_id") % 10 == 0).select("text")
    return dsir_weights(
        raw, ["doc_id"], "text", tgt, "text",
        n_buckets=_DSIR_NB, salt=_DSIR_SALT,
    )


def _dsir_oracle_sql() -> str:
    nb, salt = _DSIR_NB, _DSIR_SALT
    feats = """
        select doc_id,
               list_concat(
                 toks,
                 list_transform(
                   range(1, greatest(len(toks), 1)),
                   i -> toks[i] || ' ' || toks[i + 1])) as feats
        from (
          select doc_id,
                 list_filter(
                   regexp_split_to_array(
                     trim(lower(coalesce(text, ''))), '\\s+'),
                   t -> t <> '') as toks
          from documents)
    """
    return f"""
      with fe as ({feats}),
      fr as (
        select doc_id,
               cast(('0x' || substr(md5(f || '{salt}'), 1, 8))
                    as bigint) % {nb} as b
        from (select doc_id, unnest(feats) as f from fe)
      ),
      tc as (
        select b, count(*) as c from fr
        where doc_id % 10 = 0 group by b
      ),
      rc as (select b, count(*) as c from fr group by b),
      tot as (
        select (select coalesce(sum(c), 0) from tc) + {nb} as tt,
               (select coalesce(sum(c), 0) from rc) + {nb} as rt
      ),
      w as (
        select bb.b,
               cast(round(1e6 * (
                 ln((coalesce(tc.c, 0) + 1) / (1.0 * tot.tt))
                 - ln((coalesce(rc.c, 0) + 1) / (1.0 * tot.rt))))
                 as bigint) as w
        from (select unnest(range({nb})) as b) bb
        cross join tot
        left join tc on tc.b = bb.b
        left join rc on rc.b = bb.b
      ),
      scored as (
        select fr.doc_id,
               cast(count(*) as int) as n_features,
               cast(sum(w.w) as bigint) as score_e6
        from fr join w on w.b = fr.b
        group by fr.doc_id
      )
      select d.doc_id,
             coalesce(s.n_features, 0) as n_features,
             coalesce(s.score_e6, 0) as score_e6
      from documents d left join scored s on s.doc_id = d.doc_id
    """


def q_bitext_pairs(spark, sf_dir):
    """Margin-based parallel-pair mining
    (operators/bitext.mine_parallel_pairs — Artetxe & Schwenk 2019,
    the LASER/CCMatrix bitext recipe behind WMT-scale corpora):
    mutual-best margin pairs between two embedding spaces, margin =
    cos / mean-of-both-knns computed as ONE integer-ratio division
    over e6-scaled cosine SUMS (a float avg would sum partials in
    nondeterministic order).  A = the first 25 embeddings; B = their
    1.3x scaled copies (cosine exactly 1, the planted mutual best)
    + every other embedding as distractors.  Oracle replays the whole
    thing — both exact top-k sides, integer knn sums, margin, mutual
    argmax — in SQL."""
    from schema_validator_spark.operators.bitext import (
        mine_parallel_pairs,
    )

    embs = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    a = embs.filter(F.col("vec_id") < 25)
    b = a.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * 1.3).alias(
            "embedding"
        ),
    ).unionByName(embs.filter(F.col("vec_id") >= 25))
    return mine_parallel_pairs(a, b, k=3)


_BITEXT_ORACLE_SQL = """
    with av as (
      select vec_id, embedding::DOUBLE[] as v from embeddings
      where vec_id < 25
    ), bv as (
      select vec_id + 1000000 as vec_id,
             list_transform(embedding::DOUBLE[], x -> x * 1.3) as v
      from embeddings where vec_id < 25
      union all
      select vec_id, embedding::DOUBLE[] from embeddings
      where vec_id >= 25
    ), scored as (
      select a.vec_id as ida, b.vec_id as idb,
             round(
               list_sum(list_transform(range(1, len(a.v) + 1),
                 i -> a.v[i] * b.v[i]))
               / (sqrt(list_sum(list_transform(range(1, len(a.v) + 1),
                    i -> a.v[i] * a.v[i])))
                  * sqrt(list_sum(list_transform(
                      range(1, len(b.v) + 1), i -> b.v[i] * b.v[i])))),
               6) as cosine
      from av a cross join bv b
    ), fwd as (
      select * from (
        select ida, idb, cosine,
               row_number() over (partition by ida
                 order by cosine desc, idb asc) as rn
        from scored) where rn <= 3
    ), bwd as (
      select * from (
        select ida, idb, cosine,
               row_number() over (partition by idb
                 order by cosine desc, ida asc) as rn
        from scored) where rn <= 3
    ), sa as (
      select ida, cast(sum(cast(round(cosine * 1e6) as bigint))
                       as bigint) as s, count(*) as k
      from fwd group by ida
    ), sb as (
      select idb, cast(sum(cast(round(cosine * 1e6) as bigint))
                       as bigint) as s, count(*) as k
      from bwd group by idb
    ), fc as (
      select f.ida, f.idb, f.cosine,
             case when sa.s + sb.s > 0 then
               cast(round(cast(round(f.cosine * 1e6) as bigint)
                          * (sa.k + sb.k) * 1000000.0
                          / (sa.s + sb.s)) as bigint)
             else 0 end as margin_e6
      from fwd f join sa on sa.ida = f.ida join sb on sb.idb = f.idb
    ), bc as (
      select b.ida, b.idb, b.cosine,
             case when sa.s + sb.s > 0 then
               cast(round(cast(round(b.cosine * 1e6) as bigint)
                          * (sa.k + sb.k) * 1000000.0
                          / (sa.s + sb.s)) as bigint)
             else 0 end as margin_e6
      from bwd b join sa on sa.ida = b.ida join sb on sb.idb = b.idb
    ), fbest as (
      select * from (
        select ida, idb, cosine, margin_e6,
               row_number() over (partition by ida
                 order by margin_e6 desc, idb asc) as rn
        from fc) where rn = 1
    ), bbest as (
      select * from (
        select ida, idb,
               row_number() over (partition by idb
                 order by margin_e6 desc, ida asc) as rn
        from bc) where rn = 1
    )
    select f.ida as id_a, f.idb as id_b, f.cosine, f.margin_e6
    from fbest f
    join bbest b on b.ida = f.ida and b.idb = f.idb
    where f.margin_e6 > 1000000
"""


def q_pack_sweep(spark, sf_dir):
    """Context-length planning sweep (operators/packing.pack_sweep):
    for each candidate sequence length, truncation losses, pad waste,
    utilization, and the packed-alternative sequence count — the
    numbers that decide training max_len — in ONE map-side-combined
    pass (|Ls| x 4 conditional aggregates + a stack unpivot of the
    single result row; zero row multiplication).  Token counts =
    whitespace tokens of documents.text; Ls = 32/128/512 straddle the
    corpus length distribution so every stat is non-trivial."""
    from schema_validator_spark.operators.packing import pack_sweep

    docs = _t(spark, sf_dir, "documents")
    counted = docs.select(
        X.token_count(F.col("text")).alias("n_tokens")
    )
    return pack_sweep(counted, "n_tokens", [32, 128, 512])


def _pack_sweep_oracle_sql() -> str:
    per_l = "\n      union all\n".join(f"""
      select {L} as max_len,
             cast(count(*) as bigint) as n_docs,
             cast(sum(case when n > {L} then 1 else 0 end) as bigint)
               as docs_truncated,
             cast(sum(greatest(n - {L}, 0)) as bigint) as tokens_lost,
             cast(sum({L} - least(n, {L})) as bigint) as pad_tokens,
             cast(ceil(sum(n) / {L}.0) as bigint) as n_packed_seqs,
             cast(round(sum(least(n, {L})) * 1e6
                        / (count(*) * {L}.0)) as bigint)
               as utilization_e6
      from tk""" for L in (32, 128, 512))
    return f"""
      with tk as (
        select cast(len(list_filter(
                 regexp_split_to_array(
                   trim(coalesce(text, '')), '\\s+'),
                 t -> t <> '')) as bigint) as n
        from documents
      )
      {per_l}
    """


def q_image_ahash(spark, sf_dir):
    """Perceptual image hashing (operators/imagehash.image_hashes —
    the aHash/pHash-family multimodal dedup tier LAION/DataComp run):
    REAL 8x8 PNGs are generated in executors (stdlib codec,
    functions/png.py) with the deterministic pattern
    px(x, y) = (x*17 + y*31 + id) % 256, plus a corrupt stripe
    (id%13: not-a-PNG bytes -> decode_ok=false, NULL hash, never
    dropped).  The oracle derives the EXPECTED hash purely
    arithmetically from the pattern (no image bytes anywhere in SQL) —
    equality therefore pins the entire encode -> decode -> grayscale
    -> integer-threshold -> bit-pack pipeline byte-exactly.  Hash bits
    use the strict integer cross-multiply p*64 > sum (no float ever
    decides a bit)."""
    from schema_validator_spark.operators.imagehash import image_hashes

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        import numpy as np
        import pandas as pd

        from schema_validator_spark.functions import png as PNG

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 13 == 0:
                    rows.append((did, b"JUNK" + str(did).encode()))
                else:
                    yy, xx = np.mgrid[0:8, 0:8]
                    px = ((xx * 17 + yy * 31 + did) % 256).astype(
                        "uint8"
                    )
                    rows.append((did, PNG.encode_png(px)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return image_hashes(media)


def q_video_frames(spark, sf_dir):
    """Video modality with a REAL stdlib codec
    (operators/multimodal.extract_video_frames over functions/y4m.py —
    YUV4MPEG2, the uncompressed interchange format ffmpeg emits;
    completes the PNG/WAV precedent for the one modality that had only
    the chunking stand-in).  Y4M payloads are generated in executors
    with the planted luma pattern y(x, y, f) = (x*7 + y*13 + 29*f +
    id) % 256 across 2 + id%3 frames (dims/chroma vary with id), plus
    a corrupt stripe (id%13: not-Y4M bytes -> decode_ok=false, never
    dropped).  every_k=2 frame sampling.  The oracle recomputes each
    sampled frame's exact integer luma sum purely arithmetically — no
    video bytes anywhere in SQL — so equality pins the entire encode
    -> demux -> plane-slice -> sum pipeline byte-exactly."""
    from schema_validator_spark.operators.multimodal import (
        extract_video_frames,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        import numpy as np
        import pandas as pd

        from schema_validator_spark.functions import y4m as Y4M

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 13 == 0:
                    rows.append((did, b"NOTY4M" + str(did).encode()))
                    continue
                w, h = 8 + (did % 3) * 2, 6 + (did % 2) * 2
                n = 2 + did % 3
                ff, yy, xx = np.mgrid[0:n, 0:h, 0:w]
                lum = ((xx * 7 + yy * 13 + 29 * ff + did) % 256).astype(
                    "uint8"
                )
                rows.append((did, Y4M.encode_y4m(
                    lum, chroma="420jpeg" if did % 2 == 0 else "mono"
                )))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    out = extract_video_frames(media, every_k=2)
    # corrupt-stripe y_sum: NULL -> -1 sentinel on BOTH sides (a NULL in
    # a bigint oracle column would float-ify duckdb's pandas bridge)
    return out.withColumn("y_sum", F.coalesce("y_sum", F.lit(-1)))


_VIDEO_FRAMES_ORACLE_SQL = """
    with ok as (
      select doc_id, 8 + (doc_id % 3) * 2 as w, 6 + (doc_id % 2) * 2 as h,
             2 + doc_id % 3 as n,
             case when doc_id % 2 = 0 then '420jpeg' else 'mono' end as chroma
      from documents where doc_id % 13 <> 0
    ), fr as (
      select doc_id, w, h, n, chroma, f
      from ok, unnest([0, 2]) as t(f)
      where f < n
    ), cells as (
      select doc_id, f,
             sum(((i % w) * 7 + (i // w) * 13 + 29 * f + doc_id) % 256)
               as y_sum
      from fr, unnest(range(w * h)) as c(i)
      group by doc_id, f
    )
    select fr.doc_id as media_id, true as decode_ok,
           cast(fr.w as int) as width, cast(fr.h as int) as height,
           cast(fr.n as int) as n_frames, fr.chroma,
           cast(fr.f as int) as frame_index,
           cast(c.y_sum as bigint) as y_sum
    from fr join cells c on c.doc_id = fr.doc_id and c.f = fr.f
    union all
    select doc_id, false, -1, -1, -1, NULL, -1, cast(-1 as bigint)
    from documents where doc_id % 13 = 0
"""


_IMAGE_AHASH_ORACLE_SQL = """
    with ok as (
      select doc_id from documents where doc_id % 13 <> 0
    ), bits as (
      select doc_id, i,
             ((i % 8) * 17 + (i // 8) * 31 + doc_id) % 256 as p
      from ok, unnest(range(64)) as t(i)
    ), tot as (
      select doc_id, sum(p) as s from bits group by doc_id
    ), hv as (
      select b.doc_id,
             sum(case when b.p * 64 > t.s
                 then (1::UBIGINT << (63 - cast(b.i as int)))
                 else 0::UBIGINT end) as v
      from bits b join tot t on t.doc_id = b.doc_id
      group by b.doc_id
    )
    select doc_id as media_id, true as decode_ok,
           8 as width, 8 as height,
           lpad(lower(hex(cast(v as ubigint))), 16, '0') as ahash
    from hv
    union all
    select doc_id, false, -1, -1, NULL
    from documents where doc_id % 13 = 0
"""


#: image near-dup planted design: 10 groups of 4 variants; each
#: group's rows 5-7 carry a 24-bit code with pairwise Hamming
#: distance >= 9 (asserted below), so cross-group hashes differ by
#: > 3 + 5 flips and only within-group pairs can pass max_hamming=3.
_AHASH_GROUP_CODES = [
    0x52E6B4, 0xF2A74D, 0x651327, 0x0C5C7F, 0x892F90,
    0x5D9DC9, 0x0ED904, 0x1600A3, 0x11E20B, 0x0F21DD,
]
#: member m flips these bit positions (row 0) relative to the base
_AHASH_FLIPS = {0: [], 1: [0], 2: [0, 1], 3: [0, 1, 2, 3, 4]}


def q_image_neardups(spark, sf_dir):
    """Perceptual near-duplicate detection
    (operators/imagehash.image_near_dups): aHash banding (4 x 16-bit
    bands — pigeonhole-EXACT for Hamming <= 3) + exact bit_count
    verify, over REAL PNGs.  40 planted images: 10 groups x 4
    variants; within a group the variants differ by exactly the
    planted pixel flips (all pixels are 0/255, so the integer
    threshold never moves a non-flipped bit), across groups the
    row-5..7 code plates differ by >= 9 bits.  Expected pair set +
    Hamming values are therefore CONSTANTS the oracle enumerates
    arithmetically — no image bytes anywhere in SQL."""
    import itertools

    for a, b in itertools.combinations(_AHASH_GROUP_CODES, 2):
        assert bin(a ^ b).count("1") >= 9, (hex(a), hex(b))
    from schema_validator_spark.operators.imagehash import (
        image_hashes,
        image_near_dups,
    )

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 40
    ).select("doc_id")
    codes = _AHASH_GROUP_CODES
    flips = _AHASH_FLIPS

    def gen(batches):
        import numpy as np
        import pandas as pd

        from schema_validator_spark.functions import png as PNG

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                g, m = did // 4, did % 4
                px = np.zeros((8, 8), dtype="uint8")
                px[0:5, 4:8] = 255
                code = codes[g]
                for j in range(24):
                    if (code >> j) & 1:
                        px[5 + j // 8, j % 8] = 255
                for bit in flips[m]:
                    y, x = bit // 8, bit % 8
                    px[y, x] = 255 - px[y, x]
                rows.append((did, PNG.encode_png(px)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return image_near_dups(image_hashes(media), max_hamming=3)


_IMAGE_NEARDUP_ORACLE_SQL = """
    with g as (select unnest(range(10)) as g)
    select cast(4 * g + 0 as bigint) as id_a,
           cast(4 * g + 1 as bigint) as id_b, 1 as hamming from g
    union all
    select cast(4 * g + 0 as bigint), cast(4 * g + 2 as bigint), 2
    from g
    union all
    select cast(4 * g + 1 as bigint), cast(4 * g + 2 as bigint), 1
    from g
    union all
    select cast(4 * g + 2 as bigint), cast(4 * g + 3 as bigint), 3
    from g
"""


def q_semantic_contamination(spark, sf_dir):
    """Embedding-space eval-overlap audit
    (operators/semcontam.semantic_contamination — the decontamination
    tier n-gram sweeps miss: paraphrased/reformatted benchmark items
    share no 8-gram but keep their direction).  Eval set = two planted
    stripes of embeddings: vec_id%10==0 scaled x2 (cosine exactly 1.0,
    scale-invariance) and vec_id%10==5 with the first element tripled
    (cosine >= 0.866 by the (1+2t)/sqrt(1+8t) bound).  Natural
    off-diagonal cosine in this table tops out ~0.51, so threshold 0.8
    flags EXACTLY the planted stripes with >0.06 margin either side.
    Zero shuffles: per-row argmax over the broadcast eval set.

    Tier: ``use_arrow=True`` — the 100 TB path (Arrow-batched matmul),
    ~10x the HOF tier's bench stripe at sf0.1 (0.7s vs 9s) and
    verified e6-identical to this oracle at sf0.001/0.01/0.1 (the
    planted-stripe margins dwarf the matmul-ulp / rounding-mode
    caveats in semcontam.py's docstring); the HOF tier remains the
    oracle-exact cross-check via the equivalence tests."""
    from schema_validator_spark.operators.semcontam import (
        semantic_contamination,
    )

    embs = _t(spark, sf_dir, "embeddings")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # eval stripes bounded to vec_id < 1000: identical results at the
    # gate SFs (all ids < 500 there) while keeping the HOF literal's
    # expression-tree analysis cost flat at larger SFs
    ev = (
        embs.filter((F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 1000))
        .select(
            (F.col("vec_id") + 1000000).alias("vec_id"),
            F.transform(dv, lambda x: x * 2.0).alias("embedding"),
        )
        .unionByName(
            embs.filter(
                (F.col("vec_id") % 10 == 5) & (F.col("vec_id") < 1000)
            ).select(
                (F.col("vec_id") + 2000000).alias("vec_id"),
                F.concat(
                    F.array(F.element_at(dv, 1) * 3.0),
                    F.slice(dv, 2, F.size(dv) - 1),
                ).alias("embedding"),
            )
        )
    )
    return semantic_contamination(embs, ev, threshold=0.8, use_arrow=True)


def q_synthetic_text(spark, sf_dir):
    """AI-generated-content detection
    (functions/synthtext.synthetic_text_stats — the post-2023 curation
    stage: phrase tier catches pasted chatbot disclaimers, the
    statistical tier catches slop-lexicon-dense uniform-sentence text).
    Stripes: doc_id%13 appends a disclaimer (phrase flag); %17 replaces
    the doc with 6 identical slop sentences (cv=0, 300 slop/1k — the
    statistical flag); natural docs have no sentence punctuation
    (n_sents=1) so neither tier fires on them.  Zero shuffles; the
    oracle replays tokenization, phrase probes, edge-punct slop
    membership, and the byte-length CV arithmetic independently."""
    from schema_validator_spark.functions.synthtext import (
        synthetic_text_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    sent = F.concat(
        F.lit("We delve into the vibrant tapestry of region "),
        (did % 7).cast("string"),
        F.lit(" results. "),
    )
    content = (
        F.when(
            did % 13 == 0,
            F.concat(
                F.col("text"),
                F.lit(" As an AI language model, I cannot continue."),
            ),
        )
        .when(did % 17 == 0, F.repeat(sent, 6))
        .otherwise(F.col("text"))
    )
    return synthetic_text_stats(
        docs.select("doc_id", content.alias("text")), ["doc_id"], "text"
    )


def q_ngram_saturation(spark, sf_dir):
    """Per-doc n-gram saturation (operators/saturation.ngram_saturation
    — the memorization-risk score between doc-level and span-level
    dedup: fraction of a doc's distinct word 5-grams appearing in >= 2
    docs corpus-wide).  Stripe: doc_id%5 appends one shared 10-token
    anchor — its 6 interior 5-grams become corpus-common for the whole
    stripe while the doc-boundary grams stay unique, so stripe docs get
    a small positive saturation and the oracle replays the exact
    fraction.  Oracle = independent shingle + doc-frequency + join
    replay in SQL (the k=5 form of the k-specific slice template)."""
    from schema_validator_spark.operators.saturation import (
        ngram_saturation,
    )

    docs = _t(spark, sf_dir, "documents")
    content = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.col("text"),
            F.lit(" anchor one two three four five six seven eight nine"),
        ),
    ).otherwise(F.col("text"))
    return ngram_saturation(
        docs.select("doc_id", content.alias("text")),
        "doc_id", "text", k=5, min_df=2,
    )


def q_jsonspec_drift(spark, sf_dir):
    """Semi-structured schema drift
    (operators/jsonspec.json_spec_drift — added/removed keys, dominant
    type changes, presence movement between two corpus versions of a
    JSON column; the json_spec analog of snapshot drift).  Sides split
    events by event_id parity; the current side renames ``legacy`` ->
    ``fresh`` (removed+added), turns ``k`` from int to string (the
    classic silent producer change), varies presence by user stripe,
    and keeps the corrupt stripe (%97) on both sides so n_obj is
    exercised.  Oracle replays both sides' VARIANT walks via DuckDB
    JSON and joins the key-grain frames independently."""
    from schema_validator_spark.operators.jsonspec import json_spec_drift

    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    i = (eid % 100).cast("string")
    u3 = (F.col("user_id") % 3).cast("string")
    bjs = F.when(eid % 97 == 0, F.lit("not json")).otherwise(
        F.concat(
            F.lit('{"k": '), i, F.lit(', "device": "m'), u3,
            F.when(
                F.col("user_id") % 3 == 0, F.lit('", "legacy": true}')
            ).otherwise(F.lit('"}')),
        )
    )
    cjs = F.when(eid % 97 == 0, F.lit("not json")).otherwise(
        F.concat(
            F.lit('{"k": "'), i, F.lit('", "device": "m'), u3,
            F.when(
                F.col("user_id") % 3 <= 1,
                F.concat(
                    F.lit('", "fresh": '), (eid % 9).cast("string"),
                    F.lit(".5}"),
                ),
            ).otherwise(F.lit('"}')),
        )
    )
    base = ev.filter(eid % 2 == 0).select(bjs.alias("js"))
    curr = ev.filter(eid % 2 == 1).select(cjs.alias("js"))
    return json_spec_drift(base, curr, "js")


def q_domain_caps(spark, sf_dir):
    """Per-domain contribution cap
    (operators/groupcap.cap_per_group — the FineWeb "no domain
    dominates" stage): groups over the cap keep a deterministic
    md5-rank subset, under-cap groups pass through UNTOUCHED (no rank,
    no window), NULL domains are never capped.  Stripes: %3 -> the hot
    domain (~n/3 rows, over cap 20), %41 -> NULL domain, else 37 cold
    domains (~9 rows each, under cap).  Output = every kept row —
    equality pins the exact md5-rank selection, not just the counts."""
    from schema_validator_spark.operators.groupcap import cap_per_group

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    dom = (
        F.when(did % 41 == 0, F.lit(None).cast("string"))
        .when(did % 3 == 0, F.lit("hot.com"))
        .otherwise(
            F.concat(F.lit("d"), (did % 37).cast("string"), F.lit(".com"))
        )
    )
    return cap_per_group(
        docs.select("doc_id", dom.alias("reg_domain")),
        "reg_domain", "doc_id", cap=20,
    )


def q_hard_negatives(spark, sf_dir):
    """Hard-negative mining for retrieval training
    (operators/negatives.mine_hard_negatives — DPR-style contrastive
    data): exact top-5 cosine neighbors per query EXCLUDING the
    query's own label group (its positives), exclusion applied before
    ranking, salted two-level top-k.  Queries = vec_id < 6 with their
    labels; the embeddings table's label column is the positive-group
    key.  Oracle replays cosine + the label exclusion + the
    (cosine desc, id asc) ranking."""
    from schema_validator_spark.operators.negatives import (
        mine_hard_negatives,
    )

    embs = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    )
    queries = embs.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    return mine_hard_negatives(queries, embs, k=5)


def _landmark_media(spark, sf_dir):
    """Deterministic tone-frame WAVs for the spectral-landmark queries:
    16 frames of 64 samples; frame w of doc d holds a pure sine at
    integer bin 3 + ((w*(c+2) + c) % 29) with c = d % 23 (amplitude
    8000), so the rFFT argmax per frame is the bin by construction and
    docs of the same class c share the WHOLE sequence.  The per-class
    stride c+2 (coprime with 29) makes the bin DIFFERENCE inside every
    landmark pair dt*(c+2) mod 29 — invertible per dt — so each
    landmark hash belongs to EXACTLY ONE class: buckets are class-
    sized (~n/23, far under the cap at every SF) and cross-class pairs
    share zero landmarks.  doc_id%17 is a corrupt (not-a-WAV) stripe."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        import io
        import wave as wavmod

        import numpy as np
        import pandas as pd

        t = np.arange(64)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 17 == 0:
                    rows.append((did, b"NOTWAV" + str(did).encode()))
                    continue
                cls = did % 23
                frames = [
                    np.round(
                        8000 * np.sin(
                            2 * np.pi
                            * (3 + ((w * (cls + 2) + cls) % 29))
                            * t / 64
                        )
                    )
                    for w in range(16)
                ]
                x = np.concatenate(frames).astype("<i2")
                bio = io.BytesIO()
                with wavmod.open(bio, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(x.tobytes())
                rows.append((did, bio.getvalue()))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return docs.mapInPandas(gen, "media_id long, payload binary")
